"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in tsmp_ray) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``      : flagship pipeline on /root/testdata/sf0.001 — derive
  per-conversation signals from the events-based transcript table, roll up to
  the 1m tier with gap-fill, and return the tier points Dataset.
- ``queries()``    : one callable per implemented operator/pipeline from
  SURVEY.md §2 (+ the training-data ops), each taking ``sf_dir``.
- ``oracle_sql()`` : equivalent DuckDB SQL for the SQL-expressible subset;
  kernels/mining/sketch ops get rows-only checks by design.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from tsmp_ray.pipelines.queries import q_gap_fill_1d

    return q_gap_fill_1d("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from tsmp_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tsmp_ray.pipelines.queries import ORACLES

    return dict(ORACLES)

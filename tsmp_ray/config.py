"""Engine-wide configuration and numeric constants.

Mirrors the reference's global options (``/root/reference/R/zzz.R:1-15``:
``tsmp.exclusion_zone = 1/2``) and eps convention
(``/root/reference/R/misc.R:1102-1107``: ``eps = .Machine$double.eps^0.5``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

#: sqrt of float64 machine epsilon — the reference's ``vars()$eps``
#: (/root/reference/R/misc.R:1103). Used for degenerate-window (flat) detection
#: and exclusion-zone rounding.
EPS: float = float(np.sqrt(np.finfo(np.float64).eps))

#: default trivial-match exclusion-zone fraction for self-joins
#: (/root/reference/R/zzz.R:6, /root/reference/R/stomp.R:56).
DEFAULT_EZ: float = 0.5

#: sentinel for "no neighbor" profile index (reference uses -Inf / NA;
#: we use -1 in int64 columns, documented in SURVEY.md §4.3).
PI_SENTINEL: int = -1

#: kmode constant from the reference (/root/reference/R/misc.R:1104-1106).
KMODE: float = 0.6311142


def session_cpus(floor: int = 2) -> int:
    """Session CPU count for actor-pool ceilings and task fanouts, with a
    ``floor`` so tiny sessions still parallelize; falls back to 8 when Ray
    isn't up (planning outside a session). Pools sized from this must keep
    an autoscaling floor of 1 — a FIXED pool equal to session CPUs
    deadlocks small sessions (CLAUDE.md invariant)."""
    try:
        import ray

        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
    except Exception:  # pragma: no cover — ray import/cluster race
        cpus = 8
    return max(floor, cpus)


def exclusion_zone(window_size: int, ez: float = DEFAULT_EZ) -> int:
    """Trivial-match exclusion radius: ``round(w * ez + eps)``.

    Reference: /root/reference/R/stomp.R:56 (self-join), 0 for AB-joins.
    """
    return int(round(window_size * ez + EPS))


def raise_if_too_short(n: int, w: int, *, ceiling: bool,
                       what: str = "time series") -> None:
    """The reference's too-short guard, single-sourced (the kernels mirror
    their own reference file's convention — two exist):

    - ``ceiling=True``: refuse ``w > ceil(n/2)`` (stomp.R:95-97,
      scrimp.R:95-97, stamp.R:106-108) — but NOT ``w > n``, which those
      kernels report as "longer than series" (pinned message).
    - ``ceiling=False``: refuse ``2*w > n`` outright (mstomp.R:101-103,
      simple.R:116-121, valmod.R:96-98 use plain ``n/2``).
    """
    if ceiling:
        bad = n >= w > (n + 1) // 2
    else:
        bad = 2 * w > n
    if bad:
        raise ValueError(
            f"{what} is too short relative to desired window size")


# Rollup tier definitions: name -> bucket width in microseconds.
TIERS: dict[str, int] = {
    "1m": 60 * 1_000_000,
    "1h": 3600 * 1_000_000,
    "1d": 86400 * 1_000_000,
}

#: the three per-conversation signals derived from a transcript
SIGNALS: tuple[str, ...] = ("ts_delta", "text_len", "tool_call")


@dataclass
class EngineConfig:
    """Top-level knobs for the Ray Data pipelines."""

    window_size: int = 8
    ez: float = DEFAULT_EZ
    # convs with more turns than this get salted into diagonal shards
    salt_turn_threshold: int = 20_000
    # Ray Data stage sizing
    batch_size: int = 64 * 1024
    profile_concurrency: int | None = None  # None = autosize to cluster CPUs
    # rollup
    tiers: tuple[str, ...] = ("1m", "1h", "1d")
    gap_fill: bool = True
    # interpolate across at most this many empty buckets (scale guard)
    gap_fill_max_buckets: int = 60
    # retention: TTL per tier in microseconds (None = keep forever)
    ttl_us: dict = field(default_factory=dict)

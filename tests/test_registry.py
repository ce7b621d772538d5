"""Kernel-registry extension surface."""

import numpy as np
import pytest


def test_register_and_run(ray_session):
    import ray

    from tsmp_ray.functions.registry import (
        get_kernel, kernel_stage, list_kernels, register_kernel,
    )
    from tsmp_ray.sources.transcripts import synthetic_transcripts
    from tsmp_ray.stages.signals import pack_series

    assert {"matrix_profile", "cac", "zscore"} <= set(list_kernels())

    @register_kernel("range_ratio")
    def _rr(series, w: int = 4):
        from tsmp_ray.kernels.movstats import movmax, movmin

        hi, lo = movmax(series, w), movmin(series, w)
        return {"rr": (hi - lo) / (np.abs(hi) + np.abs(lo) + 1e-9)}

    assert get_kernel("range_ratio") is _rr
    with pytest.raises(KeyError):
        get_kernel("nope")

    tbl = synthetic_transcripts(n_convs=3, seed=17, mean_turns=60)
    packed = pack_series(ray.data.from_arrow(tbl))
    out = kernel_stage(packed, "range_ratio", signal="text_len", w=4).to_pandas()
    assert len(out) > 0
    assert out["rr"].between(0, 1).all()
    mp_out = kernel_stage(packed, "matrix_profile", signal="text_len", w=8).to_pandas()
    assert {"conv_id", "idx", "mp", "pi"} <= set(mp_out.columns)

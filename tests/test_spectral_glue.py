"""The spectral-glue Pallas path (models/spectral_glue.py, interpret mode on
CPU) must track the default XLA glue to summation-order ulps: the two paths
run the SAME code, differing only in the mosaic_safe cumsum/einsum
formulations (see tendencies.spectral_linear_tendencies)."""

import dataclasses

import numpy as np

from pyspeedy_tpu.models import model as M
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.testing import make_demo_model
from pyspeedy_tpu.parallel.ensemble import (broadcast_state,
                                            make_run_steps_batched)


def test_pallas_spectral_glue_matches_xla():
    params = dataclasses.replace(T30L8, fft_mode="matmul")
    consts, state, cal = make_demo_model(params)
    b = broadcast_state(state, 2)
    ctx, _ = M.build_step_ctx(cal, 2, 3)

    run_x = make_run_steps_batched(
        dataclasses.replace(consts, pallas_spectral=False), phase=2,
        donate=False)
    run_p = make_run_steps_batched(
        dataclasses.replace(consts, pallas_spectral=True), phase=2,
        donate=False)
    ox = run_x(b, ctx)
    op = run_p(b, ctx)
    for name in ("vor", "div", "t", "ps", "tr"):
        for lev in range(2):
            a = np.asarray(op[name][lev])
            c = np.asarray(ox[name][lev])
            scale = np.abs(c).max() or 1.0
            rel = np.abs(a - c).max() / scale
            assert rel < 1e-11, f"{name}[{lev}]: rel {rel:.3e}"


def test_batched_runner_output_chains_back():
    """A batched run's output must feed back into the SAME executable —
    for physics-on (ephemerals stripped outside jit) and physics-off
    (ephemerals pass through untouched; round-3 review found the final
    vmapped group broadcasting stale copies and breaking the chain)."""
    params = dataclasses.replace(T30L8, fft_mode="matmul")
    base, state, cal = make_demo_model(params)
    for physics_on in (True, False):
        consts = dataclasses.replace(base, physics_on=physics_on)
        run = make_run_steps_batched(consts, phase=2, donate=False)
        b = broadcast_state(state, 2)
        cal2 = dataclasses.replace(cal)
        ctx, cal2 = M.build_step_ctx(cal2, 2, 3)
        out = run(b, ctx)
        ctx2, cal2 = M.build_step_ctx(cal2, 5, 3)
        out2 = run(out, ctx2)  # must not change the jit signature
        assert np.isfinite(np.asarray(out2["t"][0])).all(), physics_on

"""Pallas physics megakernel vs the XLA physics chain (interpret mode on
CPU; the compiled kernel is exercised on TPU by tools/bench_pallas_physics
and the pallas_physics bench path)."""

import numpy as np

import jax

from pyspeedy_tpu.ops import spectral as S
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.physics.driver import (grid_physics, BC_FIELDS,
                                         CACHE_FIELDS)
from pyspeedy_tpu.physics.pallas_physics import grid_physics_pallas
from pyspeedy_tpu.testing import make_demo_model


def _physics_inputs():
    consts, state, _ = make_demo_model(T30L8)
    sp = consts.sp
    ucos, vcos = S.vort2vel_p(sp, state["vor"][0], state["div"][0])
    ug = S.spec2grid_p(sp, ucos, 2)
    vg = S.spec2grid_p(sp, vcos, 2)
    tg = S.spec2grid_p(sp, state["t"][0], 1)
    qg = S.spec2grid_p(sp, state["tr"][0][:, 0], 1)
    phig = S.spec2grid_p(sp, state["phi"], 1)
    pslg = S.spec2grid_p(sp, state["ps"][0], 1)
    bc = tuple(state[n] for n in BC_FIELDS)
    cache = tuple(state[n] for n in CACHE_FIELDS)
    return consts, (ug, vg, tg, qg, phig, pslg, bc, cache,
                    state["air_absortivity_co2"])


def test_pallas_physics_matches_xla():
    consts, args = _physics_inputs()
    for swf in (True, False):
        ref = grid_physics(consts, swf, *args)
        pal = grid_physics_pallas(consts, swf, *args, interpret=True)
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(pal)):
            a = np.asarray(a, dtype=np.float64)
            b = np.asarray(b, dtype=np.float64)
            scale = max(np.abs(a).max(), 1.0)
            assert np.abs(a - b).max() / scale < 1e-13


def test_pallas_physics_tile_invariance():
    """Latitude tiling must not change results (column locality)."""
    consts, args = _physics_inputs()
    a = grid_physics_pallas(consts, True, *args, tile=16, interpret=True)
    b = grid_physics_pallas(consts, True, *args, tile=48, interpret=True)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=0, atol=1e-12)

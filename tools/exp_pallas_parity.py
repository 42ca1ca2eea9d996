"""Isolate which Pallas kernel diverges from its XLA twin on TPU.

Compares, on identical inputs at a small member batch:
  1. grid_physics_pallas vs grid_physics (one call, SW on and off)
  2. grid_dynamics_core via tiled_columnwise vs plain XLA
  3. one full step pallas_physics=True vs False

Usage: python tools/exp_pallas_parity.py [n_members]
"""

import dataclasses
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyspeedy_tpu.models import model as M
from pyspeedy_tpu.models.tendencies import grid_dynamics_core
from pyspeedy_tpu.ops import spectral as S
from pyspeedy_tpu.ops.pallas_tiling import tiled_columnwise
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.physics.driver import (grid_physics, BC_FIELDS,
                                         CACHE_FIELDS)
from pyspeedy_tpu.physics.pallas_physics import grid_physics_pallas
from pyspeedy_tpu.testing import make_demo_model


def report(label, a_tree, b_tree):
    a_l, _ = jax.tree.flatten(a_tree)
    b_l, _ = jax.tree.flatten(b_tree)
    worst = 0.0
    for i, (a, b) in enumerate(zip(a_l, b_l)):
        a, b = np.asarray(a), np.asarray(b)
        if not np.array_equal(a, b):
            scale = np.abs(b).max() or 1.0
            rel = np.abs(a - b).max() / scale
            worst = max(worst, rel)
            print(f"  {label}[{i}]: rel {rel:.3e} "
                  f"({(a != b).mean():.3%} elements)", flush=True)
    if worst == 0.0:
        print(f"  {label}: BITWISE", flush=True)
    return worst


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    params = dataclasses.replace(T30L8, precision="f32", fft_mode="matmul")
    consts, state, cal = make_demo_model(params)
    sp = consts.sp
    geom = consts.geom

    @jax.jit
    def prep(st):
        ucos, vcos = S.vort2vel_p(sp, st["vor"][0], st["div"][0])
        return (S.spec2grid_p(sp, ucos, 2), S.spec2grid_p(sp, vcos, 2),
                S.spec2grid_p(sp, st["t"][0], 1),
                S.spec2grid_p(sp, st["tr"][0][:, 0], 1),
                S.spec2grid_p(sp, st["phi"], 1),
                S.spec2grid_p(sp, st["ps"][0], 1))

    ug, vg, tg, qg, phig, pslg = prep(state)
    bc = tuple(state[n] for n in BC_FIELDS)
    cache = tuple(jnp.asarray(state[n]) for n in CACHE_FIELDS)
    ab = jnp.asarray(state["air_absortivity_co2"])

    B = n_members
    rep = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape)
    ugb, vgb, tgb, qgb, phigb, pslgb = map(rep, (ug, vg, tg, qg, phig, pslg))
    bcb = tuple(map(rep, bc))
    cacheb = tuple(map(rep, cache))

    for sw in (True, False):
        px = jax.jit(jax.vmap(lambda u, v, t, q, p, ps, b, c: grid_physics(
            consts, sw, u, v, t, q, p, ps, b, c, ab),
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0)))
        pp = jax.jit(jax.vmap(lambda u, v, t, q, p, ps, b, c:
                              grid_physics_pallas(
            consts, sw, u, v, t, q, p, ps, b, c, ab),
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0)))
        ox = px(ugb, vgb, tgb, qgb, phigb, pslgb, bcb, cacheb)
        op = pp(ugb, vgb, tgb, qgb, phigb, pslgb, bcb, cacheb)
        jax.block_until_ready((ox, op))
        print(f"grid_physics sw={sw}:", flush=True)
        report("physics", op, ox)

    # --- dynamics core ---
    @jax.jit
    def prep_dyn(st):
        vor, div, t, tr, ps = (st["vor"][1], st["div"][1], st["t"][1],
                               st["tr"][1], st["ps"][1])
        ucos, vcos = S.vort2vel_p(sp, vor, div)
        psdx, psdy = S.gradient_p(sp, ps)
        vorg = S.spec2grid_p(sp, vor, 1)
        divg = S.spec2grid_p(sp, div, 1)
        tgg = S.spec2grid_p(sp, t, 1)
        trg = S.spec2grid_p(sp, tr.reshape((2, -1) + tr.shape[-2:]), 1)
        ugg = S.spec2grid_p(sp, ucos, 1)
        vgg = S.spec2grid_p(sp, vcos, 1)
        pxy = S.spec2grid_p(sp, jnp.stack([psdx, psdy], axis=1), 1)
        return vorg, divg, tgg, trg, ugg, vgg, pxy

    vorg, divg, tgg, trg, ugg, vgg, pxy = prep_dyn(state)
    rcos2d = jnp.broadcast_to(jnp.asarray(sp.cosgr[:, None]), vorg.shape[-2:])
    coriol2d = jnp.broadcast_to(
        jnp.asarray(geom.coriol[:, None], dtype=vorg.dtype), vorg.shape[-2:])
    args = (vorg, divg, tgg, trg, ugg, vgg, pxy, rcos2d, coriol2d)
    argsb = tuple(map(rep, args))

    fx = jax.jit(jax.vmap(lambda *a: grid_dynamics_core(consts, *a)))
    fp = jax.jit(jax.vmap(lambda *a: tiled_columnwise(
        lambda *b: grid_dynamics_core(consts, *b), a, vorg.shape[-2])))
    ox = fx(*argsb)
    op = fp(*argsb)
    jax.block_until_ready((ox, op))
    print("grid_dynamics_core:", flush=True)
    report("dyncore", op, ox)

    # --- one full step ---
    from pyspeedy_tpu.parallel.ensemble import (broadcast_state,
                                                make_run_steps_batched)
    batched = broadcast_state(state, B)
    ctx, _ = M.build_step_ctx(cal, 2, 3)
    ctx1 = jax.tree.map(lambda a: a[:3], ctx)
    run_p = make_run_steps_batched(
        dataclasses.replace(consts, pallas_physics=True), phase=2,
        donate=False)
    run_x = make_run_steps_batched(
        dataclasses.replace(consts, pallas_physics=False), phase=2,
        donate=False)
    op = run_p(batched, ctx1)
    ox = run_x(batched, ctx1)
    jax.block_until_ready((op, ox))
    print("full 3-step:", flush=True)
    for name in ("vor", "div", "t", "ps", "tr", "precnv", "shf"):
        report(name, op[name], ox[name])


if __name__ == "__main__":
    main()

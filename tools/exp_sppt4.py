"""Second SPPT bisect: is the remaining overhead the Pallas kernel's extra
pattern operand, or the carried AR(1) state fields?

Variants (16-member batched, phase=2, one process):
  det       : sppt_on=False
  full      : production (pattern applied INSIDE the megakernel)
  outapp    : generation real, application OUTSIDE the kernel as a bf16
              multiply (keeps bf16 GEMM operands, drops the kernel operand)
  deadcarry : generation stubbed, application skipped — pure cost of the
              sppt state fields riding the carry

Usage: python tools/exp_sppt4.py [n_members]
"""

import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyspeedy_tpu.models import model as M
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.physics import sppt as sppt_mod
from pyspeedy_tpu.physics import pallas_physics as PP
from pyspeedy_tpu.testing import make_demo_model
from pyspeedy_tpu.parallel.ensemble import (broadcast_state,
                                            make_run_steps_batched)

REAL_GPP = PP.grid_physics_pallas
REAL_GEN_N = sppt_mod.gen_sppt_n


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(params, n_members, n_windows=6, days_per_window=4):
    M._CONSTS_CACHE.clear()
    consts, state, cal = make_demo_model(params)
    bstate = broadcast_state(state, n_members)
    run = make_run_steps_batched(consts, donate=False, phase=2)
    n_day = params.nsteps
    ctx, cal = M.build_step_ctx(cal, 2, n_day)
    out = run(bstate, ctx)
    jax.block_until_ready(out)
    rates = []
    stepno = 2 + n_day
    for w in range(n_windows):
        t0 = time.perf_counter()
        for d in range(days_per_window):
            ctx, cal = M.build_step_ctx(cal, stepno, n_day)
            out = run(out, ctx)
            stepno += n_day
        jax.block_until_ready(out)
        rates.append(n_members * days_per_window * n_day
                     / (time.perf_counter() - t0))
    return statistics.median(rates)


def gpp_outapp(consts, sw_flag, *args, sppt_pattern=None, **kw):
    ut, vt, tt, qt, diag, cache = REAL_GPP(consts, sw_flag, *args,
                                           sppt_pattern=None, **kw)
    if sppt_pattern is not None:
        f = (1.0 + sppt_pattern).astype(ut.dtype)
        ut, vt, tt, qt = f * ut, f * vt, f * tt, f * qt
    return ut, vt, tt, qt, diag, cache


def gpp_noapp(consts, sw_flag, *args, sppt_pattern=None, **kw):
    return REAL_GPP(consts, sw_flag, *args, sppt_pattern=None, **kw)


def stub_gen_n(consts, state, n, stepno=0):
    p = consts.params
    pats = jnp.zeros((n, p.kx, p.il, p.ix), dtype=p.dtype)
    state = dict(state)
    state["sppt_first"] = jnp.array(False)
    return pats, state


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    base = dataclasses.replace(T30L8, precision="f32", fft_mode="matmul")
    sppt = dataclasses.replace(base, sppt_on=True)
    res = {}

    res["det"] = measure(base, n_members)
    log(f"det       {res['det']:.0f} msps")

    res["full"] = measure(sppt, n_members)
    log(f"full      {res['full']:.0f} msps "
        f"({100*(res['det']/res['full']-1):+.1f}%)")

    PP.grid_physics_pallas = gpp_outapp
    try:
        res["outapp"] = measure(dataclasses.replace(sppt, nsteps=36),
                                n_members)
        log(f"outapp    {res['outapp']:.0f} msps "
            f"({100*(res['det']/res['outapp']-1):+.1f}%)")
    finally:
        PP.grid_physics_pallas = REAL_GPP

    PP.grid_physics_pallas = gpp_noapp
    sppt_mod.gen_sppt_n = stub_gen_n
    try:
        res["deadcarry"] = measure(dataclasses.replace(sppt, nsteps=36),
                                   n_members)
        log(f"deadcarry {res['deadcarry']:.0f} msps "
            f"({100*(res['det']/res['deadcarry']-1):+.1f}%)")
    finally:
        PP.grid_physics_pallas = REAL_GPP
        sppt_mod.gen_sppt_n = REAL_GEN_N

    # det re-measure to bound drift
    res["det2"] = measure(base, n_members)
    log(f"det2      {res['det2']:.0f} msps")
    print(json.dumps(res))


if __name__ == "__main__":
    main()

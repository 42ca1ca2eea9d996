"""Bisect the production SPPT overhead: which piece costs 0.29 ms/step?

Variants (16-member batched, phase=2):
  det        : sppt_on=False baseline
  full       : production SPPT
  nogen      : pattern generation stubbed to zeros (application kept)
  noapply    : generation kept, pattern ignored by grid_physics (via a
               monkeypatched driver multiply)
  nocarry    : generation stubbed AND sppt state fields dropped from the
               carry (isolates the carry-field cost)

Usage: python tools/exp_sppt3.py [n_members]
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
from pyspeedy_tpu.testing import make_demo_model
from pyspeedy_tpu.parallel.ensemble import (broadcast_state,
                                            make_run_steps_batched)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(params, n_members, n_windows=6, days_per_window=4):
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


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    base = dataclasses.replace(T30L8, precision="f32", fft_mode="matmul")
    sppt = dataclasses.replace(base, sppt_on=True)
    results = {}

    results["det"] = measure(base, n_members)
    log(f"det    {results['det']:.0f} msps")

    results["full"] = measure(sppt, n_members)
    log(f"full   {results['full']:.0f} msps "
        f"({100*(results['det']/results['full']-1):.1f}% overhead)")

    # nogen: generation stubbed to zeros (same shapes, no RNG/transform)
    real_gen_n = sppt_mod.gen_sppt_n

    def stub_gen_n(consts, state, n, stepno=0):
        p = consts.params
        pats = jnp.zeros((n, p.kx, p.il, p.ix), dtype=p.dtype)
        state = dict(state)
        state["sppt_first"] = jnp.array(False)
        return pats, state

    sppt_mod.gen_sppt_n = stub_gen_n
    try:
        # fresh jit caches: new consts identity via replace
        sppt2 = dataclasses.replace(sppt, nsteps=36)
        M._CONSTS_CACHE.clear()
        results["nogen"] = measure(sppt2, n_members)
        log(f"nogen  {results['nogen']:.0f} msps "
            f"({100*(results['det']/results['nogen']-1):.1f}% overhead)")
    finally:
        sppt_mod.gen_sppt_n = real_gen_n
        M._CONSTS_CACHE.clear()

    print(json.dumps(results))


if __name__ == "__main__":
    main()

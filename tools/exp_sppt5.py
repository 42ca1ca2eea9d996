"""Third SPPT bisect: presence-vs-update cost of the carried AR(1) state.

Variants (16-member batched, phase=2, one process):
  det       : sppt_on=False
  full      : production SPPT
  carrypass : gen stubbed to zeros, STATE UNTOUCHED — spec+key ride the
              carry unchanged (tests whether mere presence costs)
  nokey     : real gen, but noise keyed from a CONSTANT key (sppt_key
              removed from the state entirely) — isolates the typed-key
              carry from the spec carry
  nospec    : real RNG + transform + application, but the spec carry is
              NOT updated (reads it, never writes) — isolates the update

Usage: python tools/exp_sppt5.py [n_members]
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

REAL_GEN_N = sppt_mod.gen_sppt_n


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(params, n_members, drop_key=False, n_windows=6,
            days_per_window=4):
    M._CONSTS_CACHE.clear()
    consts, state, cal = make_demo_model(params)
    if drop_key:
        state = {k: v for k, v in state.items() if k != "sppt_key"}
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


def gen_carrypass(consts, state, n, stepno):
    p = consts.params
    return jnp.zeros((n, p.kx, p.il, p.ix), dtype=p.dtype), state


def gen_nokey(consts, state, n, stepno):
    state = dict(state)
    state["sppt_key"] = jax.random.key(7)
    pats, state = REAL_GEN_N(consts, state, n, stepno)
    del state["sppt_key"]
    return pats, state


def gen_nospec(consts, state, n, stepno):
    pats, st2 = REAL_GEN_N(consts, state, n, stepno)
    return pats, state  # drop the spec update


VARIANTS = {"carrypass": (gen_carrypass, {}),
            "nokey": (gen_nokey, {"drop_key": True}),
            "nospec": (gen_nospec, {})}


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    wanted = sys.argv[2].split(",") if len(sys.argv) > 2 else \
        ["det", "full", "carrypass", "nokey", "nospec"]
    base = dataclasses.replace(T30L8, precision="f32", fft_mode="matmul")
    sppt = dataclasses.replace(base, sppt_on=True)
    res = {}

    if "det" in wanted:
        res["det"] = measure(base, n_members)
        log(f"det       {res['det']:.0f} msps")
    det = res.get("det")
    if "full" in wanted:
        res["full"] = measure(sppt, n_members)
        log(f"full      {res['full']:.0f} msps"
            + (f" ({100*(det/res['full']-1):+.1f}%)" if det else ""))

    for name in wanted:
        if name not in VARIANTS:
            continue
        fn, kw = VARIANTS[name]
        sppt_mod.gen_sppt_n = fn
        try:
            res[name] = measure(dataclasses.replace(sppt, nsteps=36),
                                n_members, **kw)
            log(f"{name:9s} {res[name]:.0f} msps"
                + (f" ({100*(det/res[name]-1):+.1f}%)" if det else ""))
        except Exception as e:  # noqa: BLE001
            log(f"{name} failed: {str(e)[:300]}")
        finally:
            sppt_mod.gen_sppt_n = REAL_GEN_N

    print(json.dumps(res))


if __name__ == "__main__":
    main()

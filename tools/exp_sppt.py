"""Round-5 experiment: where does the SPPT ensemble overhead go?

BENCH_r04 measured a 43% throughput hit for 16-member SPPT vs deterministic
(11.8k vs 16.9k msps) where the added work — one (kx,mx,nx) inverse
transform + two clipped-normal draws + 4 multiply-adds per member-step
(physics/sppt.py) — should cost ~10% on a step with ~20 transform stacks.

Usage: python tools/exp_sppt.py [n_members] [mode]
  mode = time (default): wall-time det vs sppt, several windows
         trace: profile the SPPT run and attribute device time to source
"""

import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyspeedy_tpu.models import model as M
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.testing import make_demo_model
from pyspeedy_tpu.parallel.ensemble import (broadcast_state,
                                            make_run_steps_batched)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build(params, n_members):
    consts, state, cal = M.build_consts_cached(params)[0], None, None
    consts, state, cal = (consts, *make_demo_model(params)[1:])
    bstate = broadcast_state(state, n_members)
    run = make_run_steps_batched(consts, donate=False, phase=2)
    return consts, bstate, cal, run


def timed_windows(run, bstate, cal, n_members, n_day, n_windows=6,
                  days_per_window=4):
    ctx, cal = M.build_step_ctx(cal, 2, n_day)
    out = run(bstate, ctx)
    jax.block_until_ready(out)  # compile + warm
    rates = []
    stepno = 2 + n_day
    for w in range(n_windows):
        t0 = time.perf_counter()
        for d in range(days_per_window):
            ctx, cal = M.build_step_ctx(cal, stepno, n_day)
            out = run(out, ctx)
            stepno += n_day
        jax.block_until_ready(out)
        wall = time.perf_counter() - t0
        rates.append(n_members * days_per_window * n_day / wall)
    return rates, out, ctx


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    mode = sys.argv[2] if len(sys.argv) > 2 else "time"
    backend = jax.default_backend()
    precision = "f64" if backend == "cpu" else "f32"
    base = dataclasses.replace(T30L8, precision=precision, fft_mode="matmul")

    n_day = base.nsteps
    results = {}
    for name, params in (("det", base),
                         ("sppt", dataclasses.replace(base, sppt_on=True))):
        consts, bstate, cal, run = build(params, n_members)
        if mode == "trace" and name == "det":
            continue
        rates, out, ctx = timed_windows(run, bstate, cal, n_members, n_day)
        med = statistics.median(rates)
        results[name] = med
        log(f"{name}: windows {[round(r) for r in rates]} -> median "
            f"{med:.0f} msps ({n_members/med*1e3:.3f} ms/step)")
        if mode == "trace" and name == "sppt":
            hlo_path = f"/tmp/sppt_hlo_{n_members}.txt"
            txt = run.lower(out, ctx).compile().as_text()
            with open(hlo_path, "w") as f:
                f.write(txt)
            trace_dir = f"/tmp/sppt_trace_{n_members}"
            jax.profiler.start_trace(trace_dir)
            out = run(out, ctx)
            jax.block_until_ready(out)
            jax.profiler.stop_trace()
            log(f"trace: {trace_dir}  hlo: {hlo_path}")
            from attribute_trace import hlo_source_map, resolve_source
            from collections import defaultdict
            from pyspeedy_tpu.utils.xplane import device_op_totals
            srcmap, opnds = hlo_source_map(hlo_path)
            totals = device_op_totals(trace_dir)
            by_src = defaultdict(float)
            unattr = 0.0
            for opname, secs in totals.items():
                head = opname.lstrip("%").split(" ", 1)[0]
                src = resolve_source(head, srcmap, opnds)
                if src is None:
                    unattr += secs
                    continue
                by_src[src] += secs
            total = sum(totals.values()) or 1.0
            for src, secs in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
                log(f"{src:44s} {secs:8.3f} {100*secs/total:6.2f}%")
            log(f"{'(unattributed)':44s} {unattr:8.3f} "
                f"{100*unattr/total:6.2f}%")

    if "det" in results and "sppt" in results:
        ov = 100.0 * (results["det"] / results["sppt"] - 1)
        print(json.dumps({"members": n_members, "det_msps": results["det"],
                          "sppt_msps": results["sppt"],
                          "overhead_pct": round(ov, 1)}))


if __name__ == "__main__":
    main()

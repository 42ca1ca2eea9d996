"""Experiment: lax.scan unroll on the SINGLE-member runner.

At batch=1 the T30 step's ops are tiny, so per-iteration scan overhead is a
bigger wall-clock fraction than on the batched path. Measures unroll in
{1, 2, 4} with bench.py's single-member protocol (30-day windows, one
dispatch per window, median of 5).
"""

import dataclasses
import os
import statistics
import sys
import time

import jax

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspeedy_tpu.models import model as M  # noqa: E402
from pyspeedy_tpu.params import T30L8  # noqa: E402
from pyspeedy_tpu.testing import make_demo_model  # noqa: E402


def measure(params, consts, unroll, n_windows=5, days_per_window=30):
    _, state, cal = make_demo_model(params)
    run = M.make_run_steps(consts, phase=2, unroll=unroll)
    n_win = days_per_window * params.nsteps
    ctx, cal = M.build_step_ctx(cal, 2, n_win)
    t0 = time.perf_counter()
    state = run(state, ctx)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0

    rates = []
    stepno = 2 + n_win
    for _ in range(n_windows):
        ctx, cal = M.build_step_ctx(cal, stepno, n_win)
        t0 = time.perf_counter()
        state = run(state, ctx)
        jax.block_until_ready(state)
        stepno += n_win
        rates.append(n_win / (time.perf_counter() - t0))
    sypd = statistics.median(rates) / params.nsteps / 365.0 * 86400.0
    return sypd, rates, compile_s


def main():
    backend = jax.default_backend()
    precision = "f64" if backend == "cpu" else "f32"
    params = dataclasses.replace(T30L8, precision=precision,
                                 fft_mode="matmul")
    consts, _ = M.build_consts_cached(params)
    print(f"backend={backend} precision={precision}", flush=True)
    for unroll in (1, 2, 4):
        sypd, rates, compile_s = measure(params, consts, unroll)
        print(f"unroll={unroll}: {sypd:8.0f} SYPD  "
              f"windows(steps/s)={[round(r) for r in rates]} "
              f"(first-call {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()

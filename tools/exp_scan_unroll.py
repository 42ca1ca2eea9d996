"""Experiment: lax.scan unroll factor on the batched ensemble runner.

Round-3's trace attribution showed 24.8% of in-flight device time as scan
while-loop self-time; unrolling the scan body (a 3-step SW-aligned triple)
amortizes per-iteration loop overhead and lets XLA fuse across triple
boundaries. This sweep measures unroll in {1, 2, 4} at 256 members
(chunks of 128) and 64 members on the live backend.

Usage: python tools/exp_scan_unroll.py [n_members ...]
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
from pyspeedy_tpu.parallel.ensemble import (broadcast_state,  # noqa: E402
                                            make_run_steps_batched,
                                            pick_member_chunk)
from pyspeedy_tpu.testing import make_demo_model  # noqa: E402


def measure(params, consts, n_members, unroll, n_repeats=3,
            days_per_repeat=2):
    _, state1, cal = make_demo_model(params)
    chunk = pick_member_chunk(n_members, params)
    chunks = [broadcast_state(state1, chunk)
              for _ in range(n_members // chunk)]
    run = make_run_steps_batched(consts, phase=2, unroll=unroll)

    n_win = days_per_repeat * params.nsteps
    stepno = 2

    def one_window(chunks, stepno, cal):
        ctx, cal = M.build_step_ctx(cal, stepno, n_win)
        return [run(b, ctx) for b in chunks], stepno + n_win, cal

    t0 = time.perf_counter()
    chunks, stepno, cal = one_window(chunks, stepno, cal)
    jax.block_until_ready(chunks)
    compile_s = time.perf_counter() - t0
    for _ in range(2):  # warm-up windows (bench.py convention)
        chunks, stepno, cal = one_window(chunks, stepno, cal)
        jax.block_until_ready(chunks)

    rates = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        chunks, stepno, cal = one_window(chunks, stepno, cal)
        jax.block_until_ready(chunks)
        rates.append(n_members * n_win / (time.perf_counter() - t0))
    return statistics.median(rates), rates, compile_s


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [256, 64]
    backend = jax.default_backend()
    precision = "f64" if backend == "cpu" else "f32"
    params = dataclasses.replace(T30L8, precision=precision,
                                 fft_mode="matmul")
    consts, _ = M.build_consts_cached(params)
    print(f"backend={backend} precision={precision}", flush=True)
    for n_members in sizes:
        for unroll in (1, 2, 4):
            msps, rates, compile_s = measure(params, consts, n_members,
                                             unroll)
            print(f"members={n_members:4d} unroll={unroll}: "
                  f"{msps:8.0f} msps  windows={[round(r) for r in rates]} "
                  f"(first-call {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()

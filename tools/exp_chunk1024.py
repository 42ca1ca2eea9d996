"""Experiment: does member-chunking recover the 256-member throughput at
1024 members? Times one simulated day at 1024 members as (a) one 1024-wide
scan and (b) four sequential 256-wide scans of the same executable.

Usage: python tools/exp_chunk1024.py [total] [chunk] [days]
"""

import dataclasses
import json
import os
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
from pyspeedy_tpu.testing import make_demo_model
from pyspeedy_tpu.parallel.ensemble import (broadcast_state,
                                            make_run_steps_batched)


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    days = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    precision = "f64" if jax.default_backend() == "cpu" else "f32"
    params = dataclasses.replace(T30L8, precision=precision,
                                 fft_mode="matmul")
    consts, state, cal = make_demo_model(params)
    n_day = params.nsteps
    results = {}

    for label, width in (("wide", total), ("chunked", chunk)):
        n_chunks = total // width
        run = make_run_steps_batched(consts, phase=2, donate=False)
        states = [broadcast_state(state, width) for _ in range(n_chunks)]
        cal2 = dataclasses.replace(cal)
        ctx, cal2 = M.build_step_ctx(cal2, 2, n_day)
        states = [run(s, ctx) for s in states]
        jax.block_until_ready(states)
        t0 = time.time()
        stepno = 2 + n_day
        for d in range(days):
            ctx, cal2 = M.build_step_ctx(cal2, stepno, n_day)
            states = [run(s, ctx) for s in states]
            stepno += n_day
        jax.block_until_ready(states)
        wall = time.time() - t0
        msps = total * days * n_day / wall
        results[label] = msps
        print(f"{label} ({n_chunks}x{width}): {msps:.0f} member-steps/s",
              flush=True)
        del states

    print(json.dumps({"total": total, "chunk": chunk, **results}))


if __name__ == "__main__":
    main()

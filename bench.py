"""Benchmark harness: T30L8 throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The headline metric is single-member SYPD (simulated years per wall-clock
day) for the full-physics T30L8 model. The reference publishes no benchmark
numbers and no Fortran toolchain is available in this image to measure it, so
vs_baseline is reported against a documented 100-SYPD single-core estimate
for SPEEDY-class Fortran models at T30 (see BASELINE.md).

Ensemble throughput (member-steps/s at batch 64) is printed as a diagnostic
line to stderr.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

import jax

# Persistent compilation cache: axon/TPU compiles are slow; reruns hit disk.
os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_SYPD_ESTIMATE = 100.0  # SPEEDY single-core SYPD anchor (BASELINE.md)


def _sypd(n_steps, wall_s, nsteps_per_day=36):
    sim_years = n_steps / nsteps_per_day / 365.0
    return sim_years * 86400.0 / wall_s


def main():
    from pyspeedy_tpu.models import model as M
    from pyspeedy_tpu.params import T30L8
    from pyspeedy_tpu.testing import make_demo_model

    backend = jax.default_backend()
    precision = "f64" if backend == "cpu" else "f32"
    params = dataclasses.replace(T30L8, precision=precision,
                                 fft_mode="matmul")

    print(f"bench: backend={backend} precision={precision}", file=sys.stderr)

    consts, state, cal = make_demo_model(params)
    run = M.make_run_steps(consts, phase=2)  # chunks start at step 2 (+36*d)

    # Warm-up / compile with a 1-day scan, then time multi-day runs.
    n_day = params.nsteps
    ctx, cal = M.build_step_ctx(cal, 2, n_day)
    state = run(state, ctx)
    jax.block_until_ready(state)

    n_bench_days = 20
    step0 = 2 + n_day
    t0 = time.perf_counter()
    for d in range(n_bench_days):
        ctx, cal = M.build_step_ctx(cal, step0 + d * n_day, n_day)
        state = run(state, ctx)
    jax.block_until_ready(state)
    wall = time.perf_counter() - t0
    n_steps = n_bench_days * n_day
    sypd = _sypd(n_steps, wall)

    assert not bool(state["error_flag"]), "model blew up during bench"
    print(f"bench: {n_steps} steps in {wall:.3f}s -> "
          f"{n_steps / wall:.1f} steps/s, {sypd:.1f} SYPD", file=sys.stderr)

    # Roofline accounting (XLA cost analysis of the day-scan executable):
    # achieved FLOP/s and HBM GB/s so optimization tracks a ceiling, not a
    # trend line. Measured device peaks on this chip (tools/ notes):
    # ~94 TFLOP/s bf16 matmul, ~328 GB/s sustained HBM.
    gflops_s = hbm_gbs = None
    try:
        ca = run.lower(state, ctx).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        day_s = wall / n_bench_days
        if ca and ca.get("flops"):
            gflops_s = float(ca["flops"]) / day_s / 1e9
        if ca and ca.get("bytes accessed"):
            hbm_gbs = float(ca["bytes accessed"]) / day_s / 1e9
        print(f"bench: roofline {gflops_s and round(gflops_s, 1)} GFLOP/s, "
              f"{hbm_gbs and round(hbm_gbs, 1)} GB/s accessed",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - accounting is best-effort
        print(f"bench: cost analysis unavailable: {e}", file=sys.stderr)

    # Ensemble throughput (diagnostic): 64 members, 5 days
    try:
        from pyspeedy_tpu.parallel.ensemble import (broadcast_state,
                                                    make_run_steps_batched)
        n_members = 64
        _, state1, cal2 = make_demo_model(params)
        batched = broadcast_state(state1, n_members)
        runb = make_run_steps_batched(consts, phase=2)
        ctx, cal2 = M.build_step_ctx(cal2, 2, n_day)
        batched = runb(batched, ctx)
        jax.block_until_ready(batched)
        t0 = time.perf_counter()
        days = 5
        for d in range(days):
            ctx, cal2 = M.build_step_ctx(cal2, 2 + (d + 1) * n_day, n_day)
            batched = runb(batched, ctx)
        jax.block_until_ready(batched)
        wall_e = time.perf_counter() - t0
        msps = n_members * days * n_day / wall_e
        print(f"bench: ensemble {n_members} members x {days} days: "
              f"{msps:.0f} member-steps/s "
              f"({_sypd(days * n_day, wall_e) * n_members:.0f} "
              f"aggregate SYPD)", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - diagnostic only
        print(f"bench: ensemble bench failed: {e}", file=sys.stderr)

    out = {
        "metric": "SYPD_T30L8_full_physics_1member",
        "value": round(sypd, 2),
        "unit": "simulated_years_per_wallclock_day",
        "vs_baseline": round(sypd / REFERENCE_SYPD_ESTIMATE, 2),
    }
    if gflops_s is not None:
        out["achieved_gflops_per_s"] = round(gflops_s, 1)
    if hbm_gbs is not None:
        out["achieved_hbm_gb_per_s"] = round(hbm_gbs, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

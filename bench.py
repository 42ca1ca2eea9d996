"""Benchmark harness: T30L8 throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

The headline metric is single-member SYPD (simulated years per wall-clock
day) for the full-physics T30L8 model, measured as the MEDIAN of several
independent timing windows: on the tunneled TPU backend a single window is
dominated by launch-latency variance (round-2 measurements of identical code
varied 3.6k-37.9k SYPD), so only a median over windows is comparable across
rounds. The JSON also carries the stable ensemble throughput numbers
(member-steps/s at 64/256/1024 members — the TPU-native replacement for the
reference's OpenMP parallel_step) and the achieved HBM bandwidth fraction.

The reference publishes no benchmark numbers and no Fortran toolchain is
available in this image to measure it, so vs_baseline is reported against a
documented 100-SYPD single-core estimate for SPEEDY-class Fortran models at
T30 (see BASELINE.md).
"""

import dataclasses
import json
import os
import statistics
import sys
import time

import jax

# Persistent compilation cache: axon/TPU compiles are slow; reruns hit disk.
os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_SYPD_ESTIMATE = 100.0  # SPEEDY single-core SYPD anchor (BASELINE.md)
# Measured sustained HBM bandwidth on this chip (BENCH_NOTES.md round 2):
# elementwise read+write saturates ~328 GB/s (NOT the v5e datasheet number).
MEASURED_HBM_GBS = 328.0
# Measured bf16 matmul peak on this chip (BENCH_NOTES.md round 2): ~94
# TFLOP/s — the MFU denominator (NOT the v5e datasheet number).
MEASURED_PEAK_GFLOPS = 94000.0


def _sypd(n_steps, wall_s, nsteps_per_day=36):
    sim_years = n_steps / nsteps_per_day / 365.0
    return sim_years * 86400.0 / wall_s


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_single(params, consts, M, make_demo_model, n_windows=5,
                 days_per_window=30):
    """Median-of-windows single-member SYPD. Each window is ONE dispatched
    scan of days_per_window simulated days: at T30 the step is launch-bound
    and per-day dispatches through the tunnel cost ~20% (measured round 3);
    the public run() likewise scans whole callback intervals per dispatch."""
    _, state, cal = make_demo_model(params)
    run = M.make_run_steps(consts, phase=2)  # chunks start at step 2 (+36d)

    n_day = params.nsteps
    n_win = days_per_window * n_day
    ctx, cal = M.build_step_ctx(cal, 2, n_win)
    state = run(state, ctx)
    jax.block_until_ready(state)  # compile + warm-up

    rates = []
    stepno = 2 + n_win
    for w in range(n_windows):
        ctx, cal = M.build_step_ctx(cal, stepno, n_win)
        t0 = time.perf_counter()
        state = run(state, ctx)
        jax.block_until_ready(state)
        wall = time.perf_counter() - t0
        stepno += n_win
        rates.append(n_win / wall)
    assert not bool(state["error_flag"]), "model blew up during bench"

    med = statistics.median(rates)
    sypd = _sypd(med, 1.0, nsteps_per_day=params.nsteps)
    _log(f"bench: single-member {days_per_window}-day windows "
         f"{[round(r, 1) for r in rates]} "
         f"steps/s -> median {med:.1f} steps/s, {sypd:.1f} SYPD")

    # Roofline accounting. XLA's cost_analysis counts a while/scan BODY once
    # (verified: identical flops for 36- vs 72-step scans), and this
    # executable's body is one 3-step phase triple, so per-step cost =
    # analysis / 3. "bytes accessed" is LOGICAL operand traffic (>= physical
    # HBM; fusions re-read from VMEM). Measured device peaks: ~94 TFLOP/s
    # bf16 matmul, ~328 GB/s sustained HBM.
    gflops_s = logical_gbs = None
    try:
        ca = run.lower(state, ctx).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        body_steps = 3
        if ca and ca.get("flops"):
            gflops_s = float(ca["flops"]) / body_steps * med / 1e9
        if ca and ca.get("bytes accessed"):
            logical_gbs = (float(ca["bytes accessed"]) / body_steps
                           * med / 1e9)
        _log(f"bench: roofline {gflops_s and round(gflops_s, 1)} GFLOP/s, "
             f"{logical_gbs and round(logical_gbs, 1)} GB/s logical operand "
             "traffic")
    except Exception as e:  # noqa: BLE001 - accounting is best-effort
        _log(f"bench: cost analysis unavailable: {e}")
    return sypd, rates, gflops_s, logical_gbs


def bench_ensemble(params, consts, M, make_demo_model, n_members,
                   n_repeats=3, days_per_repeat=2):
    """Median member-steps/s for an n_members batched ensemble (chunked
    along the member axis past the measured knee, like SpeedyEns), plus the
    achieved HBM GB/s from XLA cost analysis of the batched executable.

    Each timing window is ONE dispatched scan of days_per_repeat days per
    chunk (per-day dispatches through the tunnel cost ~20% at small batches
    — the single-member finding, applied here in round 5), and one
    post-compile window is discarded: the first execution of a fresh
    executable is consistently cold through the tunnel (BENCH_r04's 16-member
    windows spanned 20% because it was counted)."""
    from pyspeedy_tpu.parallel.ensemble import (broadcast_state,
                                                make_run_steps_batched,
                                                pick_member_chunk,
                                                pick_scan_unroll)
    n_day = params.nsteps
    _, state1, cal = make_demo_model(params)
    chunk = pick_member_chunk(n_members, params)
    chunks = [broadcast_state(state1, chunk)
              for _ in range(n_members // chunk)]
    run = make_run_steps_batched(consts, phase=2, donate=False,
                                 unroll=pick_scan_unroll(chunk, params))

    n_win = days_per_repeat * n_day
    stepno = 2

    def one_window(chunks, stepno, cal):
        ctx, cal = M.build_step_ctx(cal, stepno, n_win)
        return [run(b, ctx) for b in chunks], stepno + n_win, cal, ctx

    chunks, stepno, cal, ctx = one_window(chunks, stepno, cal)  # compile
    jax.block_until_ready(chunks)
    # TWO discarded warm-up windows: with one, the first TIMED window still
    # ran ~5% cold at 16 members (r5 run: [16043, 17126, ...]).
    for _ in range(2):
        chunks, stepno, cal, ctx = one_window(chunks, stepno, cal)
        jax.block_until_ready(chunks)

    rates = []
    for r in range(n_repeats):
        t0 = time.perf_counter()
        chunks, stepno, cal, ctx = one_window(chunks, stepno, cal)
        jax.block_until_ready(chunks)
        wall = time.perf_counter() - t0
        rates.append(n_members * n_win / wall)

    msps = statistics.median(rates)
    hbm_gbs = gflops_s = dev_s_per_mstep = None
    try:
        # Post-hoc lower+compile hits the persistent compilation cache.
        # cost_analysis counts the scan body once; the aligned executable is
        # q prefix steps + scan(triples, body=3 steps counted once) +
        # tail_n steps outside the scan. bytes are LOGICAL operand traffic.
        ca = run.lower(chunks[0], ctx).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        q = min((3 - 2) % 3, n_win)
        m = n_win - q
        n_triples = m // 3
        tail_n = m - 3 * max(n_triples - 1, 0)
        counted = (q + (3 if n_triples > 1 else 0) + tail_n) * chunk
        if ca and ca.get("bytes accessed"):
            hbm_gbs = (float(ca["bytes accessed"]) / counted * msps / 1e9)
        if ca and ca.get("flops"):
            # Real model FLOPs executed at the measured rate (the flop count
            # is the work, not an operand-traffic proxy).
            gflops_s = float(ca["flops"]) / counted * msps / 1e9
    except Exception:
        pass

    # Hardware-counter honesty (round 5): measured DEVICE op time per
    # member-step from a jax.profiler trace of one window (in-flight op
    # durations overlap, so this bounds — not equals — wall time; the wall
    # msps above is the throughput truth).
    try:
        import tempfile

        from pyspeedy_tpu.utils.xplane import device_op_totals
        with tempfile.TemporaryDirectory() as td:
            jax.profiler.start_trace(td)
            chunks, stepno, cal, _ = one_window(chunks, stepno, cal)
            jax.block_until_ready(chunks)
            jax.profiler.stop_trace()
            dev_total = sum(device_op_totals(td).values())
        dev_s_per_mstep = dev_total / (n_members * n_win)
    except Exception as e:  # noqa: BLE001 - accounting is best-effort
        _log(f"bench: ensemble trace unavailable: {e}")

    _log(f"bench: ensemble {n_members} (chunks of {chunk}): "
         f"{[round(r) for r in rates]} member-steps/s -> median {msps:.0f}"
         + (f", {hbm_gbs:.0f} GB/s logical" if hbm_gbs else "")
         + (f", {gflops_s:.0f} GFLOP/s achieved" if gflops_s else "")
         + (f", {dev_s_per_mstep*1e6:.0f} us device/member-step"
            if dev_s_per_mstep else ""))
    return msps, hbm_gbs, gflops_s, dev_s_per_mstep


def main():
    from pyspeedy_tpu.models import model as M
    from pyspeedy_tpu.params import T30L8
    from pyspeedy_tpu.testing import make_demo_model

    backend = jax.default_backend()
    precision = "f64" if backend == "cpu" else "f32"
    params = dataclasses.replace(T30L8, precision=precision,
                                 fft_mode="matmul")
    _log(f"bench: backend={backend} precision={precision}")

    consts, _ = M.build_consts_cached(params)

    sypd, windows, gflops_s, hbm_gbs = bench_single(
        params, consts, M, make_demo_model)

    out = {
        "metric": "SYPD_T30L8_full_physics_1member_median5",
        "value": round(sypd, 2),
        "unit": "simulated_years_per_wallclock_day",
        "vs_baseline": round(sypd / REFERENCE_SYPD_ESTIMATE, 2),
        # The reference publishes no numbers and no Fortran toolchain exists
        # here: vs_baseline divides by a DOCUMENTED ESTIMATE (BASELINE.md),
        # not a measurement. SYPD / member-steps/s are the honest series.
        "baseline_is_estimate": True,
        "window_sypd_min": round(_sypd(min(windows), 1.0), 1),
        "window_sypd_max": round(_sypd(max(windows), 1.0), 1),
    }
    if gflops_s is not None:
        out["achieved_gflops_per_s"] = round(gflops_s, 1)
    if hbm_gbs is not None:
        # LOGICAL operand traffic per unit time (>= physical HBM; see
        # bench_single) — the fraction below is an upper bound on HBM use.
        out["logical_gb_per_s"] = round(hbm_gbs, 1)

    # Ensemble throughput at the three reference batch sizes. 1024 members on
    # CPU would thrash host memory; sizes shrink off-TPU.
    sizes = (64, 256, 1024) if backend == "tpu" else (8,)
    for n_members in sizes:
        try:
            msps, e_hbm, e_gfl, e_dev = bench_ensemble(
                params, consts, M, make_demo_model, n_members)
            out[f"ensemble_msps_{n_members}"] = round(msps)
            if e_hbm is not None:
                out[f"ensemble_logical_gbs_{n_members}"] = round(e_hbm, 1)
                out[f"ensemble_hbm_frac_upper_{n_members}"] = round(
                    e_hbm / MEASURED_HBM_GBS, 3)
            if e_gfl is not None:
                out[f"ensemble_achieved_gflops_{n_members}"] = round(e_gfl, 1)
                # MFU vs the MEASURED 94 TFLOP/s bf16 matmul peak of this
                # chip (BENCH_NOTES round 2) — small at T30 by design: the
                # model is tiny and memory/launch-bound, not MXU-bound.
                out[f"ensemble_mfu_{n_members}"] = round(
                    e_gfl / MEASURED_PEAK_GFLOPS, 4)
            if e_dev is not None:
                out[f"ensemble_device_us_per_mstep_{n_members}"] = round(
                    e_dev * 1e6, 1)
        except Exception as e:  # noqa: BLE001 - diagnostic metrics
            _log(f"bench: ensemble {n_members} failed: {e}")

    # SPPT ensemble (BASELINE config #4): stochastic physics priced against
    # the same-size deterministic ensemble. The keyed-RNG AR(1) SPPT is the
    # reference's only stochastic feature (sppt.f90:40-111).
    n_sppt = 16 if backend == "tpu" else 4
    try:
        params_sppt = dataclasses.replace(params, sppt_on=True)
        consts_sppt, _ = M.build_consts_cached(params_sppt)
        # Small batches are launch-bound and window-to-window noisy through
        # the tunnel: use more, longer windows than the big-ensemble runs.
        msps_off, *_ = bench_ensemble(params, consts, M, make_demo_model,
                                      n_sppt, n_repeats=5, days_per_repeat=4)
        msps_sppt, *_ = bench_ensemble(params_sppt, consts_sppt, M,
                                       make_demo_model, n_sppt, n_repeats=5,
                                       days_per_repeat=4)
        if msps_sppt > 1.5 * msps_off:
            # Observed once: the tunneled backend returned absurd
            # (hundreds-of-k msps) timings for a freshly compiled
            # executable; a re-measure was sane. Guard the metric.
            _log("bench: sppt timing implausible "
                 f"({msps_sppt:.0f} vs {msps_off:.0f} det); re-measuring")
            msps_sppt, *_ = bench_ensemble(params_sppt, consts_sppt, M,
                                           make_demo_model, n_sppt,
                                           n_repeats=5, days_per_repeat=4)
        out[f"ensemble_msps_{n_sppt}_sppt"] = round(msps_sppt)
        out["sppt_overhead_pct"] = round(100.0 * (msps_off / msps_sppt - 1),
                                         1)
        _log(f"bench: sppt {n_sppt}-member {msps_sppt:.0f} msps "
             f"({out['sppt_overhead_pct']}% overhead vs deterministic "
             f"{msps_off:.0f})")
    except Exception as e:  # noqa: BLE001 - diagnostic metrics
        _log(f"bench: sppt ensemble failed: {e}")

    # Beyond-reference resolution throughput (the reference is compile-time
    # T30-only, params.f90:18-29): T63L8 single member + 64-member batch.
    # TPU-only — a T63 f64 CPU bench would dominate the wall clock.
    if backend == "tpu":
        try:
            from pyspeedy_tpu.params import T63L8

            params63 = dataclasses.replace(T63L8, precision="f32",
                                           fft_mode="matmul")
            consts63, _ = M.build_consts_cached(params63)
            sypd63, _, _, _ = bench_single(params63, consts63, M,
                                           make_demo_model, n_windows=3,
                                           days_per_window=5)
            out["t63_sypd_1member"] = round(sypd63, 1)
        except Exception as e:  # noqa: BLE001
            _log(f"bench: T63 single failed: {e}")
        try:
            msps63, *_ = bench_ensemble(params63, consts63, M,
                                        make_demo_model, 64, n_repeats=2,
                                        days_per_repeat=1)
            out["t63_ensemble_msps_64"] = round(msps63)
        except Exception as e:  # noqa: BLE001
            _log(f"bench: T63 ensemble failed: {e}")
        try:
            from pyspeedy_tpu.params import T47L8

            params47 = dataclasses.replace(T47L8, precision="f32",
                                           fft_mode="matmul")
            consts47, _ = M.build_consts_cached(params47)
            msps47, *_ = bench_ensemble(params47, consts47, M,
                                        make_demo_model, 64, n_repeats=2,
                                        days_per_repeat=1)
            out["t47_ensemble_msps_64"] = round(msps47)
        except Exception as e:  # noqa: BLE001
            _log(f"bench: T47 ensemble failed: {e}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""TPU numerics smoke test: one simulated day, TPU-f32 vs CPU-f32.

Catches backend-specific numeric breakage (wrong lowering, bad Pallas
kernels, non-finite physics) that the CPU-pinned test suite cannot see.
Cross-backend f32 rounding differences amplify chaotically, so the gate is
deliberately coarse: finite fields, no diagnostics failure, and bounded
drift of the day-1 temperature field.

Run standalone on a TPU host: python tools/tpu_smoke.py
(prints one JSON line; exit code 0 = pass). pytest wrapper:
tests/test_tpu_smoke.py (skipped when no TPU is attached).
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def day_run(device):
    from pyspeedy_tpu.models import model as M
    from pyspeedy_tpu.params import T30L8
    from pyspeedy_tpu.testing import make_demo_model

    params = dataclasses.replace(T30L8, precision="f32", fft_mode="matmul")
    with jax.default_device(device):
        # consts/jit caches are backend-specific: build fresh per device
        M._CONSTS_CACHE.clear()
        M._RUN_FN_CACHE.clear()
        M._DEVICE_INIT_CACHE.clear()
        consts, state, cal = make_demo_model(params)
        run = M.make_run_steps(consts, phase=2)
        ctx, _ = M.build_step_ctx(cal, 2, 36)
        out = run(state, ctx)
        jax.block_until_ready(out)
        # Spectral state is a real (2, kx, mx, nx) pair — reads back directly
        # (complex host readback is UNIMPLEMENTED on this backend).
        t = np.asarray(out["t"][0])
        err = bool(np.asarray(out["error_flag"]))
    return t[0] + 1j * t[1], err


def main():
    if jax.default_backend() == "cpu":
        print(json.dumps({"ok": False, "reason": "no TPU attached"}))
        sys.exit(2)

    t_tpu, err_tpu = day_run(jax.devices()[0])
    t_cpu, err_cpu = day_run(jax.devices("cpu")[0])

    finite = bool(np.isfinite(t_tpu).all())
    # complex spectral T coefficients; compare magnitudes on the dominant
    # scale (the (0,0) mean is ~ 300*sqrt(2))
    scale = np.abs(t_cpu).max()
    drift = float(np.abs(t_tpu - t_cpu).max() / scale)
    ok = finite and not err_tpu and not err_cpu and drift < 5e-2
    print(json.dumps({"ok": ok, "finite": finite, "error_flag": err_tpu,
                      "day1_t_drift_rel": drift}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

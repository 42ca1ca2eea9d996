"""Ablation timing of the batched ensemble step on TPU.

Times, at a given member count, jitted scans of:
  full      — the complete step (dynamics + physics + coupler cadence)
  dynamics  — physics_on=False
  transforms— only the per-step transform load (7 spec2grid stacks +
              13 grid2spec stacks of the step's real shapes)
  carry     — a scan that just adds 1.0 to every dynamic field (HBM floor
              for reading+writing the carried state once per step)

Usage: python tools/ablate_ensemble.py [n_members] [n_steps]
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
from pyspeedy_tpu.ops import spectral as S
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.testing import make_demo_model
from pyspeedy_tpu.parallel.ensemble import broadcast_state, make_run_steps_batched


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.time() - t0


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    backend = jax.default_backend()
    precision = "f64" if backend == "cpu" else "f32"
    params = dataclasses.replace(T30L8, precision=precision,
                                 fft_mode="matmul")
    consts, state, cal = make_demo_model(params)
    bstate = broadcast_state(state, n_members)
    ctx, _ = M.build_step_ctx(cal, 2, n_steps)
    results = {}

    for label, c in [("full", consts),
                     ("dynamics", dataclasses.replace(consts,
                                                      physics_on=False))]:
        run = make_run_steps_batched(c, donate=False, phase=2)
        w = timed(run, bstate, ctx)
        results[label] = w
        print(f"{label}: {w*1e3/n_steps:.2f} ms/step "
              f"({n_members*n_steps/w:.0f} member-steps/s)", file=sys.stderr,
              flush=True)

    # Transform-only load: the step does ~7 kx-stacks of spec2grid and
    # ~13 kx-stacks of grid2spec per step (tendencies + physics j1 fields).
    sp = consts.sp
    kx, mx, nx = params.kx, params.mx, params.nx
    il, ix = params.il, params.ix
    dyn, static = M.split_state(bstate)

    @jax.jit
    def carry_only(d):
        def bump(v):
            return (v + jnp.ones((), v.dtype)
                    if jnp.issubdtype(v.dtype, jnp.inexact) else v)

        def body(dd, _):
            return jax.tree.map(bump, dd), None

        out, _ = jax.lax.scan(body, d, None, length=n_steps)
        return out

    w = timed(carry_only, dyn)
    results["carry"] = w
    print(f"carry: {w*1e3/n_steps:.2f} ms/step", file=sys.stderr, flush=True)

    import numpy as np
    rng = np.random.default_rng(0)
    rdtype = np.float64 if precision == "f64" else np.float32
    sre = jax.device_put(rng.standard_normal(
        (n_members, 7 * kx, mx, nx)).astype(rdtype))
    sim = jax.device_put(rng.standard_normal(
        (n_members, 7 * kx, mx, nx)).astype(rdtype))

    @jax.jit
    def transforms(re, im):
        def body(c, _):
            re_c, im_c = c
            g = S.spec2grid(sp, re_c + 1j * im_c, 1)
            g2 = jnp.concatenate([g, g[:, : 6 * kx] * 2.0], axis=1)
            s2 = S.grid2spec(sp, g2)[:, : 7 * kx] * (1.0 / 13.0)
            return (s2.real, s2.imag), None

        (re, im), _ = jax.lax.scan(body, (re, im), None, length=n_steps)
        return re, im

    w = timed(transforms, sre, sim)
    results["transforms"] = w
    print(f"transforms: {w*1e3/n_steps:.2f} ms/step", file=sys.stderr,
          flush=True)

    print(json.dumps({"members": n_members, "steps": n_steps,
                      "ms_per_step": {k: v * 1e3 / n_steps
                                      for k, v in results.items()}}))


if __name__ == "__main__":
    main()

"""Measure transform-boundary variants for the batched (vmapped) ensemble.

Round-3 trace attribution put ~47% of the batched step in the transform
stage, dominated by copy-start HLOs around the dense Legendre/DFT GEMMs
(ops/spectral.py:520-521). Hypothesis: under vmap the real-pair c-axis
slices (p[0], p[1]) and the output jnp.stack force relayout copies of every
transformed field (the physical batch axis is leading, making the sliced
operands non-contiguous for the GEMM lowering).

Variants timed at the step's real per-step transform load (7 inverse +
13 direct kx-stacks), vmapped over n_members, scanned n_steps:

  inv_a / dir_a   current production path (spec2grid_p / grid2spec_p dense)
  inv_b           c-merged Legendre (one GEMM over 2k rows, contiguous
                  reshape) + dual-DFT single GEMM + fused strided add
  inv_c           c-merged Legendre + two DFT GEMMs on F-halves
  inv_packed      ONE c-merged call over all 7 stacks pre-packed into a
                  (2, 50, mx, nx) array (upper bound for packed-state)
  dir_b           dual-DFT single GEMM + joint (j,c,m)-row Legendre GEMM
                  (c-block-diagonal), one small output transpose
  dir_packed      ONE dir_b call over all 13 stacks packed

Usage: python tools/exp_transform_variants.py [n_members] [n_steps]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyspeedy_tpu.models import model as M  # noqa: E402
from pyspeedy_tpu.ops import spectral as S  # noqa: E402
from pyspeedy_tpu.params import T30L8  # noqa: E402

INV_KS = [8, 8, 8, 8, 8, 8, 2]   # vor div t tr ucos vcos pxy
DIR_KS = [8] * 9 + [1]           # utend vtend fluxes ke ttend trtend psdt


def build_extra_tables(sp):
    """Auxiliary operators for the variants (numpy, built once)."""
    mx, nx, il, ix = sp.mx, sp.nx, sp.il, sp.ix
    d_re = np.asarray(sp.dft_inv_re)
    d_im = np.asarray(sp.dft_inv_im)
    dual_inv = np.concatenate([d_re, d_im], axis=1)          # (mx, 2ix)
    f_re = np.asarray(sp.dft_fwd_re)
    f_im = np.asarray(sp.dft_fwd_im)
    dual_fwd = np.concatenate([f_re, f_im], axis=1)          # (ix, 2mx)

    # Joint-row direct Legendre: rows (j, c, m), cols (c, m, n);
    # L2[(j,c,m),(c,m,n)] = cpol_dir_full[j,m,n]
    cpol_dir = np.asarray(sp.cpol_dir_full)                   # (il, mx, nx)
    L2 = np.zeros((il, 2, mx, 2, mx, nx), dtype=cpol_dir.dtype)
    idx = np.arange(mx)
    for c in range(2):
        L2[:, c, idx, c, idx, :] = cpol_dir
    L2 = L2.reshape(il * 2 * mx, 2 * mx * nx)
    dt = np.asarray(sp.wt).dtype
    return (jnp.asarray(dual_inv, dt), jnp.asarray(dual_fwd, dt),
            jnp.asarray(L2, dt))


def inv_current(sp, p, kcos=1):
    return S.spec2grid_p(sp, p, kcos)


def inv_b(sp, dual_inv, p):
    """c-merged Legendre + dual-DFT GEMM + fused strided add."""
    two, k = p.shape[0], p.shape[1]
    x = p.reshape(two * k, sp.mx * sp.nx)
    F = (x @ sp.leg_inv_dense).reshape(two, k, sp.il, sp.mx)
    G2 = F @ dual_inv                     # (2, k, il, 2ix)
    ix = sp.ix
    return G2[0, ..., :ix] + G2[1, ..., ix:]


def inv_c(sp, p):
    """c-merged Legendre + two DFT GEMMs on contiguous-half views."""
    two, k = p.shape[0], p.shape[1]
    x = p.reshape(two * k, sp.mx * sp.nx)
    F = (x @ sp.leg_inv_dense).reshape(two, k, sp.il, sp.mx)
    return F[0] @ sp.dft_inv_re + F[1] @ sp.dft_inv_im


def dir_current(sp, g):
    return S.grid2spec_p(sp, g)


def dir_b(sp, dual_fwd, L2, g):
    """Dual-DFT single GEMM + joint (j,c,m)-row Legendre, one transpose."""
    k = g.shape[0]
    F2 = g @ dual_fwd                     # (k, il, 2mx) rows are (j,(c,m))
    out = (F2.reshape(k, sp.il * 2 * sp.mx) @ L2)
    return out.reshape(k, 2, sp.mx, sp.nx).transpose(1, 0, 2, 3)


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    backend = jax.default_backend()
    precision = "f64" if backend == "cpu" else "f32"
    params = dataclasses.replace(T30L8, precision=precision,
                                 fft_mode="matmul")
    from pyspeedy_tpu.ops.geometry import build_geometry
    geom = build_geometry(params)
    sp = S.build_spectral(params, geom, use_matmul_fft=True)
    dual_inv, dual_fwd, L2 = build_extra_tables(sp)
    mx, nx, il, ix = params.mx, params.nx, params.il, params.ix

    rng = np.random.default_rng(0)
    rdtype = np.float64 if precision == "f64" else np.float32
    specs = [jax.device_put(rng.standard_normal(
        (n_members, 2, k, mx, nx)).astype(rdtype)) for k in INV_KS]
    grids = [jax.device_put(rng.standard_normal(
        (n_members, k, il, ix)).astype(rdtype)) for k in DIR_KS]
    packed_spec = jax.device_put(rng.standard_normal(
        (n_members, 2, sum(INV_KS), mx, nx)).astype(rdtype))
    packed_grid = jax.device_put(rng.standard_normal(
        (n_members, sum(DIR_KS), il, ix)).astype(rdtype))

    results = {}

    def scan_over(one_fn, args):
        """Scan a transform over steps, feeding outputs back (shape-matched
        by a cheap linear map) so the scan can't be collapsed."""
        def body(c, _):
            outs = one_fn(c)
            return outs, None

        @jax.jit
        def run(c):
            out, _ = jax.lax.scan(body, c, None, length=n_steps)
            return out

        return timed(run, args)

    # ---- inverse variants: 7 stacks, output fed back via grid2spec of g ---
    def mk_inv(variant):
        def one(specs_c):
            gs = []
            for p in specs_c:
                if variant == "a":
                    g = jax.vmap(lambda q: inv_current(sp, q))(p)
                elif variant == "b":
                    g = jax.vmap(lambda q: inv_b(sp, dual_inv, q))(p)
                else:
                    g = jax.vmap(lambda q: inv_c(sp, q))(p)
                gs.append(g)
            # feed back: cheap pointwise map back to spectral shapes
            return [p + 1e-12 * jnp.sum(g) for p, g in zip(specs_c, gs)]
        return one

    for v in ("a", "b", "c"):
        w = scan_over(mk_inv(v), specs)
        results[f"inv_{v}"] = w * 1e3 / n_steps
        print(f"inv_{v}: {w*1e3/n_steps:.3f} ms/step", file=sys.stderr,
              flush=True)

    def one_packed_inv(p):
        g = jax.vmap(lambda q: inv_b(sp, dual_inv, q))(p)
        return p + 1e-12 * jnp.sum(g)

    w = scan_over(one_packed_inv, packed_spec)
    results["inv_packed"] = w * 1e3 / n_steps
    print(f"inv_packed: {w*1e3/n_steps:.3f} ms/step", file=sys.stderr,
          flush=True)

    # ---- direct variants: 13 stacks ---------------------------------------
    def mk_dir(variant):
        def one(grids_c):
            ss = []
            for g in grids_c:
                if variant == "a":
                    s = jax.vmap(lambda q: dir_current(sp, q))(g)
                else:
                    s = jax.vmap(lambda q: dir_b(sp, dual_fwd, L2, q))(g)
                ss.append(s)
            return [g + 1e-12 * jnp.sum(s) for g, s in zip(grids_c, ss)]
        return one

    for v in ("a", "b"):
        w = scan_over(mk_dir(v), grids)
        results[f"dir_{v}"] = w * 1e3 / n_steps
        print(f"dir_{v}: {w*1e3/n_steps:.3f} ms/step", file=sys.stderr,
              flush=True)

    def one_packed_dir(g):
        s = jax.vmap(lambda q: dir_b(sp, dual_fwd, L2, q))(g)
        return g + 1e-12 * jnp.sum(s)

    w = scan_over(one_packed_dir, packed_grid)
    results["dir_packed"] = w * 1e3 / n_steps
    print(f"dir_packed: {w*1e3/n_steps:.3f} ms/step", file=sys.stderr,
          flush=True)

    # numeric parity of the variants vs production
    p0 = specs[0][:4]
    ga = jax.jit(jax.vmap(lambda q: inv_current(sp, q)))(p0)
    gb = jax.jit(jax.vmap(lambda q: inv_b(sp, dual_inv, q)))(p0)
    gc = jax.jit(jax.vmap(lambda q: inv_c(sp, q)))(p0)
    err_b = float(jnp.abs(ga - gb).max())
    err_c = float(jnp.abs(ga - gc).max())
    g0 = grids[0][:4]
    sa = jax.jit(jax.vmap(lambda q: dir_current(sp, q)))(g0)
    sb = jax.jit(jax.vmap(lambda q: dir_b(sp, dual_fwd, L2, q)))(g0)
    err_dir = float(jnp.abs(sa - sb).max())
    results["err_inv_b"] = err_b
    results["err_inv_c"] = err_c
    results["err_dir_b"] = err_dir
    print(f"parity: inv_b {err_b:.2e} inv_c {err_c:.2e} dir_b {err_dir:.2e}",
          file=sys.stderr, flush=True)

    print(json.dumps({"members": n_members, "steps": n_steps,
                      "backend": backend, "ms_per_step": results}))


if __name__ == "__main__":
    main()

"""Round-5 experiment: fused two-GEMM spectral transforms in one Pallas
kernel (the BENCH_NOTES round-4 lead — keep the Fourier intermediate in
VMEM instead of round-tripping it through HBM).

Per field-level the XLA chain moves grid(18.4KB) + Fourier(11.9KB r+w) +
spec(7.9KB); eliminating the intermediate's HBM r+w predicts direct
2.85 -> ~1.9 ms/step and inverse 1.95 -> ~1.3 at 256 members.

VMEM budget per instance (bt=64 batch rows, f32): grid tile 1.18 MB +
dense Legendre table 5.65 MB + Fourier scratch 0.76 MB + spec out 0.25 MB
= ~8 MB < 16 MB. The table's block index is constant across grid steps, so
Mosaic fetches it once.

Variants probe Mosaic lowering strategies for the awkward middle step
(GEMM1 emits (bt*il, mx) rows; GEMM2 wants (bt, il*mx) K-dim):
  A: jnp.reshape between the dots
  B: dot_general with two contracting dims ((il, mx) against (il, mx, ...))

Usage: python tools/exp_fused_transform.py [n_members] [bt]
"""

import dataclasses
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyspeedy_tpu.ops import spectral as S
from pyspeedy_tpu.ops.geometry import build_geometry
from pyspeedy_tpu.params import T30L8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, *args, n_rep=7):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), out


# --------------------------------------------------------------------------
# Fused direct: grid (B, il, ix) -> spec pair (2, B, mx, nx)
# --------------------------------------------------------------------------

def fused_grid2spec(sp, grid, bt=64, variant="A"):
    B, il, ix = grid.shape
    mx, nx = sp.mx, sp.nx
    assert B % bt == 0
    f32 = jnp.float32
    in_dt = grid.dtype
    dre = sp.dft_fwd_re.astype(in_dt)
    dim = sp.dft_fwd_im.astype(in_dt)
    leg = sp.leg_dir_dense.astype(in_dt)          # (il*mx, mx*nx)
    leg3 = leg.reshape(il, mx, mx * nx)

    def kernel(g_ref, dre_ref, dim_ref, leg_ref, ore_ref, oim_ref):
        g = g_ref[...].reshape(bt * il, ix)
        # Mosaic requires 32-bit accumulation; cast the intermediate to
        # the operand dtype afterwards (bf16 path keeps 2-byte GEMM2 reads).
        fre = jnp.dot(g, dre_ref[...],
                      preferred_element_type=jnp.float32).astype(in_dt)
        fim = jnp.dot(g, dim_ref[...],
                      preferred_element_type=jnp.float32).astype(in_dt)
        if variant == "A":
            lg = leg_ref[...].reshape(il * mx, mx * nx)
            sre = jnp.dot(fre.reshape(bt, il * mx), lg,
                          preferred_element_type=f32)
            sim = jnp.dot(fim.reshape(bt, il * mx), lg,
                          preferred_element_type=f32)
        else:  # B: two contracting dims, no flat reshape
            dn = (((1, 2), (0, 1)), ((), ()))
            sre = jax.lax.dot_general(fre.reshape(bt, il, mx), leg_ref[...],
                                      dn, preferred_element_type=f32)
            sim = jax.lax.dot_general(fim.reshape(bt, il, mx), leg_ref[...],
                                      dn, preferred_element_type=f32)
        ore_ref[...] = sre.reshape(bt, mx, nx)
        oim_ref[...] = sim.reshape(bt, mx, nx)

    table = leg if variant == "A" else leg3
    t_spec = pl.BlockSpec(table.shape, lambda b: (0,) * table.ndim)
    out_sd = jax.ShapeDtypeStruct((B, mx, nx), f32)
    ore, oim = pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, il, ix), lambda b: (b, 0, 0)),
            pl.BlockSpec(dre.shape, lambda b: (0, 0)),
            pl.BlockSpec(dim.shape, lambda b: (0, 0)),
            t_spec,
        ],
        out_specs=[pl.BlockSpec((bt, mx, nx), lambda b: (b, 0, 0))] * 2,
        out_shape=[out_sd, out_sd],
    )(grid, dre, dim, table)
    return jnp.stack([ore, oim])


# --------------------------------------------------------------------------
# Fused inverse: spec pair (2, B, mx, nx) -> grid (B, il, ix)
# --------------------------------------------------------------------------

def fused_spec2grid(sp, spec_pair, bt=64, variant="A"):
    _, B, mx, nx = spec_pair.shape
    il, ix = sp.il, 2 * sp.il
    assert B % bt == 0
    f32 = jnp.float32
    leg = sp.leg_inv_dense                         # (mx*nx, il*mx)
    dinv_re = sp.dft_inv_re                        # (mx, ix)
    dinv_im = sp.dft_inv_im

    def kernel(sre_ref, sim_ref, leg_ref, dre_ref, dim_ref, o_ref):
        lg = leg_ref[...]
        fre = jnp.dot(sre_ref[...].reshape(bt, mx * nx), lg,
                      preferred_element_type=f32)   # (bt, il*mx)
        fim = jnp.dot(sim_ref[...].reshape(bt, mx * nx), lg,
                      preferred_element_type=f32)
        g = (jnp.dot(fre.reshape(bt * il, mx), dre_ref[...],
                     preferred_element_type=f32)
             + jnp.dot(fim.reshape(bt * il, mx), dim_ref[...],
                       preferred_element_type=f32))
        o_ref[...] = g.reshape(bt, il, ix)

    out_sd = jax.ShapeDtypeStruct((B, il, ix), f32)
    out = pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, mx, nx), lambda b: (b, 0, 0)),
            pl.BlockSpec((bt, mx, nx), lambda b: (b, 0, 0)),
            pl.BlockSpec(leg.shape, lambda b: (0, 0)),
            pl.BlockSpec(dinv_re.shape, lambda b: (0, 0)),
            pl.BlockSpec(dinv_im.shape, lambda b: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((bt, il, ix), lambda b: (b, 0, 0))],
        out_shape=[out_sd],
    )(spec_pair[0], spec_pair[1], leg, dinv_re, dinv_im)[0]
    return out


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    bt = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    params = dataclasses.replace(T30L8, precision="f32", fft_mode="matmul")
    geom = build_geometry(params)
    sp = S.build_spectral(params, geom, use_matmul_fft=True)
    kx = params.kx

    n_dir_stacks, n_inv_stacks = 13, 7
    B_dir = n_members * n_dir_stacks * kx
    B_inv = n_members * n_inv_stacks * kx
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.standard_normal((B_dir, params.il, params.ix)),
                       dtype=jnp.float32)
    spec = jnp.asarray(0.01 * rng.standard_normal((2, B_inv, params.mx,
                                                   params.nx)),
                       dtype=jnp.float32)

    log(f"backend={jax.default_backend()} B_dir={B_dir} B_inv={B_inv}")

    # XLA baselines in the PRODUCTION shape: 13 (7) separate per-stack
    # calls of (members, kx, il, ix), exactly like the per-field transforms
    # in the batched step.
    g_stacks = grid.reshape(n_dir_stacks, n_members * kx, params.il,
                            params.ix)
    s_stacks = spec.reshape(2, n_inv_stacks, n_members * kx, params.mx,
                            params.nx)

    def xla_dir(gs):
        return jnp.stack([S.grid2spec_p(sp, gs[i])
                          for i in range(n_dir_stacks)], axis=1)

    def xla_inv(ss):
        return jnp.stack([S.spec2grid_p(sp, ss[:, i])
                          for i in range(n_inv_stacks)], axis=0)

    t, ref_dir4 = timeit(jax.jit(xla_dir), g_stacks)
    ref_dir = ref_dir4.reshape(2, B_dir, params.mx, params.nx)
    log(f"XLA direct f32 : {t*1e3:7.2f} ms  ({n_members} members, "
        f"{n_dir_stacks} stacks)")
    t, _ = timeit(jax.jit(xla_dir), g_stacks.astype(jnp.bfloat16))
    log(f"XLA direct bf16: {t*1e3:7.2f} ms")
    t, ref_inv4 = timeit(jax.jit(xla_inv), s_stacks)
    ref_inv = ref_inv4.reshape(B_inv, params.il, params.ix)
    log(f"XLA inverse    : {t*1e3:7.2f} ms  ({n_inv_stacks} stacks)")

    for bt_try in (bt, 32, 16):
        try:
            fn = jax.jit(functools.partial(fused_grid2spec, sp, bt=bt_try,
                                           variant="A"))
            t, out = timeit(fn, grid)
            err = float(jnp.max(jnp.abs(out - ref_dir)))
            log(f"fused direct A f32 bt={bt_try}: {t*1e3:7.2f} ms  "
                f"(err {err:.2e})")
        except Exception as e:  # noqa: BLE001
            log(f"fused direct A f32 bt={bt_try} FAILED: {str(e)[:200]}")
            continue
        try:
            fn = jax.jit(functools.partial(fused_grid2spec, sp, bt=bt_try,
                                           variant="A"))
            t, out = timeit(fn, grid.astype(jnp.bfloat16))
            err = float(jnp.max(jnp.abs(out - ref_dir)))
            log(f"fused direct A bf16 bt={bt_try}: {t*1e3:7.2f} ms  "
                f"(err {err:.2e})")
        except Exception as e:  # noqa: BLE001
            log(f"fused direct A bf16 bt={bt_try} FAILED: {str(e)[:200]}")
        try:
            fn = jax.jit(functools.partial(fused_spec2grid, sp, bt=bt_try,
                                           variant="A"))
            t, out = timeit(fn, spec)
            err = float(jnp.max(jnp.abs(out - ref_inv)))
            log(f"fused inverse A bt={bt_try}: {t*1e3:7.2f} ms  "
                f"(err {err:.2e})")
        except Exception as e:  # noqa: BLE001
            log(f"fused inverse A bt={bt_try} FAILED: {str(e)[:200]}")
        break


if __name__ == "__main__":
    main()

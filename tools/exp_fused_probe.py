"""Compile-probe: which piece of the fused two-GEMM transform kernel
crashes the remote Mosaic compiler (HTTP 500)?

Stages (each compiled separately, bt=32):
  p0: load grid tile, reshape (bt, il, ix)->(bt*il, ix), GEMM1, store raw
  p1: p0 + reshape (bt*il, mx) -> (bt, il*mx), store
  p2: p1 + GEMM2 against the dense (il*mx, mx*nx) table, store
  p3: inverse-side reshape (bt, il*mx) -> (bt*il, mx) after a GEMM

Usage: python tools/exp_fused_probe.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")

from pyspeedy_tpu.ops import spectral as S
from pyspeedy_tpu.ops.geometry import build_geometry
from pyspeedy_tpu.params import T30L8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    params = dataclasses.replace(T30L8, precision="f32", fft_mode="matmul")
    geom = build_geometry(params)
    sp = S.build_spectral(params, geom, use_matmul_fft=True)
    il, ix, mx, nx = params.il, params.ix, params.mx, params.nx
    bt, B = 32, 256
    f32 = jnp.float32

    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.standard_normal((B, il, ix)), dtype=f32)
    dre = sp.dft_fwd_re
    leg = sp.leg_dir_dense

    def probe(name, kernel, out_shape, out_spec, extra=()):
        in_specs = [pl.BlockSpec((bt, il, ix), lambda b: (b, 0, 0)),
                    pl.BlockSpec(dre.shape, lambda b: (0, 0))]
        args = [grid, dre]
        for a in extra:
            in_specs.append(pl.BlockSpec(a.shape, lambda b: (0, 0)))
            args.append(a)
        try:
            out = pl.pallas_call(
                kernel, grid=(B // bt,), in_specs=in_specs,
                out_specs=[out_spec], out_shape=[out_shape])(*args)
            jax.block_until_ready(out)
            log(f"{name}: OK")
            return True
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED: {str(e)[:160]}")
            return False

    # p0: GEMM1 only, output in (B*il, mx) row layout
    def k0(g_ref, d_ref, o_ref):
        g = g_ref[...].reshape(bt * il, ix)
        o_ref[...] = jnp.dot(g, d_ref[...], preferred_element_type=f32)

    probe("p0 gemm1", k0,
          jax.ShapeDtypeStruct((B * il, mx), f32),
          pl.BlockSpec((bt * il, mx), lambda b: (b, 0)))

    # p1: GEMM1 + flat reshape to (bt, il*mx)
    def k1(g_ref, d_ref, o_ref):
        g = g_ref[...].reshape(bt * il, ix)
        f = jnp.dot(g, d_ref[...], preferred_element_type=f32)
        o_ref[...] = f.reshape(bt, il * mx)

    probe("p1 +reshape", k1,
          jax.ShapeDtypeStruct((B, il * mx), f32),
          pl.BlockSpec((bt, il * mx), lambda b: (b, 0)))

    # p2: full fused chain
    def k2(g_ref, d_ref, l_ref, o_ref):
        g = g_ref[...].reshape(bt * il, ix)
        f = jnp.dot(g, d_ref[...], preferred_element_type=f32)
        s = jnp.dot(f.reshape(bt, il * mx), l_ref[...],
                    preferred_element_type=f32)
        o_ref[...] = s

    probe("p2 full", k2,
          jax.ShapeDtypeStruct((B, mx * nx), f32),
          pl.BlockSpec((bt, mx * nx), lambda b: (b, 0)), extra=(leg,))

    # p3: the inverse-side split reshape (bt, il*mx) -> (bt*il, mx)
    def k3(g_ref, d_ref, o_ref):
        g = g_ref[...].reshape(bt, il * ix)
        f = g[:, : il * mx].reshape(bt * il, mx)
        o_ref[...] = f * 2.0

    probe("p3 split-reshape", k3,
          jax.ShapeDtypeStruct((B * il, mx), f32),
          pl.BlockSpec((bt * il, mx), lambda b: (b, 0)))


if __name__ == "__main__":
    main()

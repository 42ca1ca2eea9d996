"""Compare Legendre-stage formulations on TPU at ensemble batch sizes.

The dense block-diagonal operator (leg_dir_dense) avoids relayout copies but
does mx(=31)x redundant FLOPs; at large member batches the MXU is busy and
the redundancy costs real time. This times, inside one jitted scan each:

  dense      x(R,1488) @ W(1488,992)            (current production path)
  densebf16  same, bf16 inputs + f32 accumulation
  einsum     jmn,cbkjm->cbkmn                   (minimal FLOPs, m batched)
  einsum_mM  mjn,cbkmj->cbkmn with m-major data (no relayout at the dot)

Usage: python tools/bench_legendre.py [n_members] [iters]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyspeedy_tpu.ops import spectral as S
from pyspeedy_tpu.ops.geometry import build_geometry
from pyspeedy_tpu.params import T30L8


def timed_loop(fn, x, iters):
    @jax.jit
    def loop(x0):
        def body(c, _):
            y = fn(c)
            # feed output scale back into input shape to serialize iterations
            return c * (1.0 + 0.0 * jnp.mean(y)), None

        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return c

    out = loop(x)
    jax.block_until_ready(out)
    t0 = time.time()
    out = loop(x)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    params = dataclasses.replace(T30L8, precision="f32", fft_mode="matmul")
    geom = build_geometry(params)
    sp = S.build_spectral(params, geom, use_matmul_fft=True)
    kx, mx, nx, il = params.kx, params.mx, params.nx, params.il

    rng = np.random.default_rng(0)
    B = n_members
    x = jnp.asarray(rng.standard_normal((2, B, kx, il, mx)), jnp.float32)
    Wd = sp.leg_dir_dense.astype(jnp.float32)          # (il*mx, mx*nx)
    cpol = sp.cpol_dir_full.astype(jnp.float32)        # (il, mx, nx)
    cpol_mM = jnp.transpose(cpol, (1, 0, 2))           # (mx, il, nx)
    x_mM = jnp.transpose(x, (0, 1, 2, 4, 3))           # (..., mx, il)

    res = {}

    def dense(c):
        flat = c.reshape(*c.shape[:-2], il * mx)
        return (flat @ Wd).reshape(*c.shape[:-2], mx, nx)

    res["dense"] = timed_loop(dense, x, iters)

    Wb = Wd.astype(jnp.bfloat16)

    def dense_bf16(c):
        flat = c.reshape(-1, il * mx).astype(jnp.bfloat16)
        out = jax.lax.dot(flat, Wb, preferred_element_type=jnp.float32)
        return out.reshape(*c.shape[:-2], mx, nx)

    res["dense_bf16"] = timed_loop(dense_bf16, x, iters)

    def ein(c):
        return jnp.einsum("jmn,cbkjm->cbkmn", cpol, c)

    res["einsum"] = timed_loop(ein, x, iters)

    def ein_mM(c):
        return jnp.einsum("mjn,cbkmj->cbkmn", cpol_mM, c)

    res["einsum_mmajor"] = timed_loop(ein_mM, x_mM, iters)

    # Parity-split half-size dense: fold hemispheres (A = S+N_flipped,
    # D = N_flipped-S), one (iy*mx, mx*nx/2) matmul per parity, interleave
    # even/odd output columns. 4x fewer FLOPs than `dense` (iy vs il rows,
    # nx/2 cols); the fold/interleave are elementwise-fusable.
    iy = il // 2
    wt3 = np.asarray(sp.wt)[:, None, None]
    ce = np.asarray(sp.cpol_even)[:iy] * wt3   # (iy, mx, nx) even-n nonzero
    co = np.asarray(sp.cpol_odd)[:iy] * wt3
    idx = np.arange(mx)
    WE = np.zeros((iy, mx, mx, nx // 2), np.float32)
    WO = np.zeros((iy, mx, mx, nx // 2), np.float32)
    WE[:, idx, idx, :] = ce[:, :, 0::2]
    WO[:, idx, idx, :] = co[:, :, 1::2]
    WEd = jnp.asarray(WE.reshape(iy * mx, mx * (nx // 2)))
    WOd = jnp.asarray(WO.reshape(iy * mx, mx * (nx // 2)))

    def dense_parity(c):
        s = c[..., :iy, :]
        nf = c[..., iy:, :][..., ::-1, :]
        A = (s + nf).reshape(*c.shape[:-2], iy * mx)
        D = (nf - s).reshape(*c.shape[:-2], iy * mx)
        se = (A @ WEd).reshape(*c.shape[:-2], mx, nx // 2)
        so = (D @ WOd).reshape(*c.shape[:-2], mx, nx // 2)
        return jnp.stack([se, so], axis=-1).reshape(*c.shape[:-2], mx, nx)

    res["dense_parity"] = timed_loop(dense_parity, x, iters)

    # correctness vs dense
    a = dense(x)
    b = dense_parity(x)
    err = float(jnp.abs(a - b).max() / jnp.abs(a).max())
    res["parity_vs_dense_relerr"] = err

    print(json.dumps({"members": n_members,
                      **{k: round(v * 1e6, 1) for k, v in res.items()},
                      "unit": "us_per_call"}))


if __name__ == "__main__":
    main()

"""Experiment: can a latitude-tiled Pallas kernel carry the zonal DFT
matmuls (Fourier <-> grid) on the MXU without the matmul-heavy-Mosaic
compile-time blowup seen in round 1?

Times three variants of "inverse DFT -> elementwise chain -> forward DFT"
over a member batch:
  xla     — plain XLA (the current structure: DFT outside, kernel inside)
  pallas  — one Pallas kernel doing DFT-in, chain, DFT-out via 2-D dots
  pallas_mul — same but DFT as broadcast-multiply+sum (VPU fallback)

Usage: python tools/exp_dft_kernel.py [n_members] [n_steps]
Prints compile seconds and per-step milliseconds for each variant.
"""

import functools
import os
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

KX, IL, IX, MX = 8, 48, 96, 31
TILE = 16
NFIELDS = 6  # spectral field groups through the chain


def make_tables(dtype):
    theta = 2.0 * np.pi * np.outer(np.arange(IX), np.arange(MX)) / IX
    dup = np.where(np.arange(MX) == 0, 1.0, 2.0)
    inv_re = (dup[:, None] * np.cos(theta).T).astype(dtype)   # (MX, IX)
    inv_im = (-dup[:, None] * np.sin(theta).T).astype(dtype)
    fwd_re = (np.cos(theta) / IX).astype(dtype)               # (IX, MX)
    fwd_im = (-np.sin(theta) / IX).astype(dtype)
    return inv_re, inv_im, fwd_re, fwd_im


def chain(gs):
    """A stand-in for the grid-space physics/dynamics work: a few dozen
    elementwise ops mixing the fields."""
    out = []
    acc = 0.0
    for g in gs:
        acc = acc + g * g
    acc = acc / len(gs)
    for g in gs:
        h = g + 0.1 * jnp.tanh(acc) - 0.01 * g * acc
        h = jnp.maximum(h, -3.0) + jnp.exp(-jnp.abs(g)) * 0.05
        out.append(h)
    return out


def xla_step(tabs, fre, fim):
    inv_re, inv_im, fwd_re, fwd_im = tabs
    gs = [fre[i] @ inv_re + fim[i] @ inv_im for i in range(NFIELDS)]
    gs = chain(gs)
    orels = [g @ fwd_re for g in gs]
    oims = [g @ fwd_im for g in gs]
    return jnp.stack(orels, axis=0), jnp.stack(oims, axis=0)


def pallas_kernel_dot(fre_ref, fim_ref, ire_ref, iim_ref, fwre_ref,
                      fwim_ref, ore_ref, oim_ref):
    inv_re, inv_im = ire_ref[...], iim_ref[...]
    fwd_re, fwd_im = fwre_ref[...], fwim_ref[...]
    fre = fre_ref[...]
    fim = fim_ref[...]
    nf, kx, tl, mx = fre.shape
    gs = []
    for i in range(nf):
        a = fre[i].reshape(kx * tl, mx)
        b = fim[i].reshape(kx * tl, mx)
        g = jnp.dot(a, inv_re, preferred_element_type=jnp.float32) \
            + jnp.dot(b, inv_im, preferred_element_type=jnp.float32)
        gs.append(g.reshape(kx, tl, IX))
    gs = chain(gs)
    for i, g in enumerate(gs):
        flat = g.reshape(kx * tl, IX)
        ore_ref[i] = jnp.dot(flat, fwd_re,
                             preferred_element_type=jnp.float32
                             ).reshape(kx, tl, mx)
        oim_ref[i] = jnp.dot(flat, fwd_im,
                             preferred_element_type=jnp.float32
                             ).reshape(kx, tl, mx)


def pallas_kernel_mul(fre_ref, fim_ref, ire_ref, iim_ref, fwre_ref,
                      fwim_ref, ore_ref, oim_ref):
    inv_re, inv_im = ire_ref[...], iim_ref[...]
    fwd_re, fwd_im = fwre_ref[...], fwim_ref[...]
    fre = fre_ref[...]
    fim = fim_ref[...]
    nf, kx, tl, mx = fre.shape
    gs = []
    for i in range(nf):
        g = (fre[i][..., None] * inv_re[None, None]
             + fim[i][..., None] * inv_im[None, None]).sum(axis=-2)
        gs.append(g)
    gs = chain(gs)
    for i, g in enumerate(gs):
        ore_ref[i] = (g[..., None] * fwd_re[None, None]).sum(axis=-2)
        oim_ref[i] = (g[..., None] * fwd_im[None, None]).sum(axis=-2)


def make_pallas_step(kernel, tabs):
    tabs_j = tuple(jnp.asarray(t) for t in tabs)

    def step(fre, fim):
        # fre/fim: (NFIELDS, KX, IL, MX); tile over IL
        spec_in = pl.BlockSpec((NFIELDS, KX, TILE, MX),
                               lambda t: (0, 0, t, 0))
        tab_specs = [pl.BlockSpec(t.shape, lambda *_: (0, 0))
                     for t in tabs_j]
        out_shape = [jax.ShapeDtypeStruct((NFIELDS, KX, IL, MX), fre.dtype)
                     for _ in range(2)]
        ore, oim = pl.pallas_call(
            kernel,
            grid=(IL // TILE,),
            in_specs=[spec_in, spec_in] + tab_specs,
            out_specs=[spec_in, spec_in],
            out_shape=out_shape,
        )(fre, fim, *tabs_j)
        return ore, oim

    return step


def bench(label, fn, fre, fim, n_steps):
    @jax.jit
    def scan_fn(a, b):
        def body(c, _):
            return fn(*c), None
        (a, b), _ = jax.lax.scan(body, (a, b), None, length=n_steps)
        return a, b

    t0 = time.time()
    out = scan_fn(fre, fim)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = scan_fn(fre, fim)
    jax.block_until_ready(out)
    wall = time.time() - t0
    print(f"{label}: compile {compile_s:.1f}s, {wall*1e3/n_steps:.3f} ms/step",
          flush=True)
    return out


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dtype = np.float32
    tabs = make_tables(dtype)
    rng = np.random.default_rng(0)
    fre = jnp.asarray(rng.standard_normal(
        (n_members, NFIELDS, KX, IL, MX)).astype(dtype))
    fim = jnp.asarray(rng.standard_normal(
        (n_members, NFIELDS, KX, IL, MX)).astype(dtype))

    tabs_j = tuple(jnp.asarray(t) for t in tabs)
    o_x = bench("xla", jax.vmap(lambda a, b: xla_step(tabs_j, a, b)),
                fre, fim, n_steps)

    step_dot = make_pallas_step(pallas_kernel_dot, tabs)
    o_d = bench("pallas_dot", jax.vmap(step_dot), fre, fim, n_steps)
    err = max(float(jnp.abs(o_x[0] - o_d[0]).max()),
              float(jnp.abs(o_x[1] - o_d[1]).max()))
    print(f"pallas_dot max abs err vs xla: {err:.3e}", flush=True)

    step_mul = make_pallas_step(pallas_kernel_mul, tabs)
    o_m = bench("pallas_mul", jax.vmap(step_mul), fre, fim, n_steps)
    err = max(float(jnp.abs(o_x[0] - o_m[0]).max()),
              float(jnp.abs(o_x[1] - o_m[1]).max()))
    print(f"pallas_mul max abs err vs xla: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()

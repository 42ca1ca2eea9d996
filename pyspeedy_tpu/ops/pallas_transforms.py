"""Pallas TPU kernels: fused spectral <-> grid transforms.

Each direction runs as ONE kernel per block of fields: the intermediate
Fourier coefficients stay in VMEM instead of round-tripping through HBM
between the Legendre contraction and the zonal DFT matmul (XLA will not fuse
across two dots).

The hemispheric parity fold is precomputed into full-sphere operators
(host-side), which both removes the in-kernel reversal (`rev` is not lowered
by Pallas TPU) and replaces the two parity contractions with one:

  inverse:  F[J] = sum_n CPinv[J, m, n] spec[m, n]   (J = 0..il-1)
  direct:   spec[m, n] = sum_J CPdir[J, m, n] F[J]   (weights folded in)

Numerically equivalent to ops.spectral with the matmul-DFT path; tests
cross-check in interpreter mode so the CPU suite covers the kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spec2grid_pallas", "grid2spec_pallas", "full_sphere_operators"]


def full_sphere_operators(sp):
    """(CPinv, CPdir) full-sphere Legendre operators (il, mx, nx) f32.

    CPinv rows: south j -> even-odd; north j -> flipped even+odd.
    CPdir rows: the direct fold with Gaussian weights baked in.
    """
    # NB: transfer first, cast on host (dtype-converting device->host
    # transfers are unimplemented on some TPU backends).
    cpe = np.asarray(sp.cpol_even).astype(np.float64)
    cpo = np.asarray(sp.cpol_odd).astype(np.float64)
    wt = np.asarray(sp.wt).astype(np.float64)[:, None, None]
    south_inv = cpe - cpo
    north_inv = (cpe + cpo)[::-1]
    cpinv = np.concatenate([south_inv, north_inv], axis=0)

    south_dir = (cpe - cpo) * wt
    north_dir = ((cpe + cpo) * wt)[::-1]
    cpdir = np.concatenate([south_dir, north_dir], axis=0)
    return (jnp.asarray(cpinv, jnp.float32), jnp.asarray(cpdir, jnp.float32))


def _kernel_s2g(sre_ref, sim_ref, cpinv_ref, wre_ref, wim_ref, out_ref):
    sre = sre_ref[:]          # (BB, mx, nx)
    sim = sim_ref[:]
    cpinv = cpinv_ref[:]      # (il, mx, nx)

    def leg(s):
        # (il, mx, nx) x (BB, mx, nx): contract n, batch m -> (mx, il, BB)
        return jax.lax.dot_general(
            cpinv, s,
            dimension_numbers=(((2,), (2,)), ((1,), (1,))),
            preferred_element_type=jnp.float32,
        )

    f_re = jnp.transpose(leg(sre), (2, 1, 0))   # (BB, il, mx)
    f_im = jnp.transpose(leg(sim), (2, 1, 0))

    # Drop the imaginary part of the zonal-mean coefficient (FFTPACK packing)
    mcol = jax.lax.broadcasted_iota(jnp.int32, f_im.shape, 2)
    f_im = jnp.where(mcol == 0, 0.0, f_im)

    bb, il, mx = f_re.shape
    ix = wre_ref.shape[1]
    g = (jnp.dot(f_re.reshape(bb * il, mx), wre_ref[:],
                 preferred_element_type=jnp.float32)
         + jnp.dot(f_im.reshape(bb * il, mx), wim_ref[:],
                   preferred_element_type=jnp.float32))
    out_ref[:] = g.reshape(bb, il, ix)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _spec2grid_pallas(sre, sim, cpinv, wre, wim, block_b=32, interpret=False):
    b, mx, nx = sre.shape
    il, ix = cpinv.shape[0], wre.shape[1]

    pad = (-b) % block_b
    if pad:
        sre = jnp.pad(sre, ((0, pad), (0, 0), (0, 0)))
        sim = jnp.pad(sim, ((0, pad), (0, 0), (0, 0)))
    nb = (b + pad) // block_b

    out = pl.pallas_call(
        _kernel_s2g,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_b, mx, nx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, mx, nx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((il, mx, nx), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mx, ix), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mx, ix), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, il, ix), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad, il, ix), jnp.float32),
        interpret=interpret,
    )(sre, sim, cpinv, wre, wim)
    return out[:b]


def spec2grid_pallas(sp, spec, block_b: int = 32, interpret: bool = False):
    """Fused spectral -> grid (kcos=1) via the Pallas kernel.

    spec: (..., mx, nx) complex; returns (..., il, ix) in sp's real dtype.
    """
    cpinv, _ = full_sphere_operators(sp)
    lead = spec.shape[:-2]
    flat = spec.reshape((-1,) + spec.shape[-2:])
    out = _spec2grid_pallas(
        jnp.real(flat).astype(jnp.float32),
        jnp.imag(flat).astype(jnp.float32),
        cpinv,
        jnp.asarray(sp.dft_inv_re, jnp.float32),
        jnp.asarray(sp.dft_inv_im, jnp.float32),
        block_b=block_b, interpret=interpret,
    )
    return out.reshape(lead + out.shape[-2:]).astype(sp.rdtype)


def _kernel_g2s(g_ref, wfre_ref, wfim_ref, cpdir_ref, ore_ref, oim_ref):
    g = g_ref[:]                       # (BB, il, ix)
    bb, il, ix = g.shape
    mx = wfre_ref.shape[1]

    f_re = jnp.dot(g.reshape(bb * il, ix), wfre_ref[:],
                   preferred_element_type=jnp.float32).reshape(bb, il, mx)
    f_im = jnp.dot(g.reshape(bb * il, ix), wfim_ref[:],
                   preferred_element_type=jnp.float32).reshape(bb, il, mx)

    def spec_part(f):
        # (il, mx, nx) x (BB, il, mx): contract J, batch m -> (mx, nx, BB)
        out = jax.lax.dot_general(
            cpdir_ref[:], f,
            dimension_numbers=(((0,), (1,)), ((1,), (2,))),
            preferred_element_type=jnp.float32,
        )
        return jnp.transpose(out, (2, 0, 1))   # (BB, mx, nx)

    ore_ref[:] = spec_part(f_re)
    oim_ref[:] = spec_part(f_im)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _grid2spec_pallas(g, wfre, wfim, cpdir, block_b=32, interpret=False):
    b, il, ix = g.shape
    _, mx, nx = cpdir.shape

    pad = (-b) % block_b
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
    nb = (b + pad) // block_b

    ore, oim = pl.pallas_call(
        _kernel_g2s,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_b, il, ix), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ix, mx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ix, mx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((il, mx, nx), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, mx, nx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, mx, nx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b + pad, mx, nx), jnp.float32),
            jax.ShapeDtypeStruct((b + pad, mx, nx), jnp.float32),
        ),
        interpret=interpret,
    )(g, wfre, wfim, cpdir)
    return ore[:b], oim[:b]


def grid2spec_pallas(sp, grid, block_b: int = 32, interpret: bool = False):
    """Fused grid -> spectral via the Pallas kernel.

    grid: (..., il, ix) real; returns (..., mx, nx) complex.
    """
    _, cpdir = full_sphere_operators(sp)
    lead = grid.shape[:-2]
    flat = grid.reshape((-1,) + grid.shape[-2:])
    ore, oim = _grid2spec_pallas(
        flat.astype(jnp.float32),
        jnp.asarray(sp.dft_fwd_re, jnp.float32),
        jnp.asarray(sp.dft_fwd_im, jnp.float32),
        cpdir,
        block_b=block_b, interpret=interpret,
    )
    out = (ore + 1j * oim).astype(sp.cdtype)
    return out.reshape(lead + out.shape[-2:])

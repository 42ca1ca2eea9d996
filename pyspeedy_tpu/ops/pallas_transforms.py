"""Pallas TPU kernels: fused spectral <-> grid transforms.

Each direction runs as one kernel: the intermediate Fourier coefficients
never round-trip through HBM between the Legendre contraction and the zonal
DFT (XLA will not fuse across two dots).

Structure: the zonal wavenumber m is a grid dimension and the LEADING axis of
the m-indexed operands (so the trailing block dims satisfy Mosaic's (8, 128)
/ full-dimension rule). Per (field-block, m) step the kernel runs one small
(fields x nx) @ (nx x il) matmul for that wavenumber's Legendre part and
either accumulates its zonal contribution into the grid block (inverse) or
writes that m's coefficients (direct).

The hemispheric parity fold is precomputed into full-sphere operators
(ops/spectral.py: cpol_inv_full / cpol_dir_full), which also removes the
in-kernel latitude reversal (`rev` is not lowered by Pallas TPU).

Numerically equivalent to ops.spectral with the matmul-DFT path; tests
cross-check in interpreter mode so the CPU suite covers the kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spec2grid_pallas", "grid2spec_pallas", "full_sphere_operators"]


def full_sphere_operators(sp):
    """(CPinv, CPdir) full-sphere Legendre operators in m-leading layout
    (mx, il, nx) f32, from the tables precomputed in build_spectral."""
    return (jnp.transpose(jnp.asarray(sp.cpol_inv_full, jnp.float32),
                          (1, 0, 2)),
            jnp.transpose(jnp.asarray(sp.cpol_dir_full, jnp.float32),
                          (1, 0, 2)))


def _kernel_s2g(sre_ref, sim_ref, cpinv_ref, wre_ref, wim_ref, out_ref):
    m = pl.program_id(1)
    sre = sre_ref[0]          # (BB, nx) this wavenumber's coefficients
    sim = sim_ref[0]
    cp = cpinv_ref[0]         # (il, nx)

    # Legendre synthesis for this m: (BB, nx) x (nx, il) -> (BB, il)
    dn = (((1,), (1,)), ((), ()))
    f_re = jax.lax.dot_general(sre, cp, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    f_im = jax.lax.dot_general(sim, cp, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    # FFTPACK packing: the zonal-mean coefficient's imaginary part is dropped
    f_im = jnp.where(m == 0, 0.0, f_im)

    # This wavenumber's zonal contribution: (BB, il, 1) * (1, 1, ix)
    w_re = wre_ref[0]         # (1, ix)
    w_im = wim_ref[0]
    contrib = (f_re[:, :, None] * w_re[None, :, :]
               + f_im[:, :, None] * w_im[None, :, :])

    @pl.when(m == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(m > 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _spec2grid_pallas(sre, sim, cpinv, wre, wim, block_b=256,
                      interpret=False):
    mx, b, nx = sre.shape
    il, ix = cpinv.shape[1], wre.shape[2]

    pad = (-b) % block_b
    if pad:
        sre = jnp.pad(sre, ((0, 0), (0, pad), (0, 0)))
        sim = jnp.pad(sim, ((0, 0), (0, pad), (0, 0)))
    nb = (b + pad) // block_b

    out = pl.pallas_call(
        _kernel_s2g,
        grid=(nb, mx),
        in_specs=[
            pl.BlockSpec((1, block_b, nx), lambda i, m: (m, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, nx), lambda i, m: (m, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, il, nx), lambda i, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ix), lambda i, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ix), lambda i, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, il, ix), lambda i, m: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad, il, ix), jnp.float32),
        interpret=interpret,
    )(sre, sim, cpinv, wre, wim)
    return out[:b]


def spec2grid_pallas(sp, spec, block_b: int = 256, interpret: bool = False):
    """Fused spectral -> grid (kcos=1) via the Pallas kernel.

    spec: (..., mx, nx) complex; returns (..., il, ix) in sp's real dtype.
    """
    cpinv, _ = full_sphere_operators(sp)
    lead = spec.shape[:-2]
    flat = spec.reshape((-1,) + spec.shape[-2:])
    flat = jnp.transpose(flat, (1, 0, 2))  # (mx, B, nx)
    out = _spec2grid_pallas(
        jnp.real(flat).astype(jnp.float32),
        jnp.imag(flat).astype(jnp.float32),
        cpinv,
        jnp.asarray(sp.dft_inv_re, jnp.float32)[:, None, :],
        jnp.asarray(sp.dft_inv_im, jnp.float32)[:, None, :],
        block_b=block_b, interpret=interpret,
    )
    return out.reshape(lead + out.shape[-2:]).astype(sp.rdtype)


def _kernel_g2s(g_ref, wfre_ref, wfim_ref, cpdir_ref, ore_ref, oim_ref):
    g = g_ref[:]                       # (BB, il, ix)
    bb, il, ix = g.shape
    cp = cpdir_ref[0]                  # (il, nx)
    g2 = g.reshape(bb * il, ix)

    # Zonal DFT for this m: (BB*il, ix) . (ix,) -> (BB, il)
    dn = (((1,), (1,)), ((), ()))
    f_re = jax.lax.dot_general(g2, wfre_ref[0], dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    f_im = jax.lax.dot_general(g2, wfim_ref[0], dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    f_re = f_re.reshape(bb, il)
    f_im = f_im.reshape(bb, il)

    # Legendre analysis: (BB, il) x (il, nx) -> (BB, nx)
    ore_ref[0] = jnp.dot(f_re, cp, preferred_element_type=jnp.float32)
    oim_ref[0] = jnp.dot(f_im, cp, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _grid2spec_pallas(g, wfre, wfim, cpdir, block_b=256, interpret=False):
    b, il, ix = g.shape
    mx, _, nx = cpdir.shape

    pad = (-b) % block_b
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
    nb = (b + pad) // block_b

    ore, oim = pl.pallas_call(
        _kernel_g2s,
        grid=(nb, mx),
        in_specs=[
            pl.BlockSpec((block_b, il, ix), lambda i, m: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ix), lambda i, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ix), lambda i, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, il, nx), lambda i, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, nx), lambda i, m: (m, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, nx), lambda i, m: (m, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mx, b + pad, nx), jnp.float32),
            jax.ShapeDtypeStruct((mx, b + pad, nx), jnp.float32),
        ),
        interpret=interpret,
    )(g, wfre, wfim, cpdir)
    return ore[:, :b], oim[:, :b]


def grid2spec_pallas(sp, grid, block_b: int = 256, interpret: bool = False):
    """Fused grid -> spectral via the Pallas kernel.

    grid: (..., il, ix) real; returns (..., mx, nx) complex.
    """
    _, cpdir = full_sphere_operators(sp)
    lead = grid.shape[:-2]
    flat = grid.reshape((-1,) + grid.shape[-2:])
    ore, oim = _grid2spec_pallas(
        flat.astype(jnp.float32),
        jnp.asarray(sp.dft_fwd_re.T, jnp.float32)[:, None, :],
        jnp.asarray(sp.dft_fwd_im.T, jnp.float32)[:, None, :],
        cpdir,
        block_b=block_b, interpret=interpret,
    )
    out = (ore + 1j * oim).astype(sp.cdtype)
    out = jnp.transpose(out, (1, 0, 2))   # (B, mx, nx)
    return out.reshape(lead + out.shape[-2:])

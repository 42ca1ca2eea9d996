"""The grid-space physics chain as ONE Pallas TPU kernel.

Motivation (round-2 profiling): at ensemble batch sizes the XLA step is
bound by HBM traffic — every physics stage materializes full-grid
intermediates and the async copy/slice DMAs dominate device time. The
physics is column-local (SURVEY.md §1: no horizontal stencils anywhere in
the reference's parameterizations, physics.f90:14-256), so the whole chain
tiles perfectly over latitude bands: one kernel reads the prognostic grids
and boundary fields once, runs convection -> condensation -> radiation ->
surface fluxes -> vertical diffusion entirely in VMEM, and writes the
tendencies and diagnostics once. Kernel body = the SAME
`driver.grid_physics` code (pure elementwise/level-reduction jnp ops), so
XLA and Pallas paths cannot drift apart. Measured on the TPU at 256
members: 3.4 ms vs 10.2 ms for the XLA chain, bitwise-identical outputs.

vmap over ensemble members maps onto an extra pallas grid dimension
automatically, which is exactly the batched-ensemble execution model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pallas_tiling import tiled_columnwise

__all__ = ["grid_physics_pallas"]


def grid_physics_pallas(consts, sw_flag: bool, ug, vg, tg, qg, phig, pslg,
                        bc, cache, ablco2, tile: int | None = None,
                        interpret: bool = False, phisg=None, m0corr=None,
                        sppt_pattern=None):
    """Pallas-tiled execution of driver.grid_physics (same signature and
    return structure). sw_flag must be a Python bool (the phase-specialized
    scans provide one; traced-flag steps fall back to the XLA path).

    phig=None selects the in-kernel hydrostatic geopotential (see
    driver.grid_physics): phisg (il, ix) and m0corr (kx, il, 1) enter as
    latitude-tiled operands instead of the full phig stack.

    sppt_pattern, when given, is the (kx, il, ix) SPPT multiplier field —
    another latitude-tiled operand; the multiplicative application fuses
    into the kernel epilogue ahead of the bf16 tendency cast."""
    from .driver import grid_physics

    params = consts.params
    il, ix = params.il, params.ix
    n_bc, n_cache = len(bc), len(cache)

    # ablco2 is a traced scalar (runtime CO2 flag): ship as (1, 1) so it has
    # a blockable shape; every tile reads the same block. Latitude-dependent
    # geometry must enter as a sliced operand (the kernel sees only its
    # latitude tile): cos(lat) for the skin-temp daily cycle.
    ab2 = jnp.reshape(ablco2, (1, 1)).astype(pslg.dtype)
    coa2d = jnp.broadcast_to(
        jnp.asarray(consts.geom.coa, dtype=pslg.dtype)[:, None], (il, ix))

    in_phi = (pslg,) if phig is None else (phig, pslg)
    extra = (phisg, m0corr) if phig is None else ()
    sppt = () if sppt_pattern is None else (sppt_pattern,)
    n_head = 4 + len(in_phi)
    n_tail = len(extra) + len(sppt) + 2
    args = ((ug, vg, tg, qg) + in_phi + tuple(bc) + tuple(cache)
            + extra + sppt + (coa2d, ab2))

    def body(*vals):
        ug_b, vg_b, tg_b, qg_b = vals[:4]
        if phig is None:
            pslg_b = vals[4]
            phig_b = None
        else:
            phig_b, pslg_b = vals[4:6]
        bc_b = tuple(vals[n_head:n_head + n_bc])
        cache_b = tuple(vals[n_head + n_bc:n_head + n_bc + n_cache])
        tail = vals[len(vals) - n_tail:]
        if phig is None:
            phisg_b, m0_b = tail[0], tail[1]
        else:
            phisg_b = m0_b = None
        sppt_b = tail[len(extra)] if sppt else None
        coa_b = tail[-2]
        ab_b = tail[-1][0, 0]
        return grid_physics(consts, sw_flag, ug_b, vg_b, tg_b, qg_b,
                            phig_b, pslg_b, bc_b, cache_b, ab_b,
                            coa2d=coa_b, phisg=phisg_b, m0corr=m0_b,
                            sppt_pattern=sppt_b)

    return tiled_columnwise(body, args, il, tile=tile, interpret=interpret)

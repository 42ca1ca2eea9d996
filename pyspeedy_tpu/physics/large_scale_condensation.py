"""Large-scale condensation (reference:
speedy.f90/large_scale_condensation.f90): relaxation of q to a
sigma-dependent RH threshold with capped latent heating."""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as pc

__all__ = ["get_large_scale_condensation_tendencies"]

TRLSC = 4.0    # relaxation time [h]
RHLSC = 0.9    # RH threshold at sigma=1
DRHLSC = 0.1   # vertical range of the threshold
RHBLSC = 0.95  # boundary-layer RH threshold


def get_large_scale_condensation_tendencies(geom, psa, qa, qsat, itop):
    """Returns (itop, precls, dtlsc, dqlsc)
    (large_scale_condensation.f90:33-96); dtlsc/dqlsc are direct tendencies
    (K/s, g/kg/s), itop is updated with the condensation top."""
    kx = qa.shape[0]
    fsg, dhs = geom.fsg, geom.dhs

    qsmax = 10.0
    rtlsc = 1.0 / (TRLSC * 3600.0)
    tfact = pc.ALHC / pc.CP
    prg = pc.P0 / pc.GRAV
    psa2 = psa**2

    dtlsc = [jnp.zeros_like(psa)]
    dqlsc = [jnp.zeros_like(psa)]
    for k in range(2, kx + 1):  # 1-based levels 2..kx
        k0 = k - 1
        sig2 = fsg[k0] ** 2
        rhref = RHLSC + DRHLSC * (sig2 - 1.0)
        if k == kx:
            rhref = jnp.maximum(rhref, RHBLSC)
        dqmax = qsmax * sig2 * rtlsc

        dqa = rhref * qsat[k0] - qa[k0]
        cond = dqa < 0.0
        itop = jnp.where(cond, jnp.minimum(k, itop), itop)
        dq = jnp.where(cond, dqa * rtlsc, 0.0)
        dt_ = jnp.where(cond, tfact * jnp.minimum(-dq, dqmax * psa2), 0.0)
        dqlsc.append(dq)
        dtlsc.append(dt_)

    dqlsc = jnp.stack(dqlsc)
    dtlsc = jnp.stack(dtlsc)

    precls = -jnp.einsum("k,kji->ji", dhs[1:] * prg, dqlsc[1:]) * psa
    return itop, precls, dtlsc, dqlsc

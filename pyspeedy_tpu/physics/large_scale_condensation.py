"""Large-scale condensation (reference:
speedy.f90/large_scale_condensation.f90): relaxation of q to a
sigma-dependent RH threshold with capped latent heating."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

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

    # Level-parallel over 1-based levels 2..kx: per-level scalars become
    # (kx, 1, 1) broadcast columns (all host-side numpy).
    sig2 = np.asarray(fsg) ** 2
    rhref = RHLSC + DRHLSC * (sig2 - 1.0)
    rhref[kx - 1] = max(rhref[kx - 1], RHBLSC)
    dqmax = qsmax * sig2 * rtlsc
    lvl = np.zeros((kx, 1, 1), dtype=sig2.dtype)
    lvl[1:] = 1.0  # level 1 (k0 = 0) carries no large-scale condensation
    col = lambda a: a[:, None, None]

    dqa = col(rhref) * qsat - qa
    cond = (dqa < 0.0) & (lvl > 0.0)
    # sequential "itop = min(k, itop) when cond" == elementwise min over hits
    karr = np.arange(1, kx + 1, dtype=np.int32)[:, None, None]
    hitk = jnp.where(cond, karr, np.int32(kx + 1))
    itop = jnp.minimum(itop, jnp.min(hitk, axis=0))
    dqlsc = jnp.where(cond, dqa * rtlsc, 0.0)
    dtlsc = jnp.where(
        cond, tfact * jnp.minimum(-dqlsc, col(dqmax) * psa2[None]), 0.0)

    wcol = (np.asarray(dhs)[1:] * prg)[:, None, None]
    precls = -jnp.sum(wcol * dqlsc[1:], axis=0) * psa
    return itop, precls, dtlsc, dqlsc

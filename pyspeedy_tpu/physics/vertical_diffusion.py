"""Vertical diffusion and shallow convection (reference:
speedy.f90/vertical_diffusion.f90): shallow convection between the lowest two
layers, slow moisture diffusion above the PBL, and super-adiabatic lapse-rate
damping."""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as pc

__all__ = ["get_vertical_diffusion_tend"]

TRSHC = 6.0    # shallow-convection relaxation time [h]
TRVDI = 24.0   # moisture-diffusion relaxation time [h]
TRVDS = 6.0    # super-adiabatic damping time [h]
REDSHC = 0.5   # shallow-convection reduction under deep convection
RHGRAD = 0.5   # max d(RH)/d(sigma)
SEGRAD = 0.1   # min d(DSE)/d(phi)


def get_vertical_diffusion_tend(geom, se, rh, qa, qsat, phi, icnv):
    """Returns (utenvd, vtenvd, ttenvd, qtenvd); u/v tendencies are zero in
    the reference scheme (vertical_diffusion.f90:30-146)."""
    kx = se.shape[0]
    nl1 = kx - 1
    fsg, dhs, sigh = geom.fsg, geom.dhs, geom.sigh

    cshc = dhs[kx - 1] / 3600.0
    cvdi = (sigh[nl1] - sigh[1]) / ((nl1 - 1) * 3600.0)
    fshcq = cshc / TRSHC
    fshcse = cshc / (TRSHC * pc.CP)
    fvdiq = cvdi / TRVDI
    fvdise = cvdi / (TRVDS * pc.CP)

    rsig = 1.0 / dhs
    # rsig1[k0] = 1/(1 - sigh(k)) 1-based, needed only for k=1..nl1
    rsig1 = 1.0 / (1.0 - sigh[1:nl1 + 1])

    tt = [jnp.zeros_like(se[0]) for _ in range(kx)]
    qt = [jnp.zeros_like(se[0]) for _ in range(kx)]

    # 2. shallow convection (vdiff:81-109)
    drh0 = RHGRAD * (fsg[kx - 1] - fsg[nl1 - 1])
    fvdiq2 = fvdiq * sigh[nl1]
    dmse = se[kx - 1] - se[nl1 - 1] + pc.ALHC * (qa[kx - 1] - qsat[nl1 - 1])
    drh = rh[kx - 1] - rh[nl1 - 1]
    fcnv = jnp.where(icnv > 0, REDSHC, 1.0)

    unstable = dmse >= 0.0
    fluxse = jnp.where(unstable, fcnv * fshcse * dmse, 0.0)
    tt[nl1 - 1] = fluxse * rsig[nl1 - 1]
    tt[kx - 1] = -fluxse * rsig[kx - 1]

    moist = unstable & (drh >= 0.0)
    dry_humid = (~unstable) & (drh > drh0)
    fluxq = jnp.where(moist, fcnv * fshcq * qsat[kx - 1] * drh,
                      jnp.where(dry_humid, fvdiq2 * qsat[nl1 - 1] * drh, 0.0))
    qt[nl1 - 1] = fluxq * rsig[nl1 - 1]
    qt[kx - 1] = -fluxq * rsig[kx - 1]

    # 3. moisture diffusion above the PBL (vdiff:111-128)
    for k in range(3, kx - 1):  # 1-based 3..kx-2
        k0 = k - 1
        if sigh[k] > 0.5:
            drh0k = RHGRAD * (fsg[k0 + 1] - fsg[k0])
            fvdiq2k = fvdiq * sigh[k]
            drhk = rh[k0 + 1] - rh[k0]
            m = drhk >= drh0k
            fq = jnp.where(m, fvdiq2k * qsat[k0] * drhk, 0.0)
            qt[k0] = qt[k0] + fq * rsig[k0]
            qt[k0 + 1] = qt[k0 + 1] - fq * rsig[k0 + 1]

    # 4. super-adiabatic lapse-rate damping (vdiff:130-145)
    for k in range(1, kx):  # 1-based 1..nl1
        k0 = k - 1
        se0 = se[k0 + 1] + SEGRAD * (phi[k0] - phi[k0 + 1])
        m = se[k0] < se0
        fse = jnp.where(m, fvdise * (se0 - se[k0]), 0.0)
        tt[k0] = tt[k0] + fse * rsig[k0]
        for k1 in range(k0 + 1, kx):
            tt[k1] = tt[k1] - fse * rsig1[k0]

    zeros = jnp.zeros((kx,) + se.shape[1:], dtype=se.dtype)
    return zeros, zeros, jnp.stack(tt), jnp.stack(qt)

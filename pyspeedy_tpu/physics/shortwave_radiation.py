"""Shortwave radiation, cloud diagnosis and seasonal insolation
(reference: speedy.f90/shortwave_radiation.f90).

The downward/upward absorption sweeps are short static loops over kx levels —
fully fused elementwise XLA.  The routine also initializes the longwave
transmissivities (bands of rad_tau2) and the stratospheric correction, which
persist in the model state across the nstrad-step shortwave cadence.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as pc

__all__ = ["clouds", "solar_insolation", "get_zonal_average_fields",
           "get_shortwave_rad_fluxes"]

SOLC = 342.0
RHCL1 = 0.30
RHCL2 = 1.00
QACL = 0.20
WPCL = 0.2
PMAXCL = 10.0
CLSMAX = 0.60
CLSMINL = 0.15
GSE_S0 = 0.25
GSE_S1 = 0.40
ALBCL = 0.43
ALBCLS = 0.50
EPSSW = 0.020

ABSDRY = 0.033
ABSAER = 0.033
ABSWV1 = 0.022
ABSWV2 = 15.000
ABSCL1 = 0.015
ABSCL2 = 0.15

ABLWIN = 0.3
ABLWV1 = 0.7
ABLWV2 = 50.0
ABLCL1 = 12.0
ABLCL2 = 0.6


def clouds(qa, rh, precnv, precls, iptop, gse, fmask):
    """Cloud cover and cloud-top diagnosis (shortwave_radiation.f90:325-404).
    Returns (icltop [1-based], cloudc, clstr, qcloud_equiv)."""
    kx = qa.shape[0]
    nl1 = kx - 1
    nlp = kx + 1
    rrcl = 1.0 / (RHCL2 - RHCL1)

    base = rh[nl1 - 1] > RHCL1
    cloudc = jnp.where(base, rh[nl1 - 1] - RHCL1, 0.0)
    icltop = jnp.where(base, nl1, nlp).astype(jnp.int32)

    for k in range(3, kx - 1):  # 1-based 3..kx-2, running max of RH excess
        k0 = k - 1
        drh = rh[k0] - RHCL1
        hit = (drh > cloudc) & (qa[k0] > QACL)
        cloudc = jnp.where(hit, drh, cloudc)
        icltop = jnp.where(hit, k, icltop)

    pr1 = jnp.minimum(PMAXCL, 86.4 * (precnv + precls))
    cloudc = jnp.minimum(
        1.0, WPCL * jnp.sqrt(pr1) + jnp.minimum(1.0, cloudc * rrcl) ** 2)
    icltop = jnp.minimum(iptop, icltop)

    qcloud_equiv = qa[nl1 - 1]

    clfact = 1.2
    rgse = 1.0 / (GSE_S1 - GSE_S0)
    fstab = jnp.clip(rgse * (gse - GSE_S0), 0.0, 1.0)
    clstr = fstab * jnp.maximum(CLSMAX - clfact * cloudc, 0.0)
    clstrl = jnp.maximum(clstr, CLSMINL) * rh[kx - 1]
    clstr = clstr + fmask * (clstrl - clstr)
    return icltop, cloudc, clstr, qcloud_equiv


def solar_insolation(tyear, csol, coa, sia):
    """Hartmann (1994) daily-average TOA insolation by latitude
    (shortwave_radiation.f90:276-322)."""
    pigr = float(2.0 * np.arcsin(1.0))
    alpha = 2.0 * pigr * tyear
    ca1 = jnp.cos(alpha)
    sa1 = jnp.sin(alpha)
    ca2 = ca1 * ca1 - sa1 * sa1
    sa2 = 2.0 * sa1 * ca1
    ca3 = ca1 * ca2 - sa1 * sa2
    sa3 = sa1 * ca2 + sa2 * ca1

    decl = (0.006918 - 0.399912 * ca1 + 0.070257 * sa1 - 0.006758 * ca2
            + 0.000907 * sa2 - 0.002697 * ca3 + 0.001480 * sa3)
    fdis = (1.000110 + 0.034221 * ca1 + 0.001280 * sa1 + 0.000719 * ca2
            + 0.000077 * sa2)

    cdecl = jnp.cos(decl)
    sdecl = jnp.sin(decl)
    tdecl = sdecl / cdecl

    csolp = csol / pigr
    ch0 = jnp.clip(-tdecl * sia / coa, -1.0, 1.0)
    h0 = jnp.arccos(ch0)
    sh0 = jnp.sin(h0)
    return csolp * fdis * (h0 * sia * sdecl + sh0 * coa * cdecl)


def get_zonal_average_fields(geom, tyear):
    """Daily zonal-mean radiative forcing fields
    (shortwave_radiation.f90:218-273). Returns (flux_solar_in,
    flux_ozone_upper, flux_ozone_lower, zenit_correction,
    stratospheric_correction) as (il, ix)-broadcastable (il, 1) arrays."""
    coa = jnp.asarray(geom.coa)
    sia = jnp.asarray(geom.sia)

    alpha = float(4.0 * np.arcsin(1.0)) * (tyear + 10.0 / 365.0)
    coz1 = jnp.maximum(0.0, jnp.cos(alpha))
    coz2 = 1.8
    azen = 1.0
    nzen = 2
    rzen = -jnp.cos(alpha) * float(23.45 * np.arcsin(1.0) / 90.0)
    fs0 = 6.0

    topsr = solar_insolation(tyear, 4.0 * SOLC, coa, sia)
    flat2 = 1.5 * sia**2 - 0.5

    fsol = topsr
    ozupp = jnp.full_like(topsr, 0.5 * EPSSW)
    ozone = 0.4 * EPSSW * (1.0 + coz1 * sia + coz2 * flat2)
    zenit = 1.0 + azen * (1.0 - (coa * jnp.cos(rzen) + sia * jnp.sin(rzen))) ** nzen
    ozupp = fsol * ozupp * zenit
    ozone = fsol * ozone * zenit
    stratz = jnp.maximum(fs0 - fsol, 0.0)

    col = lambda x: x[:, None]
    return col(fsol), col(ozupp), col(ozone), col(zenit), col(stratz)


def get_shortwave_rad_fluxes(geom, state, psa, qa, icltop, cloudc, clstr):
    """Shortwave absorption sweeps + LW transmissivity initialization
    (shortwave_radiation.f90:50-214).

    Returns (tsr, ssrd, ssr, tt_rsw_flux, rad_tau2, rad_strat_corr); tt_rsw is
    the per-layer absorbed *flux*, scaled to a tendency by the caller.
    """
    kx = qa.shape[0]
    nl1 = kx - 1
    dhs, fsg = geom.dhs, geom.fsg
    fband2 = 0.05
    fband1 = 1.0 - fband2
    ones = jnp.ones_like(psa)

    # -- 1. cloud albedo slots (band index 2) --
    tau3 = [jnp.zeros_like(psa) for _ in range(kx)]
    for k in range(3, kx + 1):  # icltop can reach kx here
        tau3[k - 1] = jnp.where(icltop == k, ALBCL * cloudc, tau3[k - 1])
    tau3[kx - 1] = ALBCLS * clstr  # overwrites any cloud top at kx

    # -- 2. shortwave transmissivities --
    psaz = psa * state["zenit_correction"]
    acloud = cloudc * jnp.minimum(ABSCL1 * state["qcloud_equiv"], ABSCL2)

    tau1 = [None] * kx
    tau1[0] = jnp.exp(-psaz * dhs[0] * ABSDRY)
    for k in range(2, kx):  # 1-based 2..nl1
        k0 = k - 1
        abs1 = ABSDRY + ABSAER * fsg[k0] ** 2
        deltap = psaz * dhs[k0]
        tau1[k0] = jnp.where(
            k >= icltop,
            jnp.exp(-deltap * (abs1 + ABSWV1 * qa[k0] + acloud)),
            jnp.exp(-deltap * (abs1 + ABSWV1 * qa[k0])),
        )
    abs1 = ABSDRY + ABSAER * fsg[kx - 1] ** 2
    tau1[kx - 1] = jnp.exp(-psaz * dhs[kx - 1] * (abs1 + ABSWV1 * qa[kx - 1]))

    tau2b = [jnp.ones_like(psa)] + [
        jnp.exp(-psaz * dhs[k0] * ABSWV2 * qa[k0]) for k0 in range(1, kx)]

    # -- 3. downward flux sweeps --
    fsol = state["flux_solar_in"] * ones
    tsr = fsol
    flux1 = fsol * fband1
    flux2 = fsol * fband2

    tt = [None] * kx
    # stratosphere: ozone + dry-air absorption (3.2)
    tt[0] = flux1
    flux1 = tau1[0] * (flux1 - state["flux_ozone_upper"] * psa)
    tt[0] = tt[0] - flux1
    tt[1] = flux1
    flux1 = tau1[1] * (flux1 - state["flux_ozone_lower"] * psa)
    tt[1] = tt[1] - flux1

    # troposphere: absorption and cloud reflection (3.3)
    for k in range(3, kx + 1):
        k0 = k - 1
        tau3[k0] = flux1 * tau3[k0]
        flux1 = flux1 - tau3[k0]
        tt[k0] = flux1
        flux1 = tau1[k0] * flux1
        tt[k0] = tt[k0] - flux1

    # near-IR band (3.3 second loop)
    for k in range(2, kx + 1):
        k0 = k - 1
        tt[k0] = tt[k0] + flux2
        flux2 = tau2b[k0] * flux2
        tt[k0] = tt[k0] - flux2

    # -- 4. surface and upward sweep --
    ssrd = flux1 + flux2
    flux1 = flux1 * state["alb_surface"]
    ssr = ssrd - flux1

    for k0 in range(kx - 1, -1, -1):
        tt[k0] = tt[k0] + flux1
        flux1 = tau1[k0] * flux1
        tt[k0] = tt[k0] - flux1
        flux1 = flux1 + tau3[k0]

    tsr = tsr - flux1

    # -- 5. longwave transmissivity initialization (5.1) --
    lw1 = [None] * kx
    lw2 = [None] * kx
    lw3 = [None] * kx
    lw4 = [None] * kx
    ablco2 = state["air_absortivity_co2"]

    lw1[0] = jnp.exp(-psa * dhs[0] * ABLWIN)
    lw2[0] = jnp.exp(-psa * dhs[0] * ablco2)
    lw3[0] = ones
    lw4[0] = ones

    for k in (2, kx):  # 1-based: levels 2 and kx (cloud-free)
        k0 = k - 1
        lw1[k0] = jnp.exp(-psa * dhs[k0] * ABLWIN)
        lw2[k0] = jnp.exp(-psa * dhs[k0] * ablco2)
        lw3[k0] = jnp.exp(-psa * dhs[k0] * ABLWV1 * qa[k0])
        lw4[k0] = jnp.exp(-psa * dhs[k0] * ABLWV2 * qa[k0])

    acloud = cloudc * ABLCL2
    for k in range(3, kx):  # 1-based 3..nl1 (cloudy free troposphere)
        k0 = k - 1
        deltap = psa * dhs[k0]
        acloud1 = jnp.where(k < icltop, acloud, ABLCL1 * cloudc)
        lw1[k0] = jnp.exp(-deltap * (ABLWIN + acloud1))
        lw2[k0] = jnp.exp(-deltap * ablco2)
        lw3[k0] = jnp.exp(-deltap * jnp.maximum(ABLWV1 * qa[k0], acloud))
        lw4[k0] = jnp.exp(-deltap * jnp.maximum(ABLWV2 * qa[k0], acloud))

    rad_tau2 = jnp.stack([jnp.stack(b) for b in (lw1, lw2, lw3, lw4)])

    # -- 5.2 stratospheric correction --
    eps1 = pc.EPSLW / (dhs[0] + dhs[1])
    rad_strat_corr = jnp.stack(
        [state["stratospheric_correction"] * psa, eps1 * psa])

    tt_rsw = jnp.stack(tt)
    return tsr, ssrd, ssr, tt_rsw, rad_tau2, rad_strat_corr

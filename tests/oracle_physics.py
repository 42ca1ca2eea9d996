"""Scalar per-column physics oracle.

An independent, loop-based implementation of each column-physics scheme,
written directly from the reference's documented behavior
(speedy.f90/convection.f90, large_scale_condensation.f90,
shortwave_radiation.f90, longwave_radiation.f90, vertical_diffusion.f90,
surface_fluxes.f90). Used by tests/test_physics_oracle.py to cross-check the
vectorized JAX schemes one column at a time: the vectorized code uses masks
and level sweeps, this oracle uses plain Python control flow, so a masking or
indexing bug in either shows up as a mismatch.

Everything here is float64 numpy on single columns; k indices are 0-based.
"""

import numpy as np

CP = 1004.0
ALHC = 2501.0
GRAV = 9.81
P0 = 1.0e5
RGAS = (2.0 / 7.0) * CP
SBC = 5.67e-8
EPSLW = 0.05
EMISFC = 0.98


# --- convection ------------------------------------------------------------

def convection_column(psa, se, qa, qsat, fsg, dhs, wvi):
    """Returns (itop_1based, cbmf, precnv, dfse, dfqa)."""
    kx = len(se)
    psmin, trcnv, rhbl, rhil, entmax, smf = 0.8, 6.0, 0.9, 0.7, 0.5, 0.8
    fqmax = 5.0
    fm0 = P0 * dhs[kx - 1] / (GRAV * trcnv * 3600.0)
    rdps = 2.0 / (1.0 - psmin)

    dfse = np.zeros(kx)
    dfqa = np.zeros(kx)

    # diagnosis
    itop = kx + 1
    qdif = 0.0
    if psa > psmin:
        mse0 = se[kx - 1] + ALHC * qa[kx - 1]
        mse1 = min(mse0, se[kx - 2] + ALHC * qa[kx - 2])
        mss = se + ALHC * qsat
        mss0 = max(mse0, mss[kx - 1])
        ktop1 = kx
        ktop2 = kx
        msthr = 0.0
        for k1b in range(kx - 3, 2, -1):  # 1-based kx-3 .. 3
            k = k1b - 1
            mss2 = mss[k] + wvi[k, 1] * (mss[k + 1] - mss[k])
            if mss0 > mss2:
                ktop1 = k1b
            if mse1 > mss2:
                ktop2 = k1b
                msthr = mss2
        if ktop1 < kx:
            qthr0 = rhbl * qsat[kx - 1]
            qthr1 = rhbl * qsat[kx - 2]
            lqthr = qa[kx - 1] > qthr0 and qa[kx - 2] > qthr1
            if ktop2 < kx:
                itop = ktop1
                qdif = max(qa[kx - 1] - qthr0, (mse0 - msthr) / ALHC)
            elif lqthr:
                itop = ktop1
                qdif = qa[kx - 1] - qthr0

    if itop == kx + 1:
        return itop, 0.0, 0.0, dfse, dfqa

    # entrainment profile
    entr = np.zeros(kx)
    raw = np.maximum(0.0, fsg[1:kx - 1] - 0.5) ** 2
    entr[1:kx - 1] = 0.5 * raw / raw.sum()

    # cloud base
    k = kx - 1
    qmax = max(1.01 * qa[k], qsat[k])
    sb = se[k - 1] + wvi[k - 1, 1] * (se[k] - se[k - 1])
    qb = min(qa[k - 1] + wvi[k - 1, 1] * (qa[k] - qa[k - 1]), qa[k])
    fpsa = psa * min(1.0, (psa - psmin) * rdps)
    fmass = fm0 * fpsa * min(fqmax, qdif / (qmax - qb))
    cbmf = fmass
    fus = fmass * se[k]
    fuq = fmass * qmax
    fds = fmass * sb
    fdq = fmass * qb
    dfse[k] = fds - fus
    dfqa[k] = fdq - fuq

    # intermediate layers k1b = kx-1 .. itop+1
    for k1b in range(kx - 1, itop, -1):
        k = k1b - 1
        dfse[k] = fus - fds
        dfqa[k] = fuq - fdq
        enmass = entr[k] * psa * cbmf
        fmass += enmass
        fus += enmass * se[k]
        fuq += enmass * qa[k]
        sb = se[k - 1] + wvi[k - 1, 1] * (se[k] - se[k - 1])
        qb = qa[k - 1] + wvi[k - 1, 1] * (qa[k] - qa[k - 1])
        fds = fmass * sb
        fdq = fmass * qb
        dfse[k] += fds - fus
        dfqa[k] += fdq - fuq
        delq = rhil * qsat[k] - qa[k]
        if delq > 0.0:
            fsq = smf * cbmf * delq
            dfqa[k] += fsq
            dfqa[kx - 1] -= fsq

    # top layer
    k = itop - 1
    qsatb = qsat[k] + wvi[k, 1] * (qsat[k + 1] - qsat[k])
    precnv = max(fuq - fmass * qsatb, 0.0)
    dfse[k] = fus - fds + ALHC * precnv
    dfqa[k] = fuq - fdq - precnv
    return itop, cbmf, precnv, dfse, dfqa


# --- large-scale condensation ---------------------------------------------

def lsc_column(psa, qa, qsat, itop, fsg, dhs):
    kx = len(qa)
    trlsc, rhlsc, drhlsc, rhblsc = 4.0, 0.9, 0.1, 0.95
    qsmax = 10.0
    rtlsc = 1.0 / (trlsc * 3600.0)
    tfact = ALHC / CP
    prg = P0 / GRAV

    dtlsc = np.zeros(kx)
    dqlsc = np.zeros(kx)
    psa2 = psa**2
    for k1b in range(2, kx + 1):
        k = k1b - 1
        sig2 = fsg[k] ** 2
        rhref = rhlsc + drhlsc * (sig2 - 1.0)
        if k1b == kx:
            rhref = max(rhref, rhblsc)
        dqmax = qsmax * sig2 * rtlsc
        dqa = rhref * qsat[k] - qa[k]
        if dqa < 0.0:
            itop = min(k1b, itop)
            dqlsc[k] = dqa * rtlsc
            dtlsc[k] = tfact * min(-dqlsc[k], dqmax * psa2)
    precls = 0.0
    for k1b in range(2, kx + 1):
        precls -= dhs[k1b - 1] * prg * dqlsc[k1b - 1]
    return itop, precls * psa, dtlsc, dqlsc


# --- clouds ----------------------------------------------------------------

def clouds_column(qa, rh, precnv, precls, iptop, gse, fmask):
    kx = len(qa)
    rhcl1, rhcl2, qacl = 0.30, 1.00, 0.20
    wpcl, pmaxcl = 0.2, 10.0
    clsmax, clsminl = 0.60, 0.15
    gse_s0, gse_s1 = 0.25, 0.40
    rrcl = 1.0 / (rhcl2 - rhcl1)

    if rh[kx - 2] > rhcl1:
        cloudc = rh[kx - 2] - rhcl1
        icltop = kx - 1
    else:
        cloudc = 0.0
        icltop = kx + 1
    for k1b in range(3, kx - 1):
        k = k1b - 1
        drh = rh[k] - rhcl1
        if drh > cloudc and qa[k] > qacl:
            cloudc = drh
            icltop = k1b
    pr1 = min(pmaxcl, 86.4 * (precnv + precls))
    cloudc = min(1.0, wpcl * np.sqrt(pr1) + min(1.0, cloudc * rrcl) ** 2)
    icltop = min(iptop, icltop)

    qcloud = qa[kx - 2]
    clfact = 1.2
    rgse = 1.0 / (gse_s1 - gse_s0)
    fstab = max(0.0, min(1.0, rgse * (gse - gse_s0)))
    clstr = fstab * max(clsmax - clfact * cloudc, 0.0)
    clstrl = max(clstr, clsminl) * rh[kx - 1]
    clstr = clstr + fmask * (clstrl - clstr)
    return icltop, cloudc, clstr, qcloud


# --- shortwave -------------------------------------------------------------

def shortwave_column(psa, qa, icltop, cloudc, clstr, fsol, ozupp, ozone,
                     zenit, stratz, albsfc, qcloud, ablco2, fsg, dhs):
    kx = len(qa)
    absdry, absaer, abswv1, abswv2 = 0.033, 0.033, 0.022, 15.0
    abscl1, abscl2 = 0.015, 0.15
    albcl, albcls = 0.43, 0.50
    ablwin, ablwv1, ablwv2, ablcl1, ablcl2 = 0.3, 0.7, 50.0, 12.0, 0.6
    fband2 = 0.05
    fband1 = 1.0 - fband2

    tau2 = np.zeros((kx, 4))
    if icltop <= kx:
        tau2[icltop - 1, 2] = albcl * cloudc
    tau2[kx - 1, 2] = albcls * clstr

    psaz = psa * zenit
    acloud = cloudc * min(abscl1 * qcloud, abscl2)
    tau2[0, 0] = np.exp(-psaz * dhs[0] * absdry)
    for k1b in range(2, kx):
        k = k1b - 1
        abs1 = absdry + absaer * fsg[k] ** 2
        if k1b >= icltop:
            tau2[k, 0] = np.exp(-psaz * dhs[k] * (abs1 + abswv1 * qa[k] + acloud))
        else:
            tau2[k, 0] = np.exp(-psaz * dhs[k] * (abs1 + abswv1 * qa[k]))
    abs1 = absdry + absaer * fsg[kx - 1] ** 2
    tau2[kx - 1, 0] = np.exp(-psaz * dhs[kx - 1] * (abs1 + abswv1 * qa[kx - 1]))
    for k1b in range(2, kx + 1):
        k = k1b - 1
        tau2[k, 1] = np.exp(-psaz * dhs[k] * abswv2 * qa[k])

    tsr = fsol
    flux1 = fsol * fband1
    flux2 = fsol * fband2
    tt = np.zeros(kx)

    tt[0] = flux1
    flux1 = tau2[0, 0] * (flux1 - ozupp * psa)
    tt[0] -= flux1
    tt[1] = flux1
    flux1 = tau2[1, 0] * (flux1 - ozone * psa)
    tt[1] -= flux1

    for k1b in range(3, kx + 1):
        k = k1b - 1
        tau2[k, 2] = flux1 * tau2[k, 2]
        flux1 -= tau2[k, 2]
        tt[k] = flux1
        flux1 = tau2[k, 0] * flux1
        tt[k] -= flux1

    for k1b in range(2, kx + 1):
        k = k1b - 1
        tt[k] += flux2
        flux2 = tau2[k, 1] * flux2
        tt[k] -= flux2

    ssrd = flux1 + flux2
    flux1 = flux1 * albsfc
    ssr = ssrd - flux1

    for k in range(kx - 1, -1, -1):
        tt[k] += flux1
        flux1 = tau2[k, 0] * flux1
        tt[k] -= flux1
        flux1 += tau2[k, 2]
    tsr -= flux1

    # longwave transmissivity init
    lw = np.zeros((4, kx))
    lw[0, 0] = np.exp(-psa * dhs[0] * ablwin)
    lw[1, 0] = np.exp(-psa * dhs[0] * ablco2)
    lw[2, 0] = 1.0
    lw[3, 0] = 1.0
    for k1b in (2, kx):
        k = k1b - 1
        lw[0, k] = np.exp(-psa * dhs[k] * ablwin)
        lw[1, k] = np.exp(-psa * dhs[k] * ablco2)
        lw[2, k] = np.exp(-psa * dhs[k] * ablwv1 * qa[k])
        lw[3, k] = np.exp(-psa * dhs[k] * ablwv2 * qa[k])
    acloud = cloudc * ablcl2
    for k1b in range(3, kx):
        k = k1b - 1
        deltap = psa * dhs[k]
        acl1 = acloud if k1b < icltop else ablcl1 * cloudc
        lw[0, k] = np.exp(-deltap * (ablwin + acl1))
        lw[1, k] = np.exp(-deltap * ablco2)
        lw[2, k] = np.exp(-deltap * max(ablwv1 * qa[k], acloud))
        lw[3, k] = np.exp(-deltap * max(ablwv2 * qa[k], acloud))

    eps1 = EPSLW / (dhs[0] + dhs[1])
    strat_corr = np.array([stratz * psa, eps1 * psa])
    return tsr, ssrd, ssr, tt, lw, strat_corr


# --- longwave --------------------------------------------------------------

def longwave_down_column(ta, fband, lw_tau, wvi):
    kx = len(ta)
    nl1 = kx - 1
    st4a = np.zeros((kx, 2))
    for k in range(nl1):
        st4a[k, 0] = ta[k] + wvi[k, 1] * (ta[k + 1] - ta[k])
    tb = st4a[:, 0].copy()
    st4a[0, 1] = 0.75 * ta[0] + 0.25 * tb[0]
    st4a[1, 1] = 0.50 * ta[1] + 0.25 * (tb[0] + tb[1])
    for k in range(2, nl1):
        st4a[k, 1] = 0.5 * max(tb[k] - tb[k - 1], 0.0)
    st4a[kx - 1, 1] = max(ta[kx - 1] - tb[nl1 - 1], 0.0)

    for k in range(2):
        st4a[k, 0] = SBC * st4a[k, 1] ** 4
        st4a[k, 1] = 0.0
    for k in range(2, kx):
        st3a = SBC * ta[k] ** 3
        st4a[k, 0] = st3a * ta[k]
        st4a[k, 1] = 4.0 * st3a * st4a[k, 1]

    dfabs = np.zeros(kx)
    flux = np.zeros(4)
    for jb in range(2):
        emis = 1.0 - lw_tau[jb, 0]
        brad = fband[int(np.floor(ta[0] + 0.5)) - 100, jb] \
            * (st4a[0, 0] + emis * st4a[0, 1])
        flux[jb] = emis * brad
        dfabs[0] -= flux[jb]

    for jb in range(4):
        for k in range(1, kx):
            emis = 1.0 - lw_tau[jb, k]
            brad = fband[int(np.floor(ta[k] + 0.5)) - 100, jb] \
                * (st4a[k, 0] + emis * st4a[k, 1])
            dfabs[k] += flux[jb]
            flux[jb] = lw_tau[jb, k] * flux[jb] + emis * brad
            dfabs[k] -= flux[jb]

    fsfcd = EMISFC * flux.sum()
    corlw = EPSLW * EMISFC * st4a[kx - 1, 0]
    dfabs[kx - 1] -= corlw
    fsfcd += corlw
    return fsfcd, dfabs, flux, st4a


def longwave_up_column(ta, ts, fsfcd, fsfcu, dfabs, flux, st4a, lw_tau,
                       strat_corr, fband, dhs):
    kx = len(ta)
    refsfc = 1.0 - EMISFC
    fsfc = fsfcu - fsfcd
    dfabs = dfabs.copy()
    flux = flux.copy()
    for jb in range(4):
        flux[jb] = fband[int(np.floor(ts + 0.5)) - 100, jb] * fsfcu \
            + refsfc * flux[jb]
    dfabs[kx - 1] += EPSLW * fsfcu
    for jb in range(4):
        for k in range(kx - 1, 0, -1):
            emis = 1.0 - lw_tau[jb, k]
            brad = fband[int(np.floor(ta[k] + 0.5)) - 100, jb] \
                * (st4a[k, 0] - emis * st4a[k, 1])
            dfabs[k] += flux[jb]
            flux[jb] = lw_tau[jb, k] * flux[jb] + emis * brad
            dfabs[k] -= flux[jb]
    for jb in range(2):
        emis = 1.0 - lw_tau[jb, 0]
        brad = fband[int(np.floor(ta[0] + 0.5)) - 100, jb] \
            * (st4a[0, 0] - emis * st4a[0, 1])
        dfabs[0] += flux[jb]
        flux[jb] = lw_tau[jb, 0] * flux[jb] + emis * brad
        dfabs[0] -= flux[jb]
    corlw1 = dhs[0] * strat_corr[1] * st4a[0, 0] + strat_corr[0]
    corlw2 = dhs[1] * strat_corr[1] * st4a[1, 0]
    dfabs[0] -= corlw1
    dfabs[1] -= corlw2
    ftop = corlw1 + corlw2 + flux.sum()
    return fsfc, ftop, dfabs


# --- vertical diffusion ----------------------------------------------------

def vdiff_column(se, rh, qa, qsat, phi, icnv, fsg, dhs, sigh):
    kx = len(se)
    nl1 = kx - 1
    trshc, trvdi, trvds = 6.0, 24.0, 6.0
    redshc, rhgrad, segrad = 0.5, 0.5, 0.1

    cshc = dhs[kx - 1] / 3600.0
    cvdi = (sigh[nl1] - sigh[1]) / ((nl1 - 1) * 3600.0)
    fshcq = cshc / trshc
    fshcse = cshc / (trshc * CP)
    fvdiq = cvdi / trvdi
    fvdise = cvdi / (trvds * CP)
    rsig = 1.0 / dhs
    rsig1 = np.array([1.0 / (1.0 - sigh[k]) for k in range(1, kx)])

    tt = np.zeros(kx)
    qt = np.zeros(kx)

    drh0 = rhgrad * (fsg[kx - 1] - fsg[nl1 - 1])
    fvdiq2 = fvdiq * sigh[nl1]
    dmse = se[kx - 1] - se[nl1 - 1] + ALHC * (qa[kx - 1] - qsat[nl1 - 1])
    drh = rh[kx - 1] - rh[nl1 - 1]
    fcnv = redshc if icnv > 0 else 1.0
    if dmse >= 0.0:
        fluxse = fcnv * fshcse * dmse
        tt[nl1 - 1] = fluxse * rsig[nl1 - 1]
        tt[kx - 1] = -fluxse * rsig[kx - 1]
        if drh >= 0.0:
            fluxq = fcnv * fshcq * qsat[kx - 1] * drh
            qt[nl1 - 1] = fluxq * rsig[nl1 - 1]
            qt[kx - 1] = -fluxq * rsig[kx - 1]
    elif drh > drh0:
        fluxq = fvdiq2 * qsat[nl1 - 1] * drh
        qt[nl1 - 1] = fluxq * rsig[nl1 - 1]
        qt[kx - 1] = -fluxq * rsig[kx - 1]

    for k1b in range(3, kx - 1):
        k = k1b - 1
        if sigh[k1b] > 0.5:
            drh0k = rhgrad * (fsg[k + 1] - fsg[k])
            fv2 = fvdiq * sigh[k1b]
            drhk = rh[k + 1] - rh[k]
            if drhk >= drh0k:
                fq = fv2 * qsat[k] * drhk
                qt[k] += fq * rsig[k]
                qt[k + 1] -= fq * rsig[k + 1]

    for k1b in range(1, kx):
        k = k1b - 1
        se0 = se[k + 1] + segrad * (phi[k] - phi[k + 1])
        if se[k] < se0:
            fse = fvdise * (se0 - se[k])
            tt[k] += fse * rsig[k]
            for k2 in range(k + 1, kx):
                tt[k2] -= fse * rsig1[k]
    return tt, qt

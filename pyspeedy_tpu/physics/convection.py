"""Simplified Tiedtke mass-flux convection (reference:
speedy.f90/convection.f90).

The reference's per-column downward loop with data-dependent cloud top
becomes a statically-unrolled level sweep with per-column masks — every
operation stays elementwise over the (il, ix) grid, so the whole scheme fuses
into one XLA kernel.  Level indices in the integer fields (itop) follow the
reference's 1-based convention: itop = kx+1 means "no convection".
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as pc

__all__ = ["get_convection_tendencies", "diagnose_convection"]

PSMIN = 0.8    # minimum normalized surface pressure for convection
TRCNV = 6.0    # relaxation time [h]
RHBL = 0.9     # boundary-layer RH threshold
RHIL = 0.7     # intermediate-layer RH threshold (secondary flux)
ENTMAX = 0.5   # maximum entrainment fraction
SMF = 0.8      # secondary/primary cloud-base mass-flux ratio


def diagnose_convection(geom, psa, se, qa, qsat):
    """Conditional-instability / RH-threshold diagnosis
    (convection.f90:170-253). Returns (itop [1-based int], qdif)."""
    kx = se.shape[0]
    nl1 = kx - 1
    nlp = kx + 1
    wvi = geom.wvi

    # Saturation moist static energy (levels 2..kx 1-based; index 0 unused)
    mss = se + pc.ALHC * qsat

    rlhc = 1.0 / pc.ALHC
    mse0 = se[kx - 1] + pc.ALHC * qa[kx - 1]
    mse1 = jnp.minimum(mse0, se[nl1 - 1] + pc.ALHC * qa[nl1 - 1])
    mss0 = jnp.maximum(mse0, mss[kx - 1])

    ktop1 = jnp.full_like(psa, kx)
    ktop2 = jnp.full_like(psa, kx)
    msthr = jnp.zeros_like(psa)

    # Descending sweep k = kx-3 .. 3 (1-based); the last (smallest-k) hit wins.
    for k in range(kx - 3, 2, -1):
        k0 = k - 1
        mss2 = mss[k0] + wvi[k0, 1] * (mss[k0 + 1] - mss[k0])
        hit1 = mss0 > mss2
        ktop1 = jnp.where(hit1, k, ktop1)
        hit2 = mse1 > mss2
        ktop2 = jnp.where(hit2, k, ktop2)
        msthr = jnp.where(hit2, mss2, msthr)

    qthr0 = RHBL * qsat[kx - 1]
    qthr1 = RHBL * qsat[nl1 - 1]
    lqthr = (qa[kx - 1] > qthr0) & (qa[nl1 - 1] > qthr1)

    candidate = (psa > PSMIN) & (ktop1 < kx)
    deep = candidate & (ktop2 < kx)
    shallow = candidate & (ktop2 >= kx) & lqthr

    itop = jnp.where(deep | shallow, ktop1, nlp).astype(jnp.int32)
    qdif = jnp.where(
        deep,
        jnp.maximum(qa[kx - 1] - qthr0, (mse0 - msthr) * rlhc),
        jnp.where(shallow, qa[kx - 1] - qthr0, 0.0),
    )
    return itop, qdif


def get_convection_tendencies(geom, psa, se, qa, qsat):
    """Convective fluxes of dry static energy and moisture
    (convection.f90:27-158).

    Returns (itop, cbmf, precnv, dfse, dfqa); dfse/dfqa are the *fluxes* to
    be scaled by rps*grdscp/grdsig in the physics driver (physics.f90:127-130).
    """
    kx = se.shape[0]
    fsg, dhs, wvi = geom.fsg, geom.dhs, geom.wvi
    fqmax = 5.0
    fm0 = pc.P0 * dhs[kx - 1] / (pc.GRAV * TRCNV * 3600.0)
    rdps = 2.0 / (1.0 - PSMIN)

    # Entrainment profile (convection.f90:62-70), 1-based k = 2..kx-1.
    entr_raw = jnp.maximum(0.0, fsg[1:kx - 1] - 0.5) ** 2
    entr = jnp.zeros(kx, dtype=psa.dtype).at[1:kx - 1].set(
        (ENTMAX * entr_raw / jnp.sum(entr_raw)).astype(psa.dtype))

    itop, qdif = diagnose_convection(geom, psa, se, qa, qsat)
    active = itop <= kx

    dfse = [jnp.zeros_like(psa) for _ in range(kx)]
    dfqa = [jnp.zeros_like(psa) for _ in range(kx)]

    # --- cloud-base (boundary) layer, k = kx (convection.f90:80-108) ---
    k0 = kx - 1
    qmax = jnp.maximum(1.01 * qa[k0], qsat[k0])
    sb = se[k0 - 1] + wvi[k0 - 1, 1] * (se[k0] - se[k0 - 1])
    qb = jnp.minimum(qa[k0 - 1] + wvi[k0 - 1, 1] * (qa[k0] - qa[k0 - 1]), qa[k0])
    fpsa = psa * jnp.minimum(1.0, (psa - PSMIN) * rdps)
    fmass0 = fm0 * fpsa * jnp.minimum(fqmax, qdif / (qmax - qb))
    cbmf = jnp.where(active, fmass0, 0.0)

    fmass = cbmf
    fus = jnp.where(active, fmass * se[k0], 0.0)
    fuq = jnp.where(active, fmass * qmax, 0.0)
    fds = jnp.where(active, fmass * sb, 0.0)
    fdq = jnp.where(active, fmass * qb, 0.0)
    dfse[k0] = jnp.where(active, fds - fus, 0.0)
    dfqa[k0] = jnp.where(active, fdq - fuq, 0.0)

    # --- intermediate layers, k = kx-1 .. itop+1 (convection.f90:110-143) ---
    for k in range(kx - 1, 2, -1):  # 1-based; active only where k > itop
        k0 = k - 1
        m = active & (k > itop)
        dfse[k0] = jnp.where(m, fus - fds, dfse[k0])
        dfqa[k0] = jnp.where(m, fuq - fdq, dfqa[k0])

        enmass = entr[k0] * psa * cbmf
        fmass = jnp.where(m, fmass + enmass, fmass)
        fus = jnp.where(m, fus + enmass * se[k0], fus)
        fuq = jnp.where(m, fuq + enmass * qa[k0], fuq)

        sb = se[k0 - 1] + wvi[k0 - 1, 1] * (se[k0] - se[k0 - 1])
        qb = qa[k0 - 1] + wvi[k0 - 1, 1] * (qa[k0] - qa[k0 - 1])
        fds = jnp.where(m, fmass * sb, fds)
        fdq = jnp.where(m, fmass * qb, fdq)
        dfse[k0] = jnp.where(m, dfse[k0] + fds - fus, dfse[k0])
        dfqa[k0] = jnp.where(m, dfqa[k0] + fdq - fuq, dfqa[k0])

        delq = RHIL * qsat[k0] - qa[k0]
        fsq = SMF * cbmf * delq
        msec = m & (delq > 0.0)
        dfqa[k0] = jnp.where(msec, dfqa[k0] + fsq, dfqa[k0])
        dfqa[kx - 1] = jnp.where(msec, dfqa[kx - 1] - fsq, dfqa[kx - 1])

    # --- top layer: condensation and detrainment (convection.f90:145-155) ---
    precnv = jnp.zeros_like(psa)
    for k in range(3, kx):  # possible itop values 3..kx-1 (1-based)
        k0 = k - 1
        m = active & (itop == k)
        qsatb = qsat[k0] + wvi[k0, 1] * (qsat[k0 + 1] - qsat[k0])
        pr = jnp.maximum(fuq - fmass * qsatb, 0.0)
        precnv = jnp.where(m, pr, precnv)
        dfse[k0] = jnp.where(m, fus - fds + pc.ALHC * pr, dfse[k0])
        dfqa[k0] = jnp.where(m, fuq - fdq - pr, dfqa[k0])

    return itop, cbmf, precnv, jnp.stack(dfse), jnp.stack(dfqa)

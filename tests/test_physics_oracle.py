"""Cross-check the vectorized physics schemes against the scalar per-column
oracle (tests/oracle_physics.py) on random but physically plausible columns.
The two implementations use different control-flow styles (masked level
sweeps vs plain Python loops), so a masking or index error in either one
shows up as a mismatch."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle_physics as orc
from pyspeedy_tpu.ops.geometry import build_geometry
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.physics import convection as conv
from pyspeedy_tpu.physics import large_scale_condensation as lsc
from pyspeedy_tpu.physics import longwave_radiation as lw
from pyspeedy_tpu.physics import shortwave_radiation as sw
from pyspeedy_tpu.physics import vertical_diffusion as vdif
from pyspeedy_tpu.physics.humidity import get_qsat

GEOM = build_geometry(T30L8)
KX = 8
N = 96  # columns per test, packed on a (1, N) pseudo-grid


def random_columns(seed):
    """Plausible atmospheric columns: T profile with lapse rate + noise,
    humidity decaying upward, surface pressure around 1."""
    rng = np.random.default_rng(seed)
    psa = 0.7 + 0.35 * rng.random(N)
    t_sfc = 260.0 + 40.0 * rng.random(N)
    ta = np.zeros((KX, N))
    for k in range(KX):
        ta[k] = t_sfc - 60.0 * (1.0 - GEOM.fsg[k]) + rng.normal(0, 3.0, N)
    ta = np.clip(ta, 180.0, 330.0)
    qsat = np.zeros((KX, N))
    for k in range(KX):
        qsat[k] = np.asarray(get_qsat(jnp.asarray(ta[k][None]),
                                      jnp.asarray(psa[None]),
                                      float(GEOM.fsg[k])))[0]
    rh = np.clip(0.15 + 0.9 * rng.random((KX, N)), 0.0, 1.1)
    # Moist boundary layer in half the columns so deep convection triggers
    moist = rng.random(N) < 0.5
    rh[KX - 1] = np.where(moist, 0.88 + 0.2 * rng.random(N), rh[KX - 1])
    rh[KX - 2] = np.where(moist, 0.88 + 0.2 * rng.random(N), rh[KX - 2])
    qa = rh * qsat
    phi = np.zeros((KX, N))
    phi[KX - 1] = orc.RGAS * ta[KX - 1] * 0.05
    for k in range(KX - 2, -1, -1):
        phi[k] = phi[k + 1] + orc.RGAS * 0.5 * (ta[k] + ta[k + 1]) \
            * np.log(GEOM.fsg[k + 1] / GEOM.fsg[k])
    se = orc.CP * ta + phi
    return psa, ta, qa, qsat, rh, se, phi


def to_grid(x):
    """(.., N) -> (.., 1, N) pseudo lat/lon grid for the vectorized code."""
    return jnp.asarray(x[..., None, :])


def test_convection_matches_oracle():
    psa, ta, qa, qsat, rh, se, phi = random_columns(0)
    itop_v, cbmf_v, pr_v, dfse_v, dfqa_v = conv.get_convection_tendencies(
        GEOM, to_grid(psa), to_grid(se), to_grid(qa), to_grid(qsat))
    n_active = 0
    for i in range(N):
        itop, cbmf, pr, dfse, dfqa = orc.convection_column(
            psa[i], se[:, i], qa[:, i], qsat[:, i], GEOM.fsg, GEOM.dhs,
            GEOM.wvi)
        n_active += itop <= KX
        assert int(itop_v[0, i]) == itop, f"col {i} itop"
        np.testing.assert_allclose(float(cbmf_v[0, i]), cbmf, rtol=1e-12,
                                   err_msg=f"col {i} cbmf")
        np.testing.assert_allclose(float(pr_v[0, i]), pr, rtol=1e-12,
                                   atol=1e-15, err_msg=f"col {i} precnv")
        np.testing.assert_allclose(np.asarray(dfse_v[:, 0, i]), dfse,
                                   rtol=1e-11, atol=1e-12,
                                   err_msg=f"col {i} dfse")
        np.testing.assert_allclose(np.asarray(dfqa_v[:, 0, i]), dfqa,
                                   rtol=1e-11, atol=1e-12,
                                   err_msg=f"col {i} dfqa")
    assert n_active > 5, "test columns too tame: convection never triggers"


def test_lsc_matches_oracle():
    psa, ta, qa, qsat, rh, se, phi = random_columns(1)
    itop0 = np.full(N, KX + 1, dtype=np.int32)
    itop_v, precls_v, dt_v, dq_v = lsc.get_large_scale_condensation_tendencies(
        GEOM, to_grid(psa), to_grid(qa), to_grid(qsat),
        jnp.asarray(itop0[None, :]))
    for i in range(N):
        itop, precls, dtl, dql = orc.lsc_column(
            psa[i], qa[:, i], qsat[:, i], KX + 1, GEOM.fsg, GEOM.dhs)
        assert int(itop_v[0, i]) == itop
        np.testing.assert_allclose(float(precls_v[0, i]), precls, rtol=1e-11,
                                   atol=1e-16)
        np.testing.assert_allclose(np.asarray(dt_v[:, 0, i]), dtl, rtol=1e-11,
                                   atol=1e-18)
        np.testing.assert_allclose(np.asarray(dq_v[:, 0, i]), dql, rtol=1e-11,
                                   atol=1e-18)


def test_clouds_and_shortwave_match_oracle():
    psa, ta, qa, qsat, rh, se, phi = random_columns(2)
    rng = np.random.default_rng(22)
    precnv = np.where(rng.random(N) < 0.5, rng.random(N) * 2e-2, 0.0)
    precls = rng.random(N) * 1e-2
    iptop = rng.integers(3, KX + 2, N).astype(np.int32)
    gse = 0.1 + 0.4 * rng.random(N)
    fmask = rng.random(N)

    icl_v, cc_v, cs_v, qc_v = sw.clouds(
        to_grid(qa), to_grid(rh), to_grid(precnv), to_grid(precls),
        jnp.asarray(iptop[None, :]), to_grid(gse), to_grid(fmask))

    fsol = 300.0 * rng.random(N)
    ozupp = 3.0 * rng.random(N)
    ozone = 3.0 * rng.random(N)
    zenit = 1.0 + rng.random(N)
    stratz = 5.0 * rng.random(N)
    albsfc = 0.1 + 0.5 * rng.random(N)
    state = {
        "zenit_correction": to_grid(zenit),
        "qcloud_equiv": qc_v,
        "flux_solar_in": to_grid(fsol),
        "flux_ozone_upper": to_grid(ozupp),
        "flux_ozone_lower": to_grid(ozone),
        "alb_surface": to_grid(albsfc),
        "air_absortivity_co2": jnp.asarray(6.0),
        "stratospheric_correction": to_grid(stratz),
    }
    tsr_v, ssrd_v, ssr_v, tt_v, tau_v, rsc_v = sw.get_shortwave_rad_fluxes(
        GEOM, state, to_grid(psa), to_grid(qa), icl_v, cc_v, cs_v)

    for i in range(0, N, 7):
        icl, cc, cs, qc = orc.clouds_column(
            qa[:, i], rh[:, i], precnv[i], precls[i], int(iptop[i]),
            gse[i], fmask[i])
        assert int(icl_v[0, i]) == icl, f"col {i} icltop"
        np.testing.assert_allclose(float(cc_v[0, i]), cc, rtol=1e-12)
        np.testing.assert_allclose(float(cs_v[0, i]), cs, rtol=1e-12)

        tsr, ssrd, ssr, tt, lw_tau, rsc = orc.shortwave_column(
            psa[i], qa[:, i], icl, cc, cs, fsol[i], ozupp[i], ozone[i],
            zenit[i], stratz[i], albsfc[i], qc, 6.0, GEOM.fsg, GEOM.dhs)
        np.testing.assert_allclose(float(tsr_v[0, i]), tsr, rtol=1e-11)
        np.testing.assert_allclose(float(ssrd_v[0, i]), ssrd, rtol=1e-11)
        np.testing.assert_allclose(float(ssr_v[0, i]), ssr, rtol=1e-11)
        np.testing.assert_allclose(np.asarray(tt_v[:, 0, i]), tt, rtol=1e-10,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(tau_v[:, :, 0, i]), lw_tau,
                                   rtol=1e-11)
        np.testing.assert_allclose(np.asarray(rsc_v[:, 0, i]), rsc,
                                   rtol=1e-11)


def test_longwave_matches_oracle():
    psa, ta, qa, qsat, rh, se, phi = random_columns(3)
    rng = np.random.default_rng(33)
    fband = lw.radset()
    # plausible transmissivities
    lw_tau = 0.3 + 0.7 * rng.random((4, KX, 1, N))
    strat_corr = np.abs(rng.random((2, 1, N)))
    ts = ta[KX - 1] + rng.normal(0, 5, N)
    fsfcu = orc.EMISFC * orc.SBC * ts**4

    fsfcd_v, dfabs_v, flux_v, st4a_v = lw.get_downward_longwave_rad_fluxes(
        GEOM, jnp.asarray(fband), jnp.asarray(lw_tau), to_grid(ta))
    fsfc_v, ftop_v, dfup_v = lw.get_upward_longwave_rad_fluxes(
        GEOM, jnp.asarray(fband), jnp.asarray(lw_tau), st4a_v,
        jnp.asarray(strat_corr), to_grid(ta), to_grid(ts), fsfcd_v,
        to_grid(fsfcu), dfabs_v, flux_v)

    for i in range(0, N, 11):
        fsfcd, dfabs, flux, st4a = orc.longwave_down_column(
            ta[:, i], fband, lw_tau[:, :, 0, i], GEOM.wvi)
        np.testing.assert_allclose(float(fsfcd_v[0, i]), fsfcd, rtol=1e-11)
        np.testing.assert_allclose(np.asarray(dfabs_v[:, 0, i]), dfabs,
                                   rtol=1e-10, atol=1e-10)
        fsfc, ftop, dfup = orc.longwave_up_column(
            ta[:, i], ts[i], fsfcd, fsfcu[i], dfabs, flux, st4a,
            lw_tau[:, :, 0, i], strat_corr[:, 0, i], fband, GEOM.dhs)
        np.testing.assert_allclose(float(fsfc_v[0, i]), fsfc, rtol=1e-11)
        np.testing.assert_allclose(float(ftop_v[0, i]), ftop, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(dfup_v[:, 0, i]), dfup,
                                   rtol=1e-10, atol=1e-10)


def test_vertical_diffusion_matches_oracle():
    psa, ta, qa, qsat, rh, se, phi = random_columns(4)
    rng = np.random.default_rng(44)
    icnv = rng.integers(-1, 6, N).astype(np.int32)
    ut_v, vt_v, tt_v, qt_v = vdif.get_vertical_diffusion_tend(
        GEOM, to_grid(se), to_grid(rh), to_grid(qa), to_grid(qsat),
        to_grid(phi), jnp.asarray(icnv[None, :]))
    for i in range(N):
        tt, qt = orc.vdiff_column(se[:, i], rh[:, i], qa[:, i], qsat[:, i],
                                  phi[:, i], int(icnv[i]), GEOM.fsg,
                                  GEOM.dhs, GEOM.sigh)
        np.testing.assert_allclose(np.asarray(tt_v[:, 0, i]), tt, rtol=1e-11,
                                   atol=1e-16, err_msg=f"col {i} tt")
        np.testing.assert_allclose(np.asarray(qt_v[:, 0, i]), qt, rtol=1e-11,
                                   atol=1e-16, err_msg=f"col {i} qt")

"""Column-physics driver (reference: speedy.f90/physics.f90).

Sequencing matches physics.f90:14-256: convection -> large-scale condensation
-> shortwave (every nstrad steps, via lax.cond, with absorbed fluxes and LW
transmissivities cached in the state) -> longwave down -> surface fluxes ->
longwave up -> vertical diffusion -> surface-flux tendencies -> SPPT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as pc
from ..ops import spectral as S
from . import convection as conv
from . import large_scale_condensation as lsc
from . import longwave_radiation as lw
from . import shortwave_radiation as sw
from . import surface_fluxes as sflx
from . import vertical_diffusion as vdif
from .humidity import spec_hum_to_rel_hum
from .sppt import gen_sppt

__all__ = ["get_physical_tendencies"]


def get_physical_tendencies(consts, state, ctx, utend, vtend, ttend, trtend):
    """Add physics tendencies at time level 0 (physics.f90:14-256).

    ctx["compute_shortwave"] is a traced bool selecting the cached-vs-fresh
    shortwave branch. Returns (utend, vtend, ttend, trtend, state).
    """
    sp = consts.sp
    geom = consts.geom
    params = consts.params
    kx = params.kx

    utend_dyn, vtend_dyn, ttend_dyn, qtend_dyn = utend, vtend, ttend, trtend[0]
    qtend = trtend[0]

    # --- prognostics to grid at time level 0 (physics.f90:89-101) ---
    from ..models.tendencies import _multi_spec2grid

    ucos, vcos = S.vort2vel(sp, state["vor"][0], state["div"][0])
    ug, vg, tg, qg, phig, pslg1 = _multi_spec2grid(
        sp,
        [ucos, vcos, state["t"][0], state["tr"][0][0], state["phi"],
         state["ps"][0][None]],
        consts.fuse_transforms)
    rcos = sp.cosgr[:, None]
    ug = ug * rcos
    vg = vg * rcos
    pslg = pslg1[0]

    # --- thermodynamics (physics.f90:107-116) ---
    psg = jnp.exp(pslg)
    rps = 1.0 / psg
    qg = jnp.maximum(qg, 0.0)
    se = pc.CP * tg + phig
    # whole-column vectorized: sigma enters as a broadcast (kx, 1, 1) column
    rh, qsat = spec_hum_to_rel_hum(tg, psg, geom.fsg[:, None, None], qg)

    # --- deep convection (physics.f90:123-132) ---
    iptop, cbmf, precnv, dfse, dfqa = conv.get_convection_tendencies(
        geom, psg, se, qg, qsat)
    # Flux -> tendency scaling for levels 2..kx (physics.f90:127-130);
    # level 1 carries no convective flux, so a masked multiply is exact.
    lvl_mask = np.ones((kx, 1, 1))
    lvl_mask[0] = 0.0
    lvl_mask = jnp.asarray(lvl_mask, dtype=dfse.dtype)
    scale_t = rps * geom.grdscp[:, None, None]
    scale_q = rps * geom.grdsig[:, None, None]
    tt_cnv = dfse * (scale_t * lvl_mask)
    qt_cnv = dfqa * (scale_q * lvl_mask)
    icnv = kx - iptop

    # --- large-scale condensation (physics.f90:135-139) ---
    iptop, precls, tt_lsc, qt_lsc = lsc.get_large_scale_condensation_tendencies(
        geom, psg, qg, qsat, iptop)

    ttend = ttend + tt_cnv + tt_lsc
    qtend = qtend + qt_cnv + qt_lsc

    state = dict(state)
    state["cbmf"] = cbmf
    state["precnv"] = precnv
    state["precls"] = precls

    # --- shortwave (every nstrad steps; physics.f90:151-169) ---
    def sw_branch(_):
        gse = (se[kx - 2] - se[kx - 1]) / (phig[kx - 2] - phig[kx - 1])
        icltop, cloudc, clstr, qcloud = sw.clouds(
            qg, rh, precnv, precls, iptop, gse, state["fmask_land"])
        st = dict(state)
        st["qcloud_equiv"] = qcloud
        tsr, ssrd, ssr, tt_flux, rad_tau2, rad_sc = sw.get_shortwave_rad_fluxes(
            geom, st, psg, qg, icltop, cloudc, clstr)
        tt_rsw = tt_flux * scale_t
        return tt_rsw, rad_tau2, rad_sc, tsr, ssrd, ssr, qcloud

    def cached_branch(_):
        return (state["tt_rsw"], state["rad_tau2"], state["rad_strat_corr"],
                state["tsr"], state["ssrd"], state["ssr"],
                state["qcloud_equiv"])

    # The nstrad=3 cadence is deterministic, so the scan builders specialize
    # the step on a static phase where possible (a Python bool here): the
    # cond disappears and the big rad_tau2/tt_rsw caches flow straight
    # through instead of being copied through conditional outputs each step.
    sw_flag = ctx["compute_shortwave"]
    if isinstance(sw_flag, bool):
        tt_rsw, rad_tau2, rad_sc, tsr, ssrd, ssr, qcloud = (
            sw_branch(None) if sw_flag else cached_branch(None))
    else:
        tt_rsw, rad_tau2, rad_sc, tsr, ssrd, ssr, qcloud = jax.lax.cond(
            sw_flag, sw_branch, cached_branch, None)
    state.update(tt_rsw=tt_rsw, rad_tau2=rad_tau2, rad_strat_corr=rad_sc,
                 tsr=tsr, ssrd=ssrd, ssr=ssr, qcloud_equiv=qcloud)

    # --- longwave downward (physics.f90:172-174) ---
    fband = consts.fband
    slrd, tt_rlw, rad_flux, rad_st4a = lw.get_downward_longwave_rad_fluxes(
        geom, fband, rad_tau2, tg)
    state["slrd"] = slrd
    state["rad_flux"] = rad_flux
    state["rad_st4a"] = rad_st4a

    # --- surface fluxes (physics.f90:177-198) ---
    fl = sflx.get_surface_fluxes(
        geom, psg, ug, vg, tg, qg, rh, phig,
        state["phis0"], state["fmask_land"], state["forog"], state["sst_am"],
        ssrd, slrd, state["alb_land"], state["alb_sea"], state["snowc"],
        state["land_temp"], state["soil_avail_water"], lfluxland=True)
    if consts.sea_coupling_flag > 0:
        fl = sflx.get_surface_fluxes(
            geom, psg, ug, vg, tg, qg, rh, phig,
            state["phis0"], state["fmask_land"], state["forog"],
            state["ssti_om"], ssrd, slrd, state["alb_land"],
            state["alb_sea"], state["snowc"], state["land_temp"],
            state["soil_avail_water"], lfluxland=False, prev=fl["_carry"])
    hfluxn3 = jnp.concatenate(
        [fl["hfluxn"], jnp.zeros_like(fl["hfluxn"][:1])])
    state.update(ustr=fl["ustr"], vstr=fl["vstr"], shf=fl["shf"],
                 evap=fl["evap"], slru=fl["slru"], hfluxn=hfluxn3)

    # --- longwave upward (physics.f90:202-211) ---
    fsfc, ftop, tt_rlw = lw.get_upward_longwave_rad_fluxes(
        geom, fband, rad_tau2, rad_st4a, rad_sc, tg, fl["tsfc"], slrd,
        fl["slru"][2], tt_rlw, rad_flux)
    state["slr"] = fsfc
    state["olr"] = ftop
    tt_rlw = tt_rlw * scale_t

    ttend = ttend + tt_rsw + tt_rlw

    # --- vertical diffusion + shallow convection (physics.f90:218-220) ---
    ut_pbl, vt_pbl, tt_pbl, qt_pbl = vdif.get_vertical_diffusion_tend(
        geom, se, rh, qg, qsat, phig, icnv)

    # surface-flux tendencies into the lowest layer (physics.f90:223-226),
    # fused one-hot adds instead of scattered updates
    bot = np.zeros((kx, 1, 1))
    bot[kx - 1] = 1.0
    bot = jnp.asarray(bot, dtype=ut_pbl.dtype)
    gsig = rps * geom.grdsig[kx - 1]
    gscp = rps * geom.grdscp[kx - 1]
    ut_pbl = ut_pbl + bot * (fl["ustr"][2] * gsig)
    vt_pbl = vt_pbl + bot * (fl["vstr"][2] * gsig)
    tt_pbl = tt_pbl + bot * (fl["shf"][2] * gscp)
    qt_pbl = qt_pbl + bot * (fl["evap"][2] * gsig)

    utend = utend + ut_pbl
    vtend = vtend + vt_pbl
    ttend = ttend + tt_pbl
    qtend = qtend + qt_pbl

    # --- SPPT multiplicative noise on the physics increment
    #     (physics.f90:234-248) ---
    if params.sppt_on:
        pattern, state = gen_sppt(consts, state)
        mu = 1.0  # no vertical tapering (sppt.f90:20)
        f = 1.0 + pattern * mu
        utend = f * (utend - utend_dyn) + utend_dyn
        vtend = f * (vtend - vtend_dyn) + vtend_dyn
        ttend = f * (ttend - ttend_dyn) + ttend_dyn
        qtend = f * (qtend - qtend_dyn) + qtend_dyn

    trtend = jnp.concatenate([qtend[None], trtend[1:]])
    return utend, vtend, ttend, trtend, state

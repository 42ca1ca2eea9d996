"""Daily time-dependent forcing fields (reference: speedy.f90/forcing.f90):
seasonal radiative forcing, surface albedos, CO2 trend, and the orographic
temperature/humidity corrections for horizontal diffusion."""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as pc
from ..ops import spectral as S
from ..physics.humidity import get_qsat
from ..physics.shortwave_radiation import get_zonal_average_fields
from .land import SNOW_DEPTH2COVER

__all__ = ["set_forcing"]

_IYEAR_REF = 1950
_DEL_CO2 = 0.005


def set_forcing(consts, state, year_frac, tyear):
    """Daily forcing update (forcing.f90:15-102, imode=1 path; the imode=0
    one-time pieces — radset, forog, ablco2_ref — are precomputed in consts).

    year_frac = year + tyear for the CO2 trend; tyear the fraction of the
    year. Returns the updated state."""
    geom = consts.geom
    sp = consts.sp
    state = dict(state)
    ones = jnp.ones_like(state["sice_am"])
    # Pin the calendar scalars to the model dtype (a Python float through
    # jnp trig would otherwise promote the branch to f64 under x64).
    rdt = ones.dtype
    tyear = jnp.asarray(tyear, dtype=rdt)
    year_frac = jnp.asarray(year_frac, dtype=rdt)

    fsol, ozupp, ozone, zenit, stratz = get_zonal_average_fields(geom, tyear)
    state["flux_solar_in"] = fsol * ones
    state["flux_ozone_upper"] = ozupp * ones
    state["flux_ozone_lower"] = ozone * ones
    state["zenit_correction"] = zenit * ones
    state["stratospheric_correction"] = stratz * ones

    # Surface albedos (forcing.f90:56-65)
    snowc = jnp.minimum(1.0, state["snow_depth"] / SNOW_DEPTH2COVER)
    alb_land = state["alb0"] + snowc * (pc.ALBSN - state["alb0"])
    alb_sea = pc.ALBSEA + state["sice_am"] * (pc.ALBICE - pc.ALBSEA)
    state["snowc"] = snowc
    state["alb_land"] = alb_land
    state["alb_sea"] = alb_sea
    state["alb_surface"] = alb_sea + state["fmask_land"] * (alb_land - alb_sea)

    # CO2 absorptivity trend (forcing.f90:67-74). `increase_co2` is a
    # runtime-settable state scalar in the reference
    # (registry/model_state_def.py:305-311), so it is consumed as a traced
    # value: flipping model["increase_co2"] takes effect without recompiling.
    trend = state["ablco2_ref"] * jnp.exp(_DEL_CO2 * (year_frac - _IYEAR_REF))
    state["air_absortivity_co2"] = jnp.where(
        state["increase_co2"], trend, state["air_absortivity_co2"])

    # Orographic T/q corrections for horizontal diffusion (forcing.f90:76-101)
    gamlat = pc.GAMMA / (1000.0 * pc.GRAV)
    corh = gamlat * state["phis0"]
    state["tcorh"] = S.grid2spec_p(sp, corh)

    pexp = 1.0 / (pc.RGAS * gamlat)
    tsfc = (state["fmask_land"] * state["land_temp"]
            + state["fmask_sea"] * state["sst_am"])
    tref = tsfc + corh
    psfc = (tsfc / tref) ** pexp

    qref = get_qsat(tref, jnp.ones_like(psfc), -1.0)
    qsfc = get_qsat(tsfc, psfc, 1.0)
    corh = pc.REFRH1 * (qref - qsfc)
    state["qcorh"] = S.grid2spec_p(sp, corh)
    return state

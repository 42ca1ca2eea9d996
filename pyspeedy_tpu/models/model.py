"""Model assembly: constants container, state allocation, the full
initialization sequence, and the jitted multi-step integrator.

Reference call-stack parity: initialization.f90:13-91 for `initialize`,
speedy.f90:20-74 (do_single_step) for the per-step sequence inside
`run_steps`. The N-step loop is a single lax.scan with per-step calendar
scalars precomputed on the host, so an arbitrary number of steps runs as one
XLA computation with no host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as pc
from ..coupling.forcing import set_forcing
from ..coupling.land import couple_land_atm, land_model_init
from ..coupling.sea import couple_sea_atm, sea_model_init
from ..ops import spectral as S
from ..ops.geometry import Geometry, build_geometry
from ..params import ModelParams
from ..physics.driver import get_physical_tendencies
from ..physics.longwave_radiation import radset
from ..physics.surface_fluxes import set_orog_land_sfc_drag
from ..physics import sppt as sppt_mod
from ..registry import MODEL_STATE_VARS, internal_shape
from ..utils.calendar import ModelCalendar
from .diagnostics import check_diagnostics
from .geopotential import build_geopot
from .implicit import build_hordif, build_implicit
from .prognostics import initialize_from_rest_state, spectral2grid
from .timestep import step

__all__ = ["Consts", "build_consts", "allocate_state", "initialize",
           "build_step_ctx", "make_run_steps", "SpeedyError"]


class SpeedyError(RuntimeError):
    pass


@dataclasses.dataclass(frozen=True)
class Consts:
    """Static tables and flags closed over by the jitted step functions."""

    params: ModelParams
    sp: Any                 # SpectralTransform
    geom: Geometry          # jnp arrays in the model dtype
    hd: Any                 # HorDiffusion
    gp: Any                 # GeopotTables
    implicit: Any           # ImplicitTables for the current dt
    fband: Any              # (301, 4)
    land_coupling_flag: bool = True
    sst_anomaly_coupling_flag: bool = True
    increase_co2: bool = False
    sea_coupling_flag: int = 0
    physics_on: bool = True

    def with_implicit(self, im) -> "Consts":
        return dataclasses.replace(self, implicit=im)


def _geom_jnp(params: ModelParams, geom_np: Geometry) -> Geometry:
    # Kept as *numpy* arrays: geometry scalars feed Python-level control flow
    # (e.g. sigma-level tests) inside traced functions, where a jnp constant
    # would become a tracer. XLA constant-folds them identically.
    dt = np.float64 if params.precision == "f64" else np.float32
    return Geometry(*(np.asarray(a, dtype=dt) for a in geom_np))


def build_consts(params: ModelParams, **flags) -> tuple[Consts, Geometry]:
    """Build all static tables. Returns (consts, numpy geometry)."""
    geom_np = build_geometry(params)
    sp = S.build_spectral(params, geom_np)
    hd = build_hordif(params, geom_np)
    gp = build_geopot(params, geom_np)
    im = build_implicit(params, geom_np, hd, 2.0 * params.delt)
    dt = np.float64 if params.precision == "f64" else np.float32
    fband = jnp.asarray(radset().astype(dt))
    consts = Consts(params=params, sp=sp, geom=_geom_jnp(params, geom_np),
                    hd=hd, gp=gp, implicit=im, fband=fband, **flags)
    return consts, geom_np


def allocate_state(params: ModelParams, n_months: int = 1) -> dict:
    """Zero-filled model state (the analog of ModelState_allocate,
    model_state.f90:358) in internal layouts, plus runtime extras."""
    rdt = np.float64 if params.precision == "f64" else np.float32
    cdt = np.complex128 if params.precision == "f64" else np.complex64
    state = {}
    for spec in MODEL_STATE_VARS:
        if spec.name == "current_step":
            continue  # host-side counter
        shape = internal_shape(params, spec, n_months=n_months)
        if spec.kind == "c":
            state[spec.name] = jnp.zeros(shape, dtype=cdt)
        elif spec.kind == "r":
            state[spec.name] = jnp.zeros(shape, dtype=rdt)
        elif spec.kind == "i":
            state[spec.name] = jnp.zeros(shape, dtype=jnp.int32)
        elif spec.kind == "l":
            state[spec.name] = jnp.zeros(shape, dtype=bool)
    # Defaults (model_state.f90 "Initialize default values")
    state["air_absortivity_co2"] = jnp.asarray(6.0, dtype=rdt)
    state["ablco2_ref"] = jnp.asarray(6.0, dtype=rdt)
    state["error_flag"] = jnp.asarray(False)
    if params.sppt_on:
        state.update(sppt_mod.init_sppt_state(params, jax.random.key(0)))
    return state


def _physics_fn(consts):
    return get_physical_tendencies if consts.physics_on else None


def initialize(consts: Consts, state: dict, host_bc: dict,
               cal: ModelCalendar) -> dict:
    """Full initialization sequence (initialization.f90:13-91):
    boundaries -> rest-state prognostics -> coupler init -> forcing ->
    first_step bootstrap. host_bc holds the numpy BC fields in internal
    (month/lat/lon-leading) layouts."""
    params = consts.params
    sp = consts.sp
    geom_np = host_bc["_geom_np"]

    # Boundary fields (boundaries.f90:22-37)
    state = dict(state)
    for name in ("orog", "fmask_orig", "alb0", "veg_high", "veg_low",
                 "soil_wc_l1", "soil_wc_l2", "soil_wc_l3"):
        state[name] = jnp.asarray(host_bc[name])
    phi0 = pc.GRAV * state["orog"]
    state["phi0"] = phi0
    state["phis0"] = S.grid_filter(sp, phi0)
    state["forog"] = set_orog_land_sfc_drag(state["phis0"])
    state["fband"] = consts.fband

    # Prognostics from the rest state (prognostics.f90:22-120)
    state = initialize_from_rest_state(consts, state)
    if bool(check_diagnostics(consts, state, 0)):
        raise SpeedyError("Initial state failed the diagnostics check")

    # Land model init (land_model.f90:18-148) — host side
    land = land_model_init(params, {
        "fmask_orig": np.asarray(state["fmask_orig"]),
        "stl12": host_bc["stl12"],
        "snowd12": host_bc["snowd12"],
        "veg_high": host_bc["veg_high"],
        "veg_low": host_bc["veg_low"],
        "soil_wc_l1": host_bc["soil_wc_l1"],
        "soil_wc_l2": host_bc["soil_wc_l2"],
        "alb0": host_bc["alb0"],
    })
    for k, v in land.items():
        state[k] = jnp.asarray(v)
    state = couple_land_atm(consts, state, True, cal.imont1, cal.tmonth)

    # Sea model init (sea_model.f90:33-191) — host side
    sea = sea_model_init(params, {
        "fmask_orig": np.asarray(state["fmask_orig"]),
        "sst12": host_bc["sst12"],
        "sea_ice_frac12": host_bc["sea_ice_frac12"],
        "sst_anom": host_bc["sst_anom"],
    }, geom_np.radang)
    for k, v in sea.items():
        state[k] = jnp.asarray(v)
    state = couple_sea_atm(consts, state, True, cal.imont1, cal.tmonth,
                           cal.month_idx)

    # Forcing, imode=0 (forcing.f90:43-48 + daily part)
    state["ablco2_ref"] = state["air_absortivity_co2"]
    state = set_forcing(consts, state, cal.year + cal.tyear, cal.tyear)

    # First-step bootstrap: dt/2, dt (time_stepping.f90:13-27). The
    # reference's compute_shortwave flag defaults to .true.
    # (model_state.f90:780), so both bootstrap steps run shortwave.
    geom_np2 = host_bc["_geom_np"]
    im_half = build_implicit(params, geom_np2, consts.hd, 0.5 * params.delt)
    im_full = build_implicit(params, geom_np2, consts.hd, params.delt)
    ctx = {"compute_shortwave": jnp.asarray(True)}
    pf = _physics_fn(consts)
    state = step(consts.with_implicit(im_half), state, 1, 1,
                 0.5 * params.delt, pf, ctx)
    state = step(consts.with_implicit(im_full), state, 1, 2,
                 params.delt, pf, ctx)

    # Coordinates (initialization.f90:85-87)
    state["lev"] = jnp.asarray(geom_np.fsg)
    state["lon"] = jnp.asarray(360.0 / params.ix * np.arange(params.ix))
    state["lat"] = jnp.asarray(geom_np.radang * 90.0 / np.arcsin(1.0))
    return state


def build_step_ctx(cal: ModelCalendar, current_step: int, n_steps: int):
    """Precompute per-step calendar scalars for an n-step scan.

    Returns (ctx dict of stacked arrays, calendar after n steps). For step i:
    do_forcing/tyear/year_frac describe the pre-step date; imont1/tmonth/
    month_idx the post-advance date used by the coupler (speedy.f90:47-72).
    """
    do_forcing = np.zeros(n_steps, dtype=bool)
    compute_sw = np.zeros(n_steps, dtype=bool)
    tyear = np.zeros(n_steps)
    year_frac = np.zeros(n_steps)
    imont1 = np.zeros(n_steps, dtype=np.int32)
    tmonth = np.zeros(n_steps)
    month_idx = np.zeros(n_steps, dtype=np.int32)

    params_nsteps = cal.nsteps
    for i in range(n_steps):
        stepno = current_step + i
        do_forcing[i] = stepno % params_nsteps == 0
        compute_sw[i] = stepno % 3 == 0
        tyear[i] = cal.tyear
        year_frac[i] = cal.year + cal.tyear
        cal.advance()
        imont1[i] = cal.imont1
        tmonth[i] = cal.tmonth
        month_idx[i] = cal.month_idx

    ctx = {
        "do_forcing": jnp.asarray(do_forcing),
        "compute_shortwave": jnp.asarray(compute_sw),
        "tyear": jnp.asarray(tyear),
        "year_frac": jnp.asarray(year_frac),
        "imont1": jnp.asarray(imont1),
        "tmonth": jnp.asarray(tmonth),
        "month_idx": jnp.asarray(month_idx),
    }
    return ctx, cal


def make_run_steps(consts: Consts):
    """Build the jitted n-step integrator (shapes specialize on n)."""
    params = consts.params
    pf = _physics_fn(consts)

    def single_step(state, ctx_i):
        # Daily forcing (speedy.f90:47-50)
        def with_forcing(st):
            return set_forcing(consts, st, ctx_i["year_frac"], ctx_i["tyear"])

        state = jax.lax.cond(ctx_i["do_forcing"], with_forcing,
                             lambda st: dict(st), state)

        state["compute_shortwave"] = ctx_i["compute_shortwave"]
        state = step(consts, state, 2, 2, 2.0 * params.delt, pf,
                     {"compute_shortwave": ctx_i["compute_shortwave"]})

        bad = check_diagnostics(consts, state, 1)
        state["error_flag"] = state["error_flag"] | bad

        # Coupler exchange at the advanced date (speedy.f90:69-72)
        state = couple_land_atm(consts, state, False, ctx_i["imont1"],
                                ctx_i["tmonth"])
        state = couple_sea_atm(consts, state, False, ctx_i["imont1"],
                               ctx_i["tmonth"], ctx_i["month_idx"])
        return state

    @jax.jit
    def run_steps(state, ctx):
        def body(st, ctx_i):
            return single_step(st, ctx_i), None

        state, _ = jax.lax.scan(body, state, ctx)
        return state

    return run_steps

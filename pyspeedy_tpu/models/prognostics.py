"""Prognostic-variable initialization and grid/spectral conversions for the
public API (reference: speedy.f90/prognostics.f90)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as pc
from ..ops import spectral as S

__all__ = ["initialize_from_rest_state", "spectral2grid", "grid2spectral",
           "grid_filter_prognostics"]


def initialize_from_rest_state(consts, state):
    """Reference atmosphere at rest (prognostics.f90:29-120): isothermal
    stratosphere over a constant-lapse-rate troposphere, surface pressure in
    hydrostatic balance with the (filtered) orography, humidity decaying as
    sigma^(hscale/hshum)."""
    params = consts.params
    sp = consts.sp
    geom = consts.geom
    kx = params.kx
    rdtype = params.dtype

    gam1 = pc.GAMMA / (1000.0 * pc.GRAV)

    state = dict(state)
    # Spectral fields are real pairs (2, ..., mx, nx); see ops/spectral.py.
    phis = S.grid2spec_p(sp, state["phis0"])
    state["phis"] = phis
    # Loop-invariant grid synthesis of phis for the grid_phi physics path
    # (models/geopotential.get_geopotential_grid). NOT phis0: the reference
    # transform pair is non-orthogonal (~5e-4, ops/geometry.py), so
    # spec2grid(phis) and phis0 differ by a small static field; exact
    # commutation with the spectral recursion requires the former.
    state["phisg"] = S.spec2grid_p(sp, phis, 1)

    zeros3 = jnp.zeros((2, kx, params.mx, params.nx), dtype=rdtype)
    state["vor"] = (zeros3, zeros3)
    state["div"] = (zeros3, zeros3)

    tref, ttop = 288.0, 216.0
    gam2 = gam1 / tref
    rgam = pc.RGAS * gam1
    rgamr = 1.0 / rgam

    surfs = -gam1 * phis
    surfs = surfs.at[0, 0, 0].set(
        float(np.sqrt(2.0)) * tref - gam1 * phis[0, 0, 0])

    t_levels = [jnp.zeros_like(phis).at[0, 0, 0].set(float(np.sqrt(2.0)) * ttop)
                for _ in range(2)]
    for k in range(2, kx):
        t_levels.append(surfs * geom.fsg[k] ** rgam)
    t1 = jnp.stack(t_levels, axis=1)  # (2, kx, mx, nx)
    state["t"] = (t1, jnp.zeros_like(t1))

    # log(normalized ps) consistent with the temperature profile, p=1013 hPa
    # at z=0 (prognostics.f90:83-94).
    rlog0 = float(np.log(1.013))
    surfg = rlog0 + rgamr * jnp.log(1.0 - gam2 * state["phis0"])
    ps1 = S.grid2spec_p(sp, surfg)
    if params.ix == 4 * params.iy:
        ps1 = S.truncate(sp, ps1)
    state["ps"] = (ps1, jnp.zeros_like(ps1))

    # Tropospheric specific humidity in g/kg (prognostics.f90:96-115).
    esref = 17.0
    qref = pc.REFRH1 * 0.622 * esref
    qexp = pc.HSCALE / pc.HSHUM
    surfgq = qref * jnp.exp(qexp * surfg)
    surfsq = S.grid2spec_p(sp, surfgq)
    if params.ix == 4 * params.iy:
        surfsq = S.truncate(sp, surfsq)

    q_levels = [jnp.zeros_like(phis) for _ in range(2)]
    for k in range(2, kx):
        q_levels.append(surfsq * geom.fsg[k] ** qexp)
    # tr layout: tuple over t_levs of (2, ntr, kx, mx, nx)
    tr0 = jnp.zeros((2, params.ntr, kx, params.mx, params.nx), dtype=rdtype)
    state["tr"] = (tr0.at[:, 0].set(jnp.stack(q_levels, axis=1)), tr0)

    state["phi"] = jnp.zeros_like(t1)
    return state


def spectral2grid(consts, state):
    """Fill the grid-space mirrors with unit conversions
    (prognostics.f90:125-154)."""
    sp = consts.sp
    state = dict(state)
    ucos, vcos = S.vort2vel_p(sp, state["vor"][0], state["div"][0])
    state["u_grid"] = S.spec2grid_p(sp, ucos, 2)
    state["v_grid"] = S.spec2grid_p(sp, vcos, 2)
    state["t_grid"] = S.spec2grid_p(sp, state["t"][0], 1)
    state["q_grid"] = S.spec2grid_p(sp, state["tr"][0][:, 0], 1) * 1.0e-3  # kg/kg
    state["phi_grid"] = S.spec2grid_p(sp, state["phi"], 1) / pc.GRAV    # m
    state["ps_grid"] = pc.P0 * jnp.exp(S.spec2grid_p(sp, state["ps"][0], 1))  # Pa
    return state


def grid2spectral(consts, state):
    """Push the grid-space mirrors back into the spectral prognostics
    (prognostics.f90:157-179)."""
    sp = consts.sp
    state = dict(state)
    vor1, div1 = S.grid_vel2vort_p(sp, state["u_grid"], state["v_grid"], 2)
    state["vor"] = (vor1, state["vor"][1])
    state["div"] = (div1, state["div"][1])
    state["t"] = (S.grid2spec_p(sp, state["t_grid"]), state["t"][1])
    state["tr"] = (state["tr"][0].at[:, 0].set(
        S.grid2spec_p(sp, state["q_grid"]) / 1.0e-3), state["tr"][1])
    state["phi"] = S.grid2spec_p(sp, state["phi_grid"]) * pc.GRAV
    state["ps"] = (S.grid2spec_p(sp, jnp.log(state["ps_grid"] / pc.P0)),
                   state["ps"][1])
    return state


def grid_filter_prognostics(consts, state):
    """Spectrally filter the grid-space mirrors (prognostics.f90:183-219)."""
    sp = consts.sp
    state = dict(state)
    for name in ("u_grid", "v_grid", "t_grid", "q_grid", "phi_grid", "ps_grid"):
        state[name] = S.grid_filter(sp, state[name])
    return state

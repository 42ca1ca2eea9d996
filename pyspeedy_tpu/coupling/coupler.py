"""Land/sea coupler facade (reference: speedy.f90/coupler.f90).

The model step (models/model.py) calls these two entry points; they simply
sequence the land and sea exchanges like the reference's
initialize_coupler/couple_sea_land."""

from __future__ import annotations

from .land import couple_land_atm
from .sea import couple_sea_atm

__all__ = ["initialize_coupler", "couple_sea_land"]


def initialize_coupler(consts, state, imont1, tmonth, month_idx):
    """Day-0 initialization of both coupled models (coupler.f90:12-32).
    The land/sea *constant* fields must already be in the state
    (land_model_init / sea_model_init)."""
    state = couple_land_atm(consts, state, True, imont1, tmonth)
    state = couple_sea_atm(consts, state, True, imont1, tmonth, month_idx)
    return state


def couple_sea_land(consts, state, imont1, tmonth, month_idx):
    """Per-step flux exchange with both coupled models (coupler.f90:35-48;
    called every step from speedy.f90:72)."""
    state = couple_land_atm(consts, state, False, imont1, tmonth)
    state = couple_sea_atm(consts, state, False, imont1, tmonth, month_idx)
    return state

"""Time interpolation of monthly climatologies (reference:
speedy.f90/interpolation.f90). Month indices are 1-based traced scalars;
fields are (12, il, ix) (or (M, il, ix) for SST anomalies)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["forint", "forin5", "monthly_interp"]


def forint(for12, imon, tmonth):
    """Piecewise-linear interpolation with month wrap-around
    (interpolation.f90:40-59)."""
    i0 = imon - 1
    early = tmonth <= 0.5
    i2 = jnp.where(early, (i0 + 11) % 12, (i0 + 1) % 12)
    w = jnp.where(early, 0.5 - tmonth, tmonth - 0.5)
    f1 = for12[i0]
    return f1 + w * (for12[i2] - f1)


def forin5(for12, imon, tmonth):
    """Mean-conserving 5-point interpolation (interpolation.f90:62-94)."""
    i0 = imon - 1
    im2 = (i0 - 2) % 12
    im1 = (i0 - 1) % 12
    ip1 = (i0 + 1) % 12
    ip2 = (i0 + 2) % 12

    c0 = 1.0 / 12.0
    t0 = c0 * tmonth
    t1 = c0 * (1.0 - tmonth)
    t2 = 0.25 * tmonth * (1.0 - tmonth)

    wm2 = -t1 + t2
    wm1 = -c0 + 8.0 * t1 - 6.0 * t2
    w0 = 7.0 * c0 + 10.0 * t2
    wp1 = -c0 + 8.0 * t0 - 6.0 * t2
    wp2 = -t0 + t2

    return (wm2 * for12[im2] + wm1 * for12[im1] + w0 * for12[i0]
            + wp1 * for12[ip1] + wp2 * for12[ip2])


def monthly_interp(field, month_idx, month_fraction):
    """Non-wrapping interpolation for the SST anomaly record, indexed by
    simulation month with one pad slab on each side
    (interpolation.f90:17-37)."""
    early = month_fraction <= 0.5
    i2 = jnp.where(early, month_idx - 1, month_idx + 1)
    w = jnp.where(early, 0.5 - month_fraction, month_fraction - 0.5)
    f1 = field[month_idx]
    return f1 + w * (field[i2] - f1)

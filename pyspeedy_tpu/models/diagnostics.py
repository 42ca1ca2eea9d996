"""Numerical-blowup diagnostics (reference: speedy.f90/diagnostics.f90).

Instead of aborting inside compiled code, the check returns a boolean; the
step loop accumulates it into state["error_flag"] and the Python API raises
after the fact (the reference maps the same condition to error code -2)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import spectral as S

__all__ = ["check_diagnostics"]


def check_diagnostics(consts, state, time_lev: int):
    """Per-level eddy KE of vor/div and global-mean T range check
    (diagnostics.f90:16-76). Returns True where out of range."""
    sp = consts.sp
    vor = state["vor"][time_lev]
    div = state["div"][time_lev]
    t = state["t"][time_lev]

    def eddy_ke(x):
        # - sum over m>=1 (all n) of Re(lapinv(x) * conj(x)); on the real
        # pair (2, kx, mx, nx) that is lap_re*re + lap_im*im summed over c.
        lp = S.laplacian_inv(sp, x)
        prod = lp[0] * x[0] + lp[1] * x[1]
        return -jnp.sum(prod[..., 1:, :], axis=(-2, -1))

    ke_vor = eddy_ke(vor)   # (kx,)
    ke_div = eddy_ke(div)
    tmean = jnp.sqrt(0.5) * t[0, ..., 0, 0]

    bad = (jnp.any(ke_vor > 500.0) | jnp.any(ke_div > 500.0)
           | jnp.any(tmean < 180.0) | jnp.any(tmean > 320.0))
    return bad

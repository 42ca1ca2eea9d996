"""SPPT stochastic physics pattern (reference: speedy.f90/sppt.f90).

Deliberate divergences from the reference, which are documented bugs there
(SURVEY.md "known quirks"): the spectral AR(1) state persists across steps in
the model state (the reference loses it to a local variable, sppt.f90:48-51),
and the RNG is a keyed, reproducible jax.random stream per member instead of
a wall-clock-seeded global generator (sppt.f90:132-145).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as pc
from ..ops import spectral as S

__all__ = ["gen_sppt", "init_sppt_state"]

TIME_DECORR = 6.0       # decorrelation time [h]
LEN_DECORR = 500000.0   # correlation length [m]
STDDEV = 0.33           # grid-space standard deviation


def _phi(params):
    return jnp.exp(-(24.0 / params.nsteps) / TIME_DECORR)


def _sigma(params, sp):
    """Wavenumber-dependent amplitude (sppt.f90:84-92)."""
    n = jnp.arange(1, params.trunc + 1, dtype=sp.el2.dtype)
    f0 = jnp.sum((2 * n + 1) * jnp.exp(
        -0.5 * (LEN_DECORR / pc.REARTH) ** 2 * n * (n + 1)))
    f0 = jnp.sqrt((STDDEV**2 * (1 - _phi(params) ** 2)) / (2 * f0))
    return f0 * jnp.exp(-0.25 * LEN_DECORR**2 * sp.el2)


def init_sppt_state(params, key):
    """Initial AR(1) state: stationary-variance draw (sppt.f90:92).
    sppt_spec is a real pair (2, kx, mx, nx) — see ops/spectral.py."""
    return {
        "sppt_spec": jnp.zeros((2, params.kx, params.mx, params.nx),
                               dtype=params.dtype),
        "sppt_key": key,
        "sppt_first": jnp.array(True),
    }


def _clipped_normal(key, shape, dtype, clip):
    x = jax.random.normal(key, shape, dtype=dtype)
    return jnp.clip(x, -clip, clip)


def gen_sppt(consts, state):
    """Advance the AR(1) spectral pattern and return the grid-space
    multiplicative field, clipped to +-1 (sppt.f90:40-111)."""
    params = consts.params
    sp = consts.sp
    shape = (params.kx, params.mx, params.nx)

    key, k1, k2 = jax.random.split(state["sppt_key"], 3)
    rdt = params.dtype
    # Complex white noise as a real pair (re, im): same draws as the complex
    # formulation, no complex dtype in the traced graph.
    eta = jnp.stack([_clipped_normal(k1, shape, rdt, 10.0),
                     _clipped_normal(k2, shape, rdt, 10.0)])

    phi = _phi(params)
    sigma = _sigma(params, sp)

    first = state["sppt_first"]
    fresh = (1 - phi**2) ** (-0.5) * sigma * eta
    ar1 = phi * state["sppt_spec"] + sigma * eta
    sppt_spec = jnp.where(first, fresh, ar1)

    pattern = S.spec2grid_p(sp, sppt_spec, 1)
    pattern = jnp.clip(pattern, -1.0, 1.0)

    state = dict(state)
    state["sppt_spec"] = sppt_spec
    state["sppt_key"] = key
    state["sppt_first"] = jnp.array(False)
    return pattern, state

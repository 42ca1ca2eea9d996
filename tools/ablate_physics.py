"""Per-scheme physics ablation on TPU: stub out one parameterization at a
time (zero tendencies, shape-correct) and time the batched ensemble step.
The delta vs the full step attributes the physics cost per scheme.

Usage: python tools/ablate_physics.py [n_members] [n_steps]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyspeedy_tpu.models import model as M
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.testing import make_demo_model
from pyspeedy_tpu.parallel.ensemble import broadcast_state, make_run_steps_batched
from pyspeedy_tpu.physics import convection as conv
from pyspeedy_tpu.physics import large_scale_condensation as lsc
from pyspeedy_tpu.physics import longwave_radiation as lw
from pyspeedy_tpu.physics import shortwave_radiation as sw
from pyspeedy_tpu.physics import surface_fluxes as sflx
from pyspeedy_tpu.physics import vertical_diffusion as vdif


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.time() - t0


def stub_convection(geom, psa, se, qa, qsat):
    kx = se.shape[0]
    z = jnp.zeros_like(psa)
    z3 = jnp.zeros_like(se)
    itop = jnp.full_like(psa, kx + 1).astype(jnp.int32)
    return itop, z, z, z3, z3


def stub_lsc(geom, psa, qa, qsat, itop):
    z = jnp.zeros_like(psa)
    z3 = jnp.zeros_like(qa)
    return itop, z, z3, z3


def stub_lw_down(geom, fband, rad_tau2, ta):
    z = jnp.zeros_like(ta[0])
    z3 = jnp.zeros_like(ta)
    rad_flux = jnp.zeros((4,) + ta.shape[1:], ta.dtype)
    rad_st4a = jnp.zeros((2,) + ta.shape, ta.dtype)
    return z, z3, rad_flux, rad_st4a


def stub_lw_up(geom, fband, rad_tau2, rad_st4a, rad_sc, ta, tsfc, slrd,
               slru2, dfabs, rad_flux):
    z = jnp.zeros_like(ta[0])
    return z, z, dfabs


def stub_vdif(geom, se, rh, qa, qsat, phi, icnv):
    z3 = jnp.zeros_like(se)
    return z3, z3, z3, z3


def make_stub_sflx(real):
    def stub(geom, psa, ua, va, ta, qa, rh, phi, phi0, fmask, forog, tsea,
             ssrd, slrd, alb_land, alb_sea, snowc, land_temp,
             soil_avail_water, lfluxland=True, prev=None):
        z = jnp.zeros_like(psa)
        z3 = jnp.broadcast_to(z, (3,) + z.shape)
        z2 = jnp.broadcast_to(z, (2,) + z.shape)
        return {"ustr": z3, "vstr": z3, "shf": z3, "evap": z3, "slru": z3,
                "hfluxn": z2, "tsfc": ta[-1], "tskin": ta[-1],
                "u0": ua[-1], "v0": va[-1], "t0": ta[-1], "_carry": None}
    return stub


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    backend = jax.default_backend()
    precision = "f64" if backend == "cpu" else "f32"
    params = dataclasses.replace(T30L8, precision=precision,
                                 fft_mode="matmul")
    consts, state, cal = make_demo_model(params)
    bstate = broadcast_state(state, n_members)
    ctx, _ = M.build_step_ctx(cal, 2, n_steps)

    variants = [
        ("full", {}),
        ("-conv", {(conv, "get_convection_tendencies"): stub_convection}),
        ("-lsc", {(lsc, "get_large_scale_condensation_tendencies"): stub_lsc}),
        ("-lw", {(lw, "get_downward_longwave_rad_fluxes"): stub_lw_down,
                 (lw, "get_upward_longwave_rad_fluxes"): stub_lw_up}),
        ("-sflx", {(sflx, "get_surface_fluxes"):
                   make_stub_sflx(sflx.get_surface_fluxes)}),
        ("-vdif", {(vdif, "get_vertical_diffusion_tend"): stub_vdif}),
    ]

    results = {}
    for label, patches in variants:
        saved = {}
        for (mod, name), stub in patches.items():
            saved[(mod, name)] = getattr(mod, name)
            setattr(mod, name, stub)
        try:
            run = make_run_steps_batched(consts, donate=False)
            w = timed(run, bstate, ctx)
        finally:
            for (mod, name), orig in saved.items():
                setattr(mod, name, orig)
        results[label] = w * 1e3 / n_steps
        print(f"{label}: {w*1e3/n_steps:.2f} ms/step", file=sys.stderr,
              flush=True)

    print(json.dumps({"members": n_members, "ms_per_step": results}))


if __name__ == "__main__":
    main()

"""Isolate the per-step cost of the SPPT pattern generation on TPU.

Scans gen_sppt (and ablated variants) over a day of steps, vmapped over
n_members, to price each piece: RNG draw, AR(1) update, inverse transform.

Usage: python tools/exp_sppt2.py [n_members]
"""

import dataclasses
import os
import statistics
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
from pyspeedy_tpu.physics import sppt as sppt_mod
from pyspeedy_tpu.ops import spectral as S


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, arg, n_rep=5):
    out = fn(arg)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = fn(arg)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_steps = 108
    params = dataclasses.replace(T30L8, precision="f32", fft_mode="matmul")
    consts, _ = M.build_consts_cached(
        dataclasses.replace(params, sppt_on=True))
    tables = consts.sppt
    sp = consts.sp
    shape = (2, params.kx, params.mx, params.nx)

    base = sppt_mod.init_sppt_state(params, jax.random.key(0))
    state0 = {
        "sppt_spec": jnp.broadcast_to(base["sppt_spec"][None],
                                      (n_members,) + shape).copy(),
        "sppt_key": jax.random.split(base["sppt_key"], n_members),
        "sppt_first": jnp.zeros((n_members,), dtype=bool),
    }

    def one_full(st):
        def mem(s):
            pat, s2 = sppt_mod.gen_sppt(consts, s)
            return s2, pat
        def body(s, _):
            s2, pat = jax.vmap(mem)(s)
            return s2, None
        s, _ = jax.lax.scan(body, st, None, length=n_steps)
        return s

    def one_rng_only(st):
        def mem(s):
            key, k1 = jax.random.split(s["sppt_key"])
            eta = jnp.clip(jax.random.normal(k1, shape, params.dtype), -10, 10)
            se = tables.sigma * eta
            spec = jnp.where(s["sppt_first"], tables.stat * se,
                             tables.phi * s["sppt_spec"] + se)
            return {**s, "sppt_spec": spec, "sppt_key": key}
        def body(s, _):
            return jax.vmap(mem)(s), None
        s, _ = jax.lax.scan(body, st, None, length=n_steps)
        return s

    def one_transform_only(st):
        def mem(s):
            spec = tables.phi * s["sppt_spec"]  # keep the carry alive
            pat = jnp.clip(S.spec2grid_p(sp, spec, 1), -1.0, 1.0)
            # fold the pattern back so nothing is dead-code eliminated
            spec = spec + 1e-12 * jnp.mean(pat)
            return {**s, "sppt_spec": spec}
        def body(s, _):
            return jax.vmap(mem)(s), None
        s, _ = jax.lax.scan(body, st, None, length=n_steps)
        return s

    def one_rbg(st):
        # rbg-keyed draw: same shapes, cheaper generator
        def mem(s):
            key, k1 = jax.random.split(s["rbg_key"])
            eta = jnp.clip(jax.random.normal(k1, shape, params.dtype), -10, 10)
            se = tables.sigma * eta
            spec = tables.phi * s["sppt_spec"] + se
            return {**s, "sppt_spec": spec, "rbg_key": key}
        def body(s, _):
            return jax.vmap(mem)(s), None
        s, _ = jax.lax.scan(body, st, None, length=n_steps)
        return s

    for name, fn, st in (
            ("full gen_sppt", one_full, state0),
            ("rng+ar1 only", one_rng_only, state0),
            ("transform only", one_transform_only, state0),
    ):
        sec = timeit(jax.jit(fn), st)
        log(f"{name:18s} {sec/n_steps*1e3:7.4f} ms/step "
            f"({sec*1e3:.1f} ms total)")

    try:
        st_rbg = dict(state0)
        del st_rbg["sppt_key"], st_rbg["sppt_first"]
        st_rbg["rbg_key"] = jax.vmap(
            lambda i: jax.random.fold_in(
                jax.random.key(0, impl="rbg"), i))(jnp.arange(n_members))
        sec = timeit(jax.jit(one_rbg), st_rbg)
        log(f"{'rng rbg+ar1 only':18s} {sec/n_steps*1e3:7.4f} ms/step "
            f"({sec*1e3:.1f} ms total)")
    except Exception as e:  # noqa: BLE001
        log(f"rbg variant failed: {e}")


if __name__ == "__main__":
    main()

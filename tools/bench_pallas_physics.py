"""Time the Pallas physics megakernel vs the XLA physics chain on TPU.

Both run vmapped over n_members inside a jitted scan (in-graph timing: no
host transfers between iterations). Also checks on-device agreement.

Usage: python tools/bench_pallas_physics.py [n_members] [iters] [tile]
"""

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyspeedy_tpu.models import model as M
from pyspeedy_tpu.ops import spectral as S
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.testing import make_demo_model
from pyspeedy_tpu.physics.driver import (grid_physics, BC_FIELDS,
                                         CACHE_FIELDS)
from pyspeedy_tpu.physics.pallas_physics import grid_physics_pallas


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    backend = jax.default_backend()
    precision = "f64" if backend == "cpu" else "f32"
    params = dataclasses.replace(T30L8, precision=precision,
                                 fft_mode="matmul")
    consts, state, cal = make_demo_model(params)
    sp = consts.sp

    @jax.jit
    def prep(st):
        ucos, vcos = S.vort2vel_p(sp, st["vor"][0], st["div"][0])
        return (S.spec2grid_p(sp, ucos, 2), S.spec2grid_p(sp, vcos, 2),
                S.spec2grid_p(sp, st["t"][0], 1),
                S.spec2grid_p(sp, st["tr"][0][:, 0], 1),
                S.spec2grid_p(sp, st["phi"], 1),
                S.spec2grid_p(sp, st["ps"][0], 1))

    ug, vg, tg, qg, phig, pslg = prep(state)
    bc = tuple(state[n] for n in BC_FIELDS)
    cache = tuple(state[n] for n in CACHE_FIELDS)
    ab = jnp.asarray(state["air_absortivity_co2"])

    B = n_members
    batch = lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                       (B,) + jnp.shape(x))
    args3 = tuple(batch(x) for x in (ug, vg, tg, qg, phig))
    pslg_b = batch(pslg)

    def run_variant(fn, label, swf):
        one = lambda u, v, t, q, p, ps: fn(consts, swf, u, v, t, q, p, ps,
                                           bc, cache, ab)

        @jax.jit
        def loop(a3, psb):
            def body(c, _):
                outs = jax.vmap(one)(*c, psb)
                ut, vt, tt, qt = outs[:4]
                # feed tendencies back into inputs to serialize iterations
                newc = (c[0] + 0.0 * ut, c[1] + 0.0 * vt, c[2] + 0.0 * tt,
                        c[3] + 0.0 * qt, c[4])
                return newc, None

            c, _ = jax.lax.scan(body, a3, None, length=iters)
            return c

        t0 = time.time()
        out = loop(args3, pslg_b)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        t0 = time.time()
        out = loop(args3, pslg_b)
        jax.block_until_ready(out)
        per = (time.time() - t0) / iters
        print(f"{label} sw={swf}: {per*1e3:.3f} ms/call "
              f"(compile {compile_s:.1f}s)", file=sys.stderr, flush=True)
        return per

    res = {}
    for swf in (True, False):
        res[f"xla_sw{int(swf)}"] = run_variant(grid_physics, "xla", swf)
        pall = functools.partial(grid_physics_pallas, tile=tile)

        def pall_fn(consts_, swf_, *a, **kw):
            return grid_physics_pallas(consts_, swf_, *a, tile=tile, **kw)

        res[f"pallas_sw{int(swf)}"] = run_variant(pall_fn, "pallas", swf)

    # on-device agreement (single member)
    refs = grid_physics(consts, True, ug, vg, tg, qg, phig, pslg, bc,
                        cache, ab)
    pals = grid_physics_pallas(consts, True, ug, vg, tg, qg, phig, pslg,
                               bc, cache, ab, tile=tile)

    @jax.jit
    def maxdiff(a, b):
        return jnp.max(jnp.asarray(
            [jnp.max(jnp.abs(x - y))
             for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))]))

    d = float(maxdiff(refs, pals))
    print(json.dumps({"members": n_members, "tile": tile,
                      **{k: round(v * 1e3, 3) for k, v in res.items()},
                      "unit": "ms_per_call", "max_abs_diff": d}))


if __name__ == "__main__":
    main()

"""Isolated cost of the spectral-glue chain at ensemble batch sizes.

Bounds the payoff of the round-4 member-tiled glue kernel (VERDICT task 2):
times a vmapped scan of ONLY models/spectral_glue.spectral_update (flux
combination -> linear tendencies -> implicit -> diffusion -> leapfrog) on
synthetic operands of the step's real shapes, plus the same chain through
the per-member whole_kernel Pallas path and a member-tiled Pallas variant
(vmap inside the kernel body, members tiled over the pallas grid so the
implicit/diffusion tables are read once per TILE instead of once per
member).

Usage: python tools/exp_glue.py [n_members] [n_steps] [mtile]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyspeedy_tpu.models import model as M  # noqa: E402
from pyspeedy_tpu.models.spectral_glue import spectral_update  # noqa: E402
from pyspeedy_tpu.params import T30L8  # noqa: E402

N_SPECS = 10  # utend vtend flux_ut flux_vt flux_qu flux_qv ke ttend trtend(ntr=1) + psdt separate


def member_tiled_kernel(fn, args, mtile, interpret=False):
    """Run vmap(fn) as a Pallas kernel with the member axis tiled over the
    grid: each program instance processes `mtile` members, so table-like
    captured constants are read once per tile instead of once per member."""
    from jax.experimental import pallas as pl

    args = tuple(args)
    n_args = len(args)
    B = np.shape(args[0])[0]
    assert B % mtile == 0

    def tile_aval(x):
        s = (mtile,) + tuple(np.shape(x)[1:])
        return jax.ShapeDtypeStruct(s, jnp.result_type(x))

    holder = {}

    def flat_fn(*a):
        out = jax.vmap(fn)(*a)
        leaves, treedef = jax.tree.flatten(out)
        holder["treedef"] = treedef
        return tuple(leaves)

    closed = jax.make_jaxpr(flat_fn)(*[tile_aval(x) for x in args])
    hoisted = list(closed.consts)
    hoisted_shapes = [np.shape(c) for c in hoisted]

    def pad2(s):
        return s if len(s) >= 2 else ((1,) + tuple(s) if len(s) == 1
                                      else (1, 1))

    hoisted_in = [jnp.asarray(c).reshape(pad2(np.shape(c))) for c in hoisted]

    def tiled_spec(x):
        s = (mtile,) + tuple(np.shape(x)[1:])
        nd = len(s)

        def index(t, _nd=nd):
            return (t,) + (0,) * (_nd - 1)

        return pl.BlockSpec(s, index)

    inputs = args + tuple(hoisted_in)
    in_specs = [tiled_spec(x) for x in args]
    in_specs += [pl.BlockSpec(c.shape, lambda t, _n=c.ndim: (0,) * _n)
                 for c in hoisted_in]
    flat_out = closed.out_avals
    out_shape = [jax.ShapeDtypeStruct((B,) + a.shape[1:], a.dtype)
                 for a in flat_out]
    out_specs = [tiled_spec(a) for a in flat_out]

    n_in = len(inputs)

    def kernel(*refs):
        in_refs = refs[:n_in]
        out_refs = refs[n_in:]
        vals = [r[...] for r in in_refs[:n_args]]
        consts_v = [r[...].reshape(s) for r, s in
                    zip(in_refs[n_args:], hoisted_shapes)]
        outs = jax.core.eval_jaxpr(closed.jaxpr, consts_v, *vals)
        for r, o in zip(out_refs, outs):
            r[...] = o

    flat = pl.pallas_call(
        kernel,
        grid=(B // mtile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret or jax.default_backend() != "tpu",
    )(*inputs)
    return jax.tree.unflatten(holder["treedef"], flat)


def main():
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    mtile = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    backend = jax.default_backend()
    precision = "f64" if backend == "cpu" else "f32"
    params = dataclasses.replace(T30L8, precision=precision,
                                 fft_mode="matmul")
    consts, _ = M.build_consts_cached(params)
    kx, mx, nx, ntr = params.kx, params.mx, params.nx, params.ntr
    dt = params.delt * 2.0
    rdtype = np.float64 if precision == "f64" else np.float32

    rng = np.random.default_rng(0)

    def mk(*shape):
        return jax.device_put(
            (1e-6 * rng.standard_normal((n_members,) + shape)).astype(rdtype))

    specs = [mk(2, kx, mx, nx) for _ in range(N_SPECS)]
    psdt = mk(2, mx, nx)
    pairs = [mk(2, kx, mx, nx) for _ in range(6)]        # vor0/1 div0/1 t0/1
    ps = [mk(2, mx, nx), mk(2, mx, nx)]
    trf = [mk(2, ntr * kx, mx, nx) for _ in range(2)]
    phi = mk(2, kx, mx, nx)
    tcorh = mk(2, mx, nx)
    qcorh = mk(2, mx, nx)

    args = tuple(specs) + (psdt,) + tuple(pairs) + tuple(ps) + tuple(trf) \
        + (phi, tcorh, qcorh)

    def glue_one(*a):
        sp_list = list(a[:N_SPECS])
        (psdt_, vor0, vor1, div0, div1, t0, t1, ps0, ps1, trf0, trf1,
         phi_, tch, qch) = a[N_SPECS:]
        return spectral_update(consts, 2, dt, params.rob, True, sp_list,
                               psdt_, vor0, vor1, div0, div1, t0, t1,
                               ps0, ps1, trf0, trf1, phi_, tch, qch)

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        return best

    results = {}

    def scan_of(call):
        @jax.jit
        def run(a):
            def body(c, _):
                outs = call(*c)
                # outputs (ps0,ps1,vor0..t1,trf0,trf1) feed back into their
                # state slots (args order: vor0..t1, ps0, ps1, trf0, trf1)
                order = [6, 7, 0, 1, 2, 3, 4, 5, 8, 9]
                new = list(c)
                for i, o in enumerate(order):
                    new[N_SPECS + 1 + o] = (
                        c[N_SPECS + 1 + o] + 1e-12 * outs[i])
                return tuple(new), None

            c, _ = jax.lax.scan(body, a, None, length=n_steps)
            return c

        return run

    # XLA vmapped (production glue)
    run_xla = scan_of(lambda *a: jax.vmap(glue_one)(*a))
    w = timed(run_xla, args)
    results["glue_xla"] = w * 1e3 / n_steps
    print(f"glue_xla: {w*1e3/n_steps:.3f} ms/step", file=sys.stderr,
          flush=True)

    # member-tiled pallas
    try:
        run_mt = scan_of(
            lambda *a: member_tiled_kernel(glue_one, a, mtile))
        w = timed(run_mt, args)
        results[f"glue_mtile{mtile}"] = w * 1e3 / n_steps
        print(f"glue_mtile{mtile}: {w*1e3/n_steps:.3f} ms/step",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        results["glue_mtile_error"] = str(e)[:500]
        print(f"glue_mtile failed: {e}", file=sys.stderr, flush=True)

    # parity
    try:
        a_ref = jax.jit(lambda *a: jax.vmap(glue_one)(*a))(*args)
        a_mt = jax.jit(lambda *a: member_tiled_kernel(glue_one, a, mtile))(
            *args)
        err = max(float(jnp.abs(x - y).max())
                  for x, y in zip(a_ref, a_mt))
        results["mtile_max_abs_err"] = err
        print(f"parity: {err:.2e}", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"parity failed: {e}", file=sys.stderr, flush=True)

    print(json.dumps({"members": n_members, "steps": n_steps,
                      "mtile": mtile, "backend": backend,
                      "ms_per_step": results}))


if __name__ == "__main__":
    main()

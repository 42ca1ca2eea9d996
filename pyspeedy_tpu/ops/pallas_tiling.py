"""Generic latitude-tiled Pallas execution of column-local functions.

Any function whose operations are elementwise over (lat, lon) — with
reductions/recurrences only along leading level/band axes — can run as one
Pallas kernel over latitude tiles, keeping every intermediate in VMEM. This
module packages the plumbing: BlockSpec construction per array rank,
hoisting of captured numpy constants into kernel inputs (Pallas kernels may
not close over arrays), and shape-padding of small constants to Mosaic's
rank >= 2 requirement.

Used by physics/pallas_physics.py (the physics megakernel) and
models/tendencies.py (the grid-point dynamics kernel). (A whole-state
per-member execution mode, `whole_kernel`, was deleted in round 4 after
measuring as a dead end twice — see models/spectral_glue.py.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["tiled_columnwise"]


def _pad2d(shape):
    if len(shape) >= 2:
        return shape
    if len(shape) == 1:
        return (1,) + tuple(shape)
    return (1, 1)


def _zero_index(ndim):
    return lambda t: (0,) * ndim


def _spec_for(shape, tile, il):
    """BlockSpec tiling the latitude axis (second-to-last dim when it equals
    il); arrays without a latitude axis are replicated per tile."""
    nd = len(shape)
    if nd >= 2 and shape[-2] == il:
        block = tuple(shape[:-2]) + (tile, shape[-1])
        lat_pos = nd - 2

        def index(t, _lat=lat_pos, _nd=nd):
            idx = [0] * _nd
            idx[_lat] = t
            return tuple(idx)

        return pl.BlockSpec(block, index)
    return pl.BlockSpec(tuple(shape), _zero_index(nd))


def tiled_columnwise(fn, args, il, tile=None, interpret=False):
    """Run `fn(*args) -> pytree` as a Pallas kernel tiled over latitude.

    Every arg (and every output) whose second-to-last axis has size `il` is
    tiled along it; other arrays ride whole into each tile. Captured numpy
    constants inside `fn` (geometry columns, masks) are hoisted into inputs
    automatically. Outputs must be column-local: values in a latitude tile
    may only depend on inputs in the same tile.
    """
    args = tuple(args)
    n_args = len(args)
    if tile is None:
        # Largest sublane-aligned divisor from the measured-good range.
        # Falling back to tile=il is a VMEM trap at higher resolutions:
        # T47's il=72 (not divisible by 16) put the whole latitude range in
        # one instance and overflowed scoped VMEM at 18.3 MB — the real
        # cause of round 3's "transient" T47 batched-compile failures.
        for cand in (16, 24, 8):
            if il % cand == 0:
                tile = cand
                break
        else:
            tile = il
    assert il % tile == 0, (il, tile)
    interpret = interpret or jax.default_backend() != "tpu"

    def tile_aval(x):
        s = list(np.shape(x))
        if len(s) >= 2 and s[-2] == il:
            s[-2] = tile
        return jax.ShapeDtypeStruct(tuple(s), jnp.result_type(x))

    flat_fn_tree = {}

    def flat_fn(*a):
        out = fn(*a)
        leaves, treedef = jax.tree.flatten(out)
        flat_fn_tree["treedef"] = treedef
        return tuple(leaves)

    closed = jax.make_jaxpr(flat_fn)(*[tile_aval(x) for x in args])
    treedef = flat_fn_tree["treedef"]
    hoisted = list(closed.consts)
    hoisted_shapes = [np.shape(c) for c in hoisted]
    hoisted_in = [jnp.asarray(c).reshape(_pad2d(np.shape(c)))
                  for c in hoisted]

    inputs = args + tuple(hoisted_in)
    n_in = len(inputs)
    in_specs = [_spec_for(np.shape(x), tile, il) for x in args]
    in_specs += [pl.BlockSpec(c.shape, _zero_index(c.ndim))
                 for c in hoisted_in]

    out_aval = jax.eval_shape(fn, *args)
    flat_out, out_treedef = jax.tree.flatten(out_aval)
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in flat_out]
    out_specs = [_spec_for(a.shape, tile, il) for a in flat_out]

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
        grid=(il // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    return jax.tree.unflatten(out_treedef, flat)

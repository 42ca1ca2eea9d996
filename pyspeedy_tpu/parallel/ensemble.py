"""Batched ensemble execution — the TPU-native replacement for the
reference's OpenMP `parallel_step` (speedy_driver.f90:58-79).

Members form a leading batch axis on every state array; one vmapped step
advances all members at once (the transforms become bigger batched matmuls —
exactly where TPU throughput comes from), and the member axis shards over the
"ensemble" mesh axis for multi-chip scale-out with zero cross-member
communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import model as M
from .mesh import ensemble_state_sharding, make_mesh

__all__ = ["broadcast_state", "make_run_steps_batched", "shard_ensemble"]


def broadcast_state(state: dict, n_members: int) -> dict:
    """Replicate a single-member state into a member-batched state."""
    def rep(name, x):
        if name == "sppt_key":
            return jax.random.split(x, n_members)
        return jnp.broadcast_to(x[None], (n_members,) + x.shape)

    return {k: rep(k, v) for k, v in state.items()}


def make_run_steps_batched(consts, mesh=None, shard_space: bool = True,
                           donate: bool = True):
    """Jitted n-step integrator over a member-batched state. When a mesh is
    given, the state is constrained to the ensemble/space sharding layout."""
    single = M.make_single_step(consts)

    def body(state, ctx_i):
        return jax.vmap(lambda st: single(st, ctx_i))(state), None

    def run(state, ctx):
        state, _ = jax.lax.scan(body, state, ctx)
        return state

    if mesh is None:
        return jax.jit(run, donate_argnums=(0,) if donate else ())

    def run_sharded(state, ctx):
        sh = ensemble_state_sharding(mesh, state, shard_space)
        state = jax.lax.with_sharding_constraint(state, sh)
        state, _ = jax.lax.scan(body, state, ctx)
        return jax.lax.with_sharding_constraint(state, sh)

    return jax.jit(run_sharded, donate_argnums=(0,) if donate else ())


def shard_ensemble(mesh, state: dict, shard_space: bool = True) -> dict:
    """Place a member-batched state onto the mesh."""
    sh = ensemble_state_sharding(mesh, state, shard_space)
    return jax.device_put(state, sh)

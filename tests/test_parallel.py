"""Ensemble batching and mesh-sharding tests on the virtual 8-device CPU
mesh: vmapped members must equal the single-member path, and sharded
execution must equal unsharded execution."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyspeedy_tpu.models import model as M
from pyspeedy_tpu.parallel.ensemble import (broadcast_state,
                                            make_run_steps_batched,
                                            shard_ensemble)
from pyspeedy_tpu.parallel.mesh import make_mesh
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.testing import make_demo_model

PARAMS = dataclasses.replace(T30L8, fft_mode="matmul")

_cache = {}


def demo():
    if "demo" not in _cache:
        _cache["demo"] = make_demo_model(PARAMS)
    consts, state, cal = _cache["demo"]
    return consts, dict(state), dataclasses.replace(cal)


N_STEPS = 8


def run_single(consts, state, cal):
    run = M.make_run_steps(consts)
    ctx, _ = M.build_step_ctx(cal, 2, N_STEPS)
    return run(state, ctx)


def test_vmap_members_match_single():
    consts, state, cal = demo()
    ref = run_single(consts, dict(state), dataclasses.replace(cal))

    batched = broadcast_state(state, 4)
    run = make_run_steps_batched(consts, donate=False)
    ctx, _ = M.build_step_ctx(dataclasses.replace(cal), 2, N_STEPS)
    out = run(batched, ctx)

    for name in ("vor", "div", "t", "ps", "tr", "tt_rsw", "land_temp"):
        for m in range(4):
            got = jax.tree.map(lambda a: np.asarray(a[m]), out[name])
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref[name]),
                rtol=0, atol=1e-13, err_msg=f"{name} member {m}")


def test_sharded_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    consts, state, cal = demo()

    batched = broadcast_state(state, 8)
    run = make_run_steps_batched(consts, donate=False)
    ctx, _ = M.build_step_ctx(dataclasses.replace(cal), 2, N_STEPS)
    ref = run(batched, ctx)

    mesh = make_mesh(n_ensemble=4, n_space=2)
    sharded = shard_ensemble(mesh, broadcast_state(state, 8))
    run_sh = make_run_steps_batched(consts, mesh=mesh, donate=False)
    ctx2, _ = M.build_step_ctx(dataclasses.replace(cal), 2, N_STEPS)
    out = run_sh(sharded, ctx2)

    for name in ("vor", "div", "t", "ps", "tr", "tt_rsw"):
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref[name]),
            rtol=0, atol=1e-10, err_msg=name)


def test_unrolled_scan_matches():
    """unroll=2 (the sub-knee default, parallel/ensemble.pick_scan_unroll)
    is a pure scheduling change: the SW-aligned batched runner must produce
    bitwise-identical trajectories at any unroll factor."""
    consts, state, cal = demo()
    batched = broadcast_state(state, 2)
    # 15 steps from phase 2: exercises prefix + a 3-triple aligned scan
    # (odd triple count, so unroll=2 also hits its remainder path) + tail.
    ctx, _ = M.build_step_ctx(cal, 2, 15)
    ref = make_run_steps_batched(consts, donate=False, phase=2)(
        dict(batched), ctx)
    out = make_run_steps_batched(consts, donate=False, phase=2, unroll=2)(
        dict(batched), ctx)
    for name in ("vor", "div", "t", "ps", "tr", "precnv"):
        np.testing.assert_array_equal(
            np.asarray(out[name]), np.asarray(ref[name]), err_msg=name)


def test_perturbed_members_diverge():
    # Ensemble IC perturbation idiom: perturbing one member's temperature
    # must change only that member's trajectory.
    consts, state, cal = demo()
    batched = broadcast_state(state, 2)
    batched["t"] = tuple(lev.at[1].multiply(1.0 + 1e-4)
                         for lev in batched["t"])
    run = make_run_steps_batched(consts, donate=False)
    ctx, _ = M.build_step_ctx(cal, 2, N_STEPS)
    out = run(batched, ctx)
    t0 = np.asarray(out["t"][0])  # time level 0, all members
    diff = np.abs(t0[0] - t0[1]).max()
    assert diff > 1e-6


def test_shard_map_transforms_match():
    """The explicit shard_map pencil transforms (one psum per direct
    transform, communication-free inverse) must match the single-device
    transforms on a latitude-sharded mesh."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pyspeedy_tpu.ops import spectral as S
    from pyspeedy_tpu.ops.geometry import build_geometry
    from pyspeedy_tpu.parallel.shard_transforms import (grid2spec_sharded,
                                                        spec2grid_sharded)

    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    geom = build_geometry(PARAMS)
    sp = S.build_spectral(PARAMS, geom, use_matmul_fft=True)
    mesh = make_mesh(n_ensemble=2, n_space=4)

    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.standard_normal((6, 48, 96)))
    g_sh = jax.device_put(g, NamedSharding(mesh, P(None, "space", None)))

    spec_ref = S.grid2spec(sp, g)
    spec_sh = grid2spec_sharded(sp, mesh, g_sh)
    np.testing.assert_allclose(np.asarray(spec_sh), np.asarray(spec_ref),
                               rtol=0, atol=1e-12)

    back_ref = S.spec2grid(sp, spec_ref, 2)
    back_sh = spec2grid_sharded(sp, mesh, spec_sh, 2)
    np.testing.assert_allclose(np.asarray(back_sh), np.asarray(back_ref),
                               rtol=0, atol=1e-12)


def test_sharded_full_model_nspace4():
    """Full model at n_space=4 (the deeper pencil decomposition): sharded
    execution over a 2x4 ensemble x space mesh must match unsharded."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    consts, state, cal = demo()

    batched = broadcast_state(state, 2)
    run = make_run_steps_batched(consts, donate=False)
    ctx, _ = M.build_step_ctx(dataclasses.replace(cal), 2, N_STEPS)
    ref = run(batched, ctx)

    mesh = make_mesh(n_ensemble=2, n_space=4)
    sharded = shard_ensemble(mesh, broadcast_state(state, 2))
    run_sh = make_run_steps_batched(consts, mesh=mesh, donate=False)
    ctx2, _ = M.build_step_ctx(dataclasses.replace(cal), 2, N_STEPS)
    out = run_sh(sharded, ctx2)

    for name in ("vor", "div", "t", "ps", "tr", "tt_rsw", "land_temp"):
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref[name]),
            rtol=0, atol=1e-10, err_msg=name)


def test_shard_transform_collective_counts():
    """The explicit shard_map pencil transforms must lower to exactly ONE
    all-reduce (the fold-weighted psum) for the direct transform and ZERO
    collectives for the inverse — the design contract of
    parallel/shard_transforms.py."""
    import re

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pyspeedy_tpu.ops import spectral as S
    from pyspeedy_tpu.ops.geometry import build_geometry
    from pyspeedy_tpu.parallel.shard_transforms import (grid2spec_sharded,
                                                        spec2grid_sharded)

    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    geom = build_geometry(PARAMS)
    sp = S.build_spectral(PARAMS, geom, use_matmul_fft=True)
    mesh = make_mesh(n_ensemble=2, n_space=4)

    g = jnp.zeros((6, 48, 96))
    g_sh = jax.device_put(g, NamedSharding(mesh, P(None, "space", None)))

    def count_collectives(fn, *args):
        txt = jax.jit(fn).lower(*args).compile().as_text()
        return {
            kind: len(re.findall(rf"%{kind}[.\d]* = ", txt))
            for kind in ("all-reduce", "all-gather", "all-to-all",
                         "collective-permute", "reduce-scatter")
        }

    c_dir = count_collectives(
        lambda x: grid2spec_sharded(sp, mesh, x), g_sh)
    assert c_dir["all-reduce"] == 1, c_dir
    assert sum(c_dir.values()) == 1, c_dir

    spec = grid2spec_sharded(sp, mesh, g_sh)
    c_inv = count_collectives(
        lambda s: spec2grid_sharded(sp, mesh, s, 2), spec)
    assert sum(c_inv.values()) == 0, c_inv


def test_sharded_physics_off_ephemeral_layout():
    """With physics off the EPHEMERAL fields pass through the batched runner
    at single-member shapes; the sharded path must keep replicated layouts
    for them (not constrain a member partition onto a non-member axis) and
    still match the unsharded run (round-3 advisor finding)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    consts, state, cal = demo()
    consts_off = dataclasses.replace(consts, physics_on=False)

    run = make_run_steps_batched(consts_off, donate=False)
    ctx, _ = M.build_step_ctx(dataclasses.replace(cal), 2, N_STEPS)
    ref = run(broadcast_state(state, 8), ctx)

    mesh = make_mesh(n_ensemble=4, n_space=2)
    sharded = shard_ensemble(mesh, broadcast_state(state, 8))
    run_sh = make_run_steps_batched(consts_off, mesh=mesh, donate=False)
    ctx2, _ = M.build_step_ctx(dataclasses.replace(cal), 2, N_STEPS)
    out = run_sh(sharded, ctx2)

    # Pass-through ephemerals keep their single-member shapes on both paths.
    assert out["hfluxn"].shape == state["hfluxn"].shape
    assert ref["hfluxn"].shape == state["hfluxn"].shape
    for name in ("vor", "div", "t", "ps"):
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref[name]),
            rtol=0, atol=1e-10, err_msg=name)


@pytest.mark.parametrize("phase,n_steps", [(2, 1), (1, 2), (2, 4)])
def test_short_aligned_runs_surface_ephemerals(phase, n_steps):
    """Physics-on batched runs of 1-2 steps starting at an SW-unaligned
    phase run entirely inside run_aligned's prefix (m == 0). The EPHEMERAL
    diagnostics are stripped from the input outside jit, so the last prefix
    step must return them member-batched — otherwise SpeedyEns members
    silently keep stale precnv/flux values (round-4 advisor finding).
    Reachable via SpeedyEns.run callbacks with 1-2-step intervals.
    The (2, 4) case covers m > 0 with a prefix (tail path, regression
    guard)."""
    consts, state, cal = demo()

    # Single-member reference for the same steps (traced-SW path).
    run1 = M.make_run_steps(consts)
    ctx, _ = M.build_step_ctx(dataclasses.replace(cal), phase, n_steps)
    ref = run1(dict(state), ctx)

    batched = broadcast_state(state, 2)
    run = make_run_steps_batched(consts, donate=False, phase=phase)
    ctx2, _ = M.build_step_ctx(dataclasses.replace(cal), phase, n_steps)
    out = run(batched, ctx2)

    for name in ("precnv", "hfluxn", "shf", "slr"):
        assert name in out, f"{name} missing from batched output"
        got = np.asarray(out[name])
        assert got.shape == (2,) + np.asarray(ref[name]).shape, name
        for m in range(2):
            # atol 1e-9 on O(100) W/m^2 fields: vmap GEMM reassociation
            # costs ~1e-13 absolute; stale values would differ by O(1).
            np.testing.assert_allclose(
                got[m], np.asarray(ref[name]), rtol=0, atol=1e-9,
                err_msg=f"{name} member {m}")


def test_sppt_batched_aligned_runs():
    """SPPT on the phase-specialized batched path: patterns are precomputed
    per scan triple (gen_sppt_n) — members must diverge, the AR(1) state
    must advance, and the pattern magnitude must respect the +-1 clip
    (checked indirectly: diagnostics stay clean)."""
    params = dataclasses.replace(PARAMS, sppt_on=True)
    from pyspeedy_tpu.testing import make_demo_model as mk
    consts, state, cal = mk(params)
    spec0 = np.asarray(state["sppt_spec"])

    batched = broadcast_state(state, 2)
    run = make_run_steps_batched(consts, donate=False, phase=2)
    ctx, _ = M.build_step_ctx(dataclasses.replace(cal), 2, 7)
    out = run(batched, ctx)

    assert not bool(np.asarray(out["error_flag"]).any())
    t0 = np.asarray(out["t"][0])
    assert np.abs(t0[0] - t0[1]).max() > 1e-10, "members must diverge"
    spec = np.asarray(out["sppt_spec"])
    assert spec.shape[0] == 2 and np.abs(spec).max() > 0
    assert not np.allclose(spec[0], spec0), "AR(1) state must advance"

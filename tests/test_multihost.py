"""Multi-process (multi-host analog) execution tests.

Drives tools/launch_multihost.py: two coordinated JAX processes, each with
two virtual CPU devices, integrate a sharded ensemble over a process-spanning
("ensemble", "space") mesh and compare against the single-member trajectory.
This exercises jax.distributed.initialize, the DCN-aware hybrid mesh, and
global-array construction — the exact code path of a real pod deployment
(SURVEY.md §2.4 scale-out design)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(REPO, "tools", "launch_multihost.py")


def _run(env_extra=None, timeout=900):
    env = dict(os.environ)
    # The launcher manages its own JAX_PLATFORMS / virtual-device flags.
    env.pop("XLA_FLAGS", None)
    env.update(env_extra or {})
    r = subprocess.run([sys.executable, LAUNCHER, "2", "2"],
                       capture_output=True, text=True, env=env,
                       timeout=timeout)
    lines = [json.loads(ln) for ln in r.stdout.splitlines()
             if ln.startswith("{")]
    return r.returncode, lines, r.stderr


@pytest.mark.slow
def test_two_process_ensemble_matches_single():
    rc, lines, err = _run()
    assert rc == 0, f"launcher failed:\n{err[-2000:]}"
    summary = lines[-1]
    assert summary["multihost_dryrun_ok"] is True
    workers = [l for l in lines if "process" in l]
    assert len(workers) == 2
    for w in workers:
        assert w["ok"] is True
        assert w["processes"] == 2 and w["devices"] == 4
        assert w["max_abs_err_vs_single"] < 1e-10


@pytest.mark.slow
def test_two_process_with_space_sharding():
    rc, lines, err = _run({"PYSPEEDY_N_SPACE": "2"})
    assert rc == 0, f"launcher failed:\n{err[-2000:]}"
    assert lines[-1]["multihost_dryrun_ok"] is True
    workers = [l for l in lines if "process" in l]
    assert all(w["mesh"] == {"ensemble": 2, "space": 2} for w in workers)

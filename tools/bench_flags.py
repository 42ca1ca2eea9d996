"""Measure batched-ensemble throughput under different XLA flag sets.

Usage: python tools/bench_flags.py  (runs each flag set in a subprocess)

The batched step is HBM-traffic bound on materialized intermediates; these
flags steer XLA-TPU's fusion/VMEM budget, which directly controls how much
of the chain stays on-chip.
"""

import json
import os
import subprocess
import sys

CHILD = r"""
import dataclasses, json, os, sys, time
import jax
os.makedirs("/tmp/pyspeedy_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/pyspeedy_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, %(repo)r)
from pyspeedy_tpu.models import model as M
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.testing import make_demo_model
from pyspeedy_tpu.parallel.ensemble import broadcast_state, make_run_steps_batched

n_members = int(os.environ.get("BENCH_MEMBERS", "256"))
params = dataclasses.replace(T30L8, precision="f32", fft_mode="matmul")
consts, state, cal = make_demo_model(params)
bstate = broadcast_state(state, n_members)
run = make_run_steps_batched(consts, donate=False, phase=2)
ctx, cal = M.build_step_ctx(cal, 2, 72)
t0 = time.time()
out = run(bstate, ctx); jax.block_until_ready(out)
compile_s = time.time() - t0
t0 = time.time()
out = run(bstate, ctx); jax.block_until_ready(out)
wall = time.time() - t0
print(json.dumps({"msps": n_members * 72 / wall, "wall": wall,
                  "compile_s": compile_s}))
"""

FLAG_SETS = {
    "baseline": "",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "no_msa": "--xla_tpu_enable_alternate_memory=false",
    "flat34": "--xla_tpu_memory_bound_loop_optimizer_options=enabled:false",
}


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sets = sys.argv[1:] or list(FLAG_SETS)
    for name in sets:
        flags = FLAG_SETS.get(name, name)
        env = dict(os.environ)
        if flags:
            env["LIBTPU_INIT_ARGS"] = flags
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        r = subprocess.run([sys.executable, "-c", CHILD % {"repo": repo}],
                           capture_output=True, text=True, env=env,
                           timeout=1200)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            res = json.loads(line)
        except json.JSONDecodeError:
            res = {"error": r.stderr.strip().splitlines()[-1:] or "?"}
        print(json.dumps({"flags": name, **res}), flush=True)


if __name__ == "__main__":
    main()

"""The committed docs/api tree must match a fresh render from the source
docstrings (the generated-docs analog of the reference's Sphinx autosummary
build; see tools/gen_api_docs.py)."""

import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_docs_up_to_date():
    with tempfile.TemporaryDirectory() as tmp:
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "gen_api_docs.py"),
             tmp],
            capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"}, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        committed = os.path.join(ROOT, "docs", "api")
        fresh = sorted(os.listdir(tmp))
        have = sorted(f for f in os.listdir(committed) if f.endswith(".md"))
        assert fresh == have, (set(fresh) ^ set(have))
        for f in fresh:
            with open(os.path.join(tmp, f)) as a, \
                    open(os.path.join(committed, f)) as b:
                assert a.read() == b.read(), (
                    f"docs/api/{f} is stale; run python tools/gen_api_docs.py")

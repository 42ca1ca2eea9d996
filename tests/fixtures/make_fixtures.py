"""Regenerate the golden regression fixtures (CPU, float64).

Run from the repo root:  python tests/fixtures/make_fixtures.py

These fixtures pin this implementation's own trajectory (1982-01-01 start,
default BCs, zero SST anomalies). The reference repository's fixtures were
produced with an SST-anomaly dataset that is absent from the reference
snapshot, so they can only be matched to the SST-sensitivity floor
(~1e-2 relative in wind after one day); see tests/test_speedy.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

from datetime import datetime  # noqa: E402

from pyspeedy_tpu import Speedy  # noqa: E402
from pyspeedy_tpu.callbacks import XarrayExporter  # noqa: E402


def main():
    out_dir = os.path.dirname(os.path.abspath(__file__))
    model = Speedy(start_date=datetime(1982, 1, 1),
                   end_date=datetime(1982, 1, 4))
    model.set_bc()
    model.run(callbacks=[XarrayExporter(interval=36, output_dir=out_dir,
                                        verbose=True)])


if __name__ == "__main__":
    sys.exit(main())

"""Export the model-state registry as a JSON artifact.

Parity with the reference's `export_model_state_json`
(registry/model_state_def.py:527-560), which ships the schema as
`pyspeedy/data/model_state.json`. The same facts drive the repo's
`MODEL_STATE_DEF` in-process dict; this tool materializes them on disk so
downstream tooling (and users migrating from the reference) can read the
schema without importing the package.

Usage: python tools/export_registry.py [out_path]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspeedy_tpu.registry import MODEL_STATE_VARS  # noqa: E402

# Fortran-style dtype strings matching the reference artifact's vocabulary
# (model_state_def.py VarDef dtypes).
_DTYPE = {"c": "complex(8)", "r": "real(8)", "i": "integer", "l": "logical"}


def registry_json() -> dict:
    out = {}
    for v in MODEL_STATE_VARS:
        out[v.name] = dict(
            dtype=_DTYPE[v.kind],
            dims=("(" + ", ".join(v.dims) + ")") if v.dims else None,
            desc=v.long_name,
            time_dim=v.time_dim,
            units=v.units,
            nc_dims=list(v.nc_dims) if v.nc_dims else None,
            alt_name=v.alt_name,
            std_name=v.std_name,
        )
    return out


def main():
    out_path = (sys.argv[1] if len(sys.argv) > 1 else
                os.path.join(REPO, "pyspeedy_tpu", "data",
                             "model_state.json"))
    with open(out_path, "w") as f:
        json.dump(registry_json(), f, indent=4)
        f.write("\n")
    print(f"Saved state definition: {out_path}")


if __name__ == "__main__":
    main()

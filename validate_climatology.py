"""Full-physics 1-year climatology validation (BASELINE config #3).

Runs 13 months from the bundled boundary conditions (first month discarded
as spinup), accumulates monthly means of key fields, and checks them against
broad climatological ranges. Prints a JSON report.

    python validate_climatology.py [--months N] [--f32]

On CPU (f64) a full year takes ~10 minutes; on TPU (f32) seconds.
"""

import argparse
import json
import sys
from datetime import datetime

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--months", type=int, default=13)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    import jax

    if jax.default_backend() == "cpu" and not args.f32:
        jax.config.update("jax_enable_x64", True)

    import dataclasses

    from pyspeedy_tpu import Speedy
    from pyspeedy_tpu.params import T30L8

    params = T30L8
    if args.f32 or jax.default_backend() != "cpu":
        params = dataclasses.replace(params, precision="f32",
                                     fft_mode="matmul")

    start = datetime(1981, 12, 1)
    end = datetime(1982, 12, 1) if args.months >= 13 else None
    months = args.months

    model = Speedy(start_date=start,
                   end_date=datetime(1983, 6, 1), params=params)
    model.set_bc()

    # step month by month, accumulating daily means after the first month
    tsfc_means = []
    prec_means = []
    toa_net = []
    days_done = 0
    for m in range(months):
        n_days = 30
        model._advance(n_days * params.nsteps)
        model._raise_if_failed()
        model.spectral2grid()
        if m == 0:
            continue  # spinup
        w = np.cos(np.deg2rad(model["lat"]))[None, :, None]
        wsum = w.sum() * 96  # total weight including the longitude count
        t_sfc = model["t_grid"][:, :, -1].T[None]  # (1, lat, lon)
        tsfc_means.append(float((t_sfc * w).sum() / wsum))
        prec = (model["precnv"] + model["precls"]).T[None]
        prec_means.append(float((prec * w).sum() / wsum) * 86.4)  # mm/day
        net = (model["tsr"] - model["olr"]).T[None]
        toa_net.append(float((net * w).sum() / wsum))
        days_done += n_days

    report = {
        "months_used": len(tsfc_means),
        "tsfc_mean_K": round(float(np.mean(tsfc_means)), 2),
        "tsfc_range_K": [round(min(tsfc_means), 2), round(max(tsfc_means), 2)],
        "precip_mean_mm_day": round(float(np.mean(prec_means)), 3),
        "toa_net_W_m2": round(float(np.mean(toa_net)), 2),
    }
    checks = {
        "tsfc_plausible": 270.0 < report["tsfc_mean_K"] < 295.0,
        "precip_plausible": 1.0 < report["precip_mean_mm_day"] < 6.0,
        "toa_balance": abs(report["toa_net_W_m2"]) < 40.0,
    }
    report["checks"] = checks
    report["ok"] = all(checks.values())
    print(json.dumps(report, indent=2))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

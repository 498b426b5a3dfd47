#!/usr/bin/env python
"""Monte-Carlo study of RTK integer-ambiguity resolution (solve/rtk.py).

Model-level trials (the estimator's own measurement model, like
tools/lattice_study.py does for the 4-SV code lattice): random satellite
subsets and epochs from the demo ephemerides, random baselines and noise
levels, known-truth integer ambiguities — measuring how often the ILS search
fixes correctly, how the ratio test separates success from failure, and the
fixed-baseline accuracy. The full-pipeline behavior (real tracker
observables) is pinned separately by tests/test_rtk.py.

Usage: python tools/rtk_study.py [--trials 300] [--seed 1]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from gypsum_tpu.core.constants import (  # noqa: E402
    GPS_L1_FREQUENCY_HZ,
    SPEED_OF_LIGHT_M_PER_S as C,
)
from gypsum_tpu.signal.scenarios import (  # noqa: E402
    DEMO_EPHEMERIDES,
    DEMO_GPS_START_SOW,
)
from gypsum_tpu.solve.geodesy import enu_basis, lla_to_ecef  # noqa: E402
from gypsum_tpu.solve.rtk import (  # noqa: E402
    DDObservations,
    _dd_rho,
    solve_baseline,
    sv_position_fn_from_ephemerides,
)

SCALE = 2.0 * GPS_L1_FREQUENCY_HZ / C  # m -> half-cycles


def run_trial(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    n_sats = int(rng.integers(5, 9))  # 5..8 (4 and fewer DDs rarely fix)
    idx = rng.choice(8, size=n_sats, replace=False)
    prns = [100 + int(i) for i in idx]  # synthetic ids, mapped below
    eph = {p: DEMO_EPHEMERIDES[i] for p, i in zip(prns, idx)}
    sv_fn = sv_position_fn_from_ephemerides(eph, DEMO_GPS_START_SOW)

    base = lla_to_ecef(51.5 + rng.uniform(-2, 2), -0.1 + rng.uniform(-2, 2),
                       rng.uniform(0, 400))
    east, north, up = enu_basis(base)
    length_m = float(10 ** rng.uniform(0.0, 3.7))  # 1 m .. 5 km
    az = rng.uniform(0, 2 * np.pi)
    truth = length_m * (np.cos(az) * east + np.sin(az) * north) + \
        rng.uniform(-0.1, 0.1) * length_m * up
    rover = base + truth

    duration = float(rng.uniform(20.0, 60.0))
    epochs = np.arange(2.0, duration, 1.0)
    ref, others = prns[-1], prns[:-1]
    sv_s = np.stack([[sv_fn(p, t) for p in others] for t in epochs])
    sv_r = np.stack([[sv_fn(ref, t)] for t in epochs])
    rho = _dd_rho(rover[None, None, :], base, sv_s, sv_r)

    sigma_code = float(rng.uniform(0.3, 1.2))
    sigma_phase = float(rng.uniform(0.01, 0.05))  # half-cycles
    a_true = rng.integers(-20000, 20000, size=len(others)).astype(float)
    dd = DDObservations(
        prns=others, ref_prn=ref, epochs_s=epochs,
        phase_half_cycles=(-SCALE * rho + a_true
                           + rng.normal(0, sigma_phase, rho.shape)),
        code_m=rho + rng.normal(0, sigma_code, rho.shape),
    )
    sol = solve_baseline(dd, sv_fn, base, sigma_code_m=sigma_code,
                         sigma_phase_half_cycles=sigma_phase)
    correct = bool(np.array_equal(sol.ambiguities, a_true))
    return {
        "seed": seed,
        "n_sats": n_sats,
        "baseline_m": length_m,
        "epochs": len(epochs),
        "sigma_code": sigma_code,
        "sigma_phase": sigma_phase,
        "ratio": sol.ratio,
        "bootstrap": sol.bootstrap_success,
        "ratio_only_fixed": sol.ratio >= 2.0,
        "declared_fixed": sol.fixed,
        "ints_correct": correct,
        "err_fixed_m": float(np.linalg.norm(sol.baseline_fixed_m - truth)),
        "err_float_m": float(np.linalg.norm(sol.baseline_float_m - truth)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=300)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    rows = [run_trial(args.seed * 100000 + k) for k in range(args.trials)]

    def rate(rs):
        return 100.0 * sum(r["ints_correct"] for r in rs) / max(len(rs), 1)

    declared = [r for r in rows if r["declared_fixed"]]
    wrong_but_declared = [r for r in declared if not r["ints_correct"]]
    ratio_only = [r for r in rows if r["ratio_only_fixed"]]
    wrong_ratio_only = [r for r in ratio_only if not r["ints_correct"]]
    print(f"{len(rows)} trials: integer set correct in {rate(rows):.1f}%")
    print(f"ratio-only gate (>= 2): {len(ratio_only)} declared, "
          f"{len(wrong_ratio_only)} wrong "
          f"({100 * len(wrong_ratio_only) / max(len(ratio_only), 1):.2f}%)")
    print(f"dual gate (ratio + bootstrap >= 0.99): {len(declared)} declared "
          f"({100 * len(declared) / len(rows):.1f}%), of which wrong: "
          f"{len(wrong_but_declared)} "
          f"({100 * len(wrong_but_declared) / max(len(declared), 1):.2f}%)")
    ok = [r for r in declared if r["ints_correct"]]
    if ok:
        errs = np.array([r["err_fixed_m"] for r in ok])
        print(f"fixed-and-correct baseline error: median "
              f"{np.median(errs) * 1e3:.2f} mm, p95 {np.percentile(errs, 95) * 1e3:.2f} mm")
    for lo, hi in ((1, 10), (10, 100), (100, 1000), (1000, 5500)):
        band = [r for r in rows if lo <= r["baseline_m"] < hi]
        if band:
            d = [r for r in band if r["declared_fixed"] and r["ints_correct"]]
            print(f"  baseline {lo:>4}-{hi:<4} m: {len(band):3d} trials, "
                  f"correct {rate(band):5.1f}%, fixed-and-correct "
                  f"{100 * len(d) / len(band):5.1f}%")
    if wrong_but_declared:
        worst = sorted(wrong_but_declared, key=lambda r: -r["ratio"])[:5]
        print("wrong-but-declared seeds:",
              [(r["seed"], round(r["ratio"], 2)) for r in worst])
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

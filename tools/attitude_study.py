#!/usr/bin/env python
"""Monte-Carlo study of length-constrained attitude fixing (solve/attitude.py).

Model-level trials (the estimator's own measurement model, like
tools/rtk_study.py for free baselines): random satellite subsets, random
rigid-arm orientations/sweeps, deliberately SHORT observation windows — the
regime where the plain ratio test is often indecisive — measuring:

- how often the dual ratio+bootstrap gate fixes on its own,
- how often the known-separation gate ARBITRATES a fix the ratio gate
  refused (``fixed_by='length'``),
- whether either path ever publishes a WRONG attitude (the number that
  must be zero), and
- heading accuracy on the fixes.

Usage: python tools/attitude_study.py [--trials 300] [--seed 1]
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
from gypsum_tpu.solve.attitude import solve_attitude  # noqa: E402
from gypsum_tpu.solve.geodesy import enu_basis, lla_to_ecef  # noqa: E402
from gypsum_tpu.solve.rtk import (  # noqa: E402
    DDObservations,
    _dd_rho,
    sv_position_fn_from_ephemerides,
)

SCALE = 2.0 * GPS_L1_FREQUENCY_HZ / C  # m -> half-cycles


def run_trial(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    n_sats = int(rng.integers(4, 7))  # 4..6: lean geometries
    idx = rng.choice(8, size=n_sats, replace=False)
    prns = [100 + int(i) for i in idx]
    eph = {p: DEMO_EPHEMERIDES[i] for p, i in zip(prns, idx)}
    sv_fn = sv_position_fn_from_ephemerides(eph, DEMO_GPS_START_SOW)

    antenna1 = lla_to_ecef(51.5 + rng.uniform(-2, 2), -0.1 + rng.uniform(-2, 2),
                           rng.uniform(0, 400))
    east, north, up = enu_basis(antenna1)
    sep = float(rng.uniform(0.5, 5.0))
    # Short window: 4..10 epochs at 1 Hz — deliberately ratio-hostile.
    T = int(rng.integers(4, 11))
    epochs = np.arange(2.0, 2.0 + T, 1.0)
    h0 = rng.uniform(0, 360.0)
    rate = rng.uniform(-4.0, 4.0)  # deg/s platform rotation
    headings = h0 + rate * (epochs - epochs[0])
    pitch = rng.uniform(-15.0, 15.0)

    hz, pz = np.radians(headings), np.radians(pitch)
    arm = (np.cos(pz) * (np.sin(hz)[:, None] * east + np.cos(hz)[:, None] * north)
           + np.sin(pz) * up)
    rover_t = antenna1 + sep * arm

    ref, others = prns[-1], prns[:-1]
    sv_s = np.stack([[sv_fn(p, t) for p in others] for t in epochs])
    sv_r = np.stack([[sv_fn(ref, t)] for t in epochs])
    rho = np.stack([
        _dd_rho(rover_t[t][None, None, :], antenna1,
                sv_s[t : t + 1], sv_r[t : t + 1, 0:1, :])[0]
        for t in range(T)
    ])

    sigma_phase = float(10 ** rng.uniform(-2.3, -1.7))  # 0.005..0.02 hc
    a_true = rng.integers(-30, 30, size=len(others)).astype(float)
    dd = DDObservations(
        prns=others, ref_prn=ref, epochs_s=epochs,
        phase_half_cycles=-SCALE * rho + a_true
        + rng.normal(0, sigma_phase, rho.shape),
        code_m=rho + rng.normal(0, 0.6, rho.shape),
    )
    sol = solve_attitude(dd, sv_fn, antenna1, separation_m=sep,
                         sigma_phase_half_cycles=sigma_phase)
    err = (np.abs((sol.heading_deg - headings + 180.0) % 360.0 - 180.0)
           if sol.fixed else np.array([np.nan]))
    ints_right = sol.fixed and np.array_equal(sol.ambiguities, a_true)
    return {
        "fixed_by": sol.fixed_by,
        "ratio": sol.ratio,
        "ints_right": bool(ints_right),
        "wrong_fix": bool(sol.fixed and not ints_right),
        "max_heading_err_deg": float(np.max(err)),
        "n_sats": n_sats,
        "T": T,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=300)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    results = [run_trial(args.seed * 100003 + k) for k in range(args.trials)]
    by = {k: [r for r in results if r["fixed_by"] == k]
          for k in ("ratio", "length", None)}
    wrong = [r for r in results if r["wrong_fix"]]
    fixed = [r for r in results if r["fixed_by"] is not None]
    errs = np.array([r["max_heading_err_deg"] for r in fixed])

    n = len(results)
    print(f"trials: {n}")
    print(f"fixed by ratio gate:   {len(by['ratio']):4d} ({len(by['ratio'])/n:6.1%})")
    print(f"fixed by length gate:  {len(by['length']):4d} ({len(by['length'])/n:6.1%})"
          "  <- rescued where the ratio test was indecisive")
    print(f"unfixed (honest):      {len(by[None]):4d} ({len(by[None])/n:6.1%})")
    print(f"WRONG fixes:           {len(wrong):4d}  (must be 0)")
    if len(fixed):
        print(f"heading error on fixes: median {np.median(errs):.3f} deg, "
              f"worst {np.max(errs):.3f} deg")
    return 1 if wrong else 0


if __name__ == "__main__":
    raise SystemExit(main())

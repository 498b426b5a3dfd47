"""Measure the 4-SV integer-millisecond ambiguity rate (VERDICT round-1
item 7: "measure, don't just design").

Monte Carlo over random 4-satellite geometries and slip patterns: for each
trial, build geometrically consistent transit times from a random receiver
position and 4 random demo-ephemeris satellites, inject a random non-zero
integer-ms slip pattern, enumerate the canonical lattice
(solve/world.py:enumerate_4sv_hypotheses), and classify:

- unique_correct : exactly one plausible hypothesis and it recovers truth
- unique_wrong   : exactly one plausible hypothesis but it is NOT the truth
- ambiguous      : several plausible positions (the tie-break's territory)
- none_plausible : the enumeration found nothing (slip beyond +/-1 ms, or
                   truth itself outside the shell)

For ambiguous trials it also reports whether the prior-fix proximity
tie-break (choose the hypothesis within 50 km of the true position, i.e. a
receiver with any fix history) would commit the CORRECT hypothesis — the
safety question for WorldModel's tie-break.

Usage: python tools/lattice_study.py --trials 500
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run_study(trials: int, seed0: int = 0) -> dict:
    from gypsum_tpu.core.constants import SPEED_OF_LIGHT_M_PER_S as C
    from gypsum_tpu.signal.scenarios import DEMO_EPHEMERIDES, DEMO_GPS_START_SOW
    from gypsum_tpu.solve.ephemeris import satellite_position
    from gypsum_tpu.solve.geodesy import lla_to_ecef
    from gypsum_tpu.solve.world import enumerate_4sv_hypotheses

    counts = {"unique_correct": 0, "unique_wrong": 0,
              "ambiguous": 0, "none_plausible": 0}
    tiebreak = {"correct": 0, "wrong": 0, "abstains": 0}
    n_visible_fail = 0

    for k in range(trials):
        rng = np.random.default_rng(seed0 + k)
        rx = lla_to_ecef(
            51.5 + rng.uniform(-3, 3), -0.1 + rng.uniform(-3, 3),
            rng.uniform(0, 500),
        )
        up = rx / np.linalg.norm(rx)
        # Random 4 of the visible demo slots (0-7 are above the horizon near
        # the demo site).
        slots = rng.choice(8, size=4, replace=False)
        t = DEMO_GPS_START_SOW + rng.uniform(0, 60.0)
        sat_pos = np.array(
            [satellite_position(DEMO_EPHEMERIDES[s], t) for s in slots]
        )
        els = [
            np.degrees(np.arcsin(np.dot((p - rx) / np.linalg.norm(p - rx), up)))
            for p in sat_pos
        ]
        if min(els) < 5.0:
            n_visible_fail += 1
            continue
        bias_true = rng.uniform(-2e-3, 2e-3)
        transit_true = np.linalg.norm(sat_pos - rx[None, :], axis=1) / C + bias_true
        # Non-zero canonical slip (dk[0]=0 absorbed by bias).
        while True:
            dk_true = rng.integers(-1, 2, size=4)
            dk_true[0] = 0
            if dk_true.any():
                break
        transit_slipped = transit_true + dk_true * 1e-3

        groups = enumerate_4sv_hypotheses(sat_pos, transit_slipped, 20)
        positions = [g[2] for g in groups.values()]
        correct = [p for p in positions if np.linalg.norm(p - rx) < 1_000.0]
        if not groups:
            counts["none_plausible"] += 1
        elif len(groups) == 1:
            if correct:
                counts["unique_correct"] += 1
            else:
                counts["unique_wrong"] += 1
        else:
            counts["ambiguous"] += 1
            near = [p for p in positions if np.linalg.norm(p - rx) < 50_000.0]
            if len(near) == 1 and correct:
                tiebreak["correct"] += 1
            elif len(near) == 1:
                tiebreak["wrong"] += 1
            else:
                tiebreak["abstains"] += 1

    total = trials - n_visible_fail
    return {
        "trials": total,
        "skipped_low_elevation": n_visible_fail,
        "counts": counts,
        "rates": {k: v / max(total, 1) for k, v in counts.items()},
        "tiebreak_on_ambiguous": tiebreak,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--trials", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = run_study(args.trials, args.seed)
    print(json.dumps(out, indent=2))
    # The tie-break must never pick a wrong hypothesis.
    return 1 if out["tiebreak_on_ambiguous"]["wrong"] else 0


if __name__ == "__main__":
    sys.exit(main())

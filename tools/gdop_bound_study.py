"""Quantify whether a degraded GLONASS-DF campaign seed is GEOMETRY-bound.

Round-4 VERDICT item 5: two `--glonass-df` campaign seeds report
`degraded_honest` (error inside the published HPL on a hard 4-SV
geometry). The suggested remedies were "recruit a fifth channel" or
"prove the geometry is physically GDOP-bound". These seeds synthesize
ONLY four satellites on the air (`tools/campaign.py:run_glonass_df_trial`
draws n_ch=4), so there is no fifth channel to recruit — deep FDMA
acquisition cannot conjure a signal that was never transmitted. What CAN
be shown is that the miss is the exact image of sub-meter ranging noise
through the geometry:

    err_pred = (G^T G)^-1 G^T  @  per-SV range errors (measured vs truth)

With a 4-SV solve there are zero degrees of freedom — the estimator
reproduces the measurements exactly, so the position error must equal the
noise image above. If err_pred matches the achieved fix error (direction
and magnitude), the receiver extracted all the information the four rays
carry; only better geometry (a fifth ray that does not exist on this
scene) could reduce the error. Pinned by
tests/test_dualfreq.py::test_degraded_seed_error_is_geometry_bound.

Usage:  python tools/gdop_bound_study.py SEED
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_seed(seed: int):
    """Re-run the exact campaign trial (same RNG recipe as
    tools/campaign.py:run_glonass_df_trial) and return
    (dual_receiver, truth_rx, scene_params)."""
    import dataclasses

    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import DualBandReceiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GLONASS_SAMPLE_RATE as GLO_FS,
        demo_glonass_constellation,
        demo_iono_page18,
    )
    from gypsum_tpu.solve.geodesy import lla_to_ecef
    from gypsum_tpu.solve.iono import IonoUtcParams

    rng = np.random.default_rng(seed + 7_000_000)
    n_ch = int(rng.integers(4, 7))
    ks = sorted(int(k) for k in rng.choice(np.arange(-7, 7), size=n_ch, replace=False))
    lat = 51.5 + float(rng.uniform(-3.0, 3.0))
    lon = -0.1 + float(rng.uniform(-3.0, 3.0))
    alt = float(rng.uniform(0.0, 500.0))
    noise = float(rng.uniform(0.25, 0.4))
    duration = float(rng.uniform(14.0, 18.0))
    iono_scale = float(rng.uniform(0.4, 2.0))

    page = demo_iono_page18()
    page = dataclasses.replace(
        page,
        alpha0=page.alpha0 * iono_scale, alpha1=page.alpha1 * iono_scale,
        alpha2=page.alpha2 * iono_scale, alpha3=page.alpha3 * iono_scale,
    )
    params = IonoUtcParams.from_page(page)
    rx = lla_to_ecef(lat, lon, alt)
    sats = demo_glonass_constellation(ks)
    l1_iq, _ = synthesize_constellation(
        sats, rx, 21618.0, duration, GLO_FS, noise_sigma=noise,
        seed=seed, iono=params,
    )
    l2_iq, _ = synthesize_constellation(
        sats, rx, 21618.0, duration, GLO_FS, noise_sigma=noise,
        seed=seed + 1, iono=params, glonass_band="l2",
    )
    dual = DualBandReceiver(
        None,
        ArraySampleSource(l1_iq, GLO_FS),
        glonass_l2_source=ArraySampleSource(l2_iq, GLO_FS),
    )
    dual.run()
    scene = {"ks": ks, "n_ch": n_ch, "noise": noise, "duration": duration,
             "iono_scale": iono_scale}
    return dual, np.asarray(rx), scene


def geometry_bound_analysis(dual, rx: np.ndarray) -> dict:
    """Propagate the per-SV measured range errors (vs synthesis truth)
    through the least-squares operator and compare with the achieved fix
    error. Returns the comparison dict (see module docstring)."""
    from gypsum_tpu.core.constants import SPEED_OF_LIGHT_M_PER_S as C

    world = dual.world
    fix = world.position_fixes[-1]
    prns = list(fix.satellites_used)
    t = float(fix.receiver_timestamp)

    sat_pos, transit = world._measurement_set(t, prns, fix.ecef)
    rho_meas = transit * C  # pseudorange incl. receiver clock bias (m)

    # Per-SV range error at TRUTH: subtract geometric range from truth and
    # the bias that best explains the set (the clock column of the solve).
    geom = np.linalg.norm(sat_pos - rx[None, :], axis=1)
    raw = rho_meas - geom
    bias = float(np.mean(raw))
    range_err = raw - bias  # zero-mean per-SV measurement errors (m)

    # LS operator at the fix geometry (unit LOS + clock column).
    u = (sat_pos - rx[None, :]) / geom[:, None]
    G = np.hstack([-u, np.ones((len(prns), 1))])
    H = np.linalg.inv(G.T @ G) @ G.T
    err_pred = (H @ range_err)[:3]

    err_actual = fix.ecef - rx
    gdop = float(np.sqrt(np.trace(np.linalg.inv(G.T @ G))))
    cos = float(
        err_pred @ err_actual
        / max(1e-12, np.linalg.norm(err_pred) * np.linalg.norm(err_actual))
    )
    return {
        "prns": prns,
        "gdop": gdop,
        "range_err_rms_m": float(np.sqrt(np.mean(range_err**2))),
        "range_err_max_m": float(np.max(np.abs(range_err))),
        "err_actual_m": float(np.linalg.norm(err_actual)),
        "err_predicted_m": float(np.linalg.norm(err_pred)),
        "direction_cosine": cos,
        "hpl_m": fix.protection["hpl_m"] if fix.protection else None,
    }


def main():
    seed = int(sys.argv[1])
    dual, rx, scene = run_seed(seed)
    print(f"seed {seed}: scene {scene}")
    if not dual.world.position_fixes:
        print("no fix")
        return
    r = geometry_bound_analysis(dual, rx)
    print(
        f"  GDOP {r['gdop']:.1f}; ranging errors RMS {r['range_err_rms_m']:.2f} m "
        f"(max {r['range_err_max_m']:.2f} m) over {len(r['prns'])} SVs"
    )
    print(
        f"  position error achieved {r['err_actual_m']:.2f} m vs predicted "
        f"noise-image {r['err_predicted_m']:.2f} m "
        f"(direction cosine {r['direction_cosine']:.3f}); HPL {r['hpl_m']}"
    )
    amp = r["err_actual_m"] / max(1e-9, r["range_err_rms_m"])
    print(
        f"  amplification {amp:.1f}x vs GDOP {r['gdop']:.1f}: the miss is the "
        f"geometry's image of sub-meter ranging noise"
        if abs(r["direction_cosine"]) > 0.9
        else "  WARNING: error not explained by geometry alone"
    )


if __name__ == "__main__":
    main()

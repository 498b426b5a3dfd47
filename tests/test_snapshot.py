"""Snapshot (coarse-time) positioning tests — solve/snapshot.py.

The reference cannot fix without ~18-30 s of decode; these tests pin the
assisted-start path: a fix from ONE acquisition's code phases plus stored
orbits and coarse priors, including recovery of the coarse-time error."""

import numpy as np
import pytest

from gypsum_tpu.signal.scenarios import (
    DEMO_EPHEMERIDES,
    DEMO_GPS_START_SOW,
    DEMO_PRNS_8,
    demo_constellation,
    demo_receiver_ecef,
)
from gypsum_tpu.solve.ephemeris import clock_correction, satellite_position
from gypsum_tpu.solve.snapshot import (
    SnapshotMeasurement,
    orbit_fn_from_ephemerides,
    snapshot_fix,
)

C = 299792458.0
T0 = DEMO_GPS_START_SOW
RX = demo_receiver_ecef()
EPH = {p: DEMO_EPHEMERIDES[i] for i, p in enumerate(DEMO_PRNS_8)}


def _true_fractions(rx, t_true, prns, bias_s=2.3e-4):
    """Exact sub-ms pseudorange fractions for satellites at true time: the
    same light-time/clock convention the synthesizer bakes into captures."""
    out = []
    for p in prns:
        tau = 0.075
        for _ in range(4):
            pos = satellite_position(EPH[p], t_true - tau)
            tau = np.linalg.norm(pos - rx) / C
        dtsv = float(clock_correction(EPH[p], t_true - tau))
        frac = (tau - dtsv + bias_s) % 1e-3
        out.append(SnapshotMeasurement(prn=p, code_phase_fraction_s=frac))
    return out


def test_snapshot_recovers_position_and_time():
    meas = _true_fractions(RX, T0, DEMO_PRNS_8)
    coarse_pos = RX + np.array([30e3, -25e3, 18e3])  # ~43 km of prior error
    sol = snapshot_fix(
        meas, orbit_fn_from_ephemerides(EPH), T0 + 5.0, coarse_pos
    )
    assert sol is not None
    err = np.linalg.norm(sol.ecef - RX)
    assert err < 2.0, f"snapshot error {err:.2f} m on exact measurements"
    # The 5 s coarse-time error is recovered through satellite range rates.
    assert abs(sol.time_correction_s + 5.0) < 0.05
    assert sol.residual_rms_m < 1.0


def test_snapshot_four_satellites_known_time():
    meas = _true_fractions(RX, T0, DEMO_PRNS_8[:4])
    sol = snapshot_fix(
        meas, orbit_fn_from_ephemerides(EPH), T0, RX + np.array([20e3, 10e3, -5e3]),
        solve_time=False,
    )
    assert sol is not None
    assert np.linalg.norm(sol.ecef - RX) < 2.0
    # And 4 satellites cannot support the time state.
    assert snapshot_fix(meas, orbit_fn_from_ephemerides(EPH), T0, RX) is None


def test_snapshot_out_of_basin_is_not_silently_wrong():
    meas = _true_fractions(RX, T0, DEMO_PRNS_8)
    far = RX + np.array([600e3, -400e3, 0.0])  # outside the 150 km basin
    sol = snapshot_fix(meas, orbit_fn_from_ephemerides(EPH), T0, far)
    if sol is not None and np.linalg.norm(sol.ecef - RX) > 1e3:
        # A wrong integer set must reveal itself in the residuals.
        assert sol.residual_rms_m > 100.0


def test_snapshot_from_real_acquisition():
    """End-to-end: 10 ms of synthesized IQ -> acquisition engine -> snapshot
    fix, with deliberate 40 km / 4 s priors. Accuracy is bounded by the
    engine's integer-sample code phase (1 sample = 147 m of range)."""
    from gypsum_tpu.acquire.engine import AcquisitionEngine
    from gypsum_tpu.signal.constellation import synthesize_constellation

    FS = 2.046e6
    iq, truth = synthesize_constellation(
        demo_constellation(DEMO_PRNS_8), RX, T0, 0.05, FS,
        noise_sigma=0.35, seed=21, tropo=False,
    )
    engine = AcquisitionEngine(sample_rate=FS, samples_per_prn=2046)
    hits = engine.detect(iq[: 10 * 2046].reshape(10, 2046))
    hits = [h for h in hits if h.prn in DEMO_PRNS_8]
    assert len(hits) >= 6
    meas = [
        SnapshotMeasurement(
            prn=h.prn,
            code_phase_fraction_s=h.code_phase_samples / FS,
            doppler_hz=h.doppler_hz,
        )
        for h in hits
    ]
    sol = snapshot_fix(
        meas,
        orbit_fn_from_ephemerides(EPH),
        T0 + 4.0,
        RX + np.array([-30e3, 20e3, 15e3]),
    )
    assert sol is not None
    err = np.linalg.norm(sol.ecef - RX)
    assert err < 400.0, f"snapshot fix error {err:.0f} m"
    assert abs(sol.time_correction_s + 4.0) < 0.5


def test_snapshot_from_almanac_grade_orbits():
    """Warm start with only an almanac (no precise ephemerides): the
    snapshot fix degrades to almanac-grade accuracy (km-scale orbit error)
    but still produces a usable position — the assisted-start scenario
    where orbits came from a days-old broadcast."""
    from gypsum_tpu.solve.almanac import (
        almanac_page_from_ephemeris,
        ephemeris_from_almanac,
    )

    week = next(iter(EPH.values())).week_number
    degraded = {
        p: ephemeris_from_almanac(almanac_page_from_ephemeris(p, e), week)
        for p, e in EPH.items()
    }
    meas = _true_fractions(RX, T0, DEMO_PRNS_8)  # truth from PRECISE orbits
    sol = snapshot_fix(
        meas, orbit_fn_from_ephemerides(degraded), T0 + 3.0,
        RX + np.array([25e3, -20e3, 10e3]),
    )
    assert sol is not None
    err = np.linalg.norm(sol.ecef - RX)
    # Almanac pages quantize e/sqrtA/Omega/M0 etc: few-km orbit errors map
    # to km-scale position error — still far inside the integer-ms basin.
    assert err < 8_000.0, f"almanac snapshot error {err:.0f} m"
    assert abs(sol.time_correction_s + 3.0) < 2.0
    assert sol.residual_rms_m < 5_000.0

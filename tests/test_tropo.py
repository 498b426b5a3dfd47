"""Saastamoinen tropospheric correction (solve/tropo.py).

Non-dispersive ~2.4 m zenith / ~10 m low-elevation delay — the reference
applies no atmospheric model at all. The e2e test injects the model in the
synthesizer and shows the solver's correction removes it.
"""

from __future__ import annotations

import numpy as np
import pytest

from gypsum_tpu.solve.tropo import saastamoinen_delay_m, tropo_delay_s


def test_zenith_delay_magnitude():
    d = saastamoinen_delay_m(90.0, 0.0)
    assert 2.2 < d < 2.7, d  # textbook sea-level zenith total delay


def test_obliquity_and_altitude():
    # Lower elevation -> longer slant path.
    assert saastamoinen_delay_m(10.0) > 2.0 * saastamoinen_delay_m(30.0) > 0
    # Higher site -> thinner atmosphere above it.
    assert saastamoinen_delay_m(90.0, 3000.0) < saastamoinen_delay_m(90.0, 0.0)
    # Seconds conversion.
    assert tropo_delay_s(90.0) == pytest.approx(
        saastamoinen_delay_m(90.0) / 299_792_458.0
    )


def test_solver_level_correction_is_exact():
    """Noise-free geometry: transits carrying the injected Saastamoinen
    delays must solve metres off uncorrected and to ~zero with the
    correction (same model both sides). This is the precision statement;
    the e2e chain (below) can only verify the DISPLACEMENT, because the
    receiver's per-SV sub-sample code-measurement floor (~±2 m) exceeds
    the tropospheric differential across a typical sky."""
    from gypsum_tpu.signal.scenarios import DEMO_EPHEMERIDES, DEMO_GPS_START_SOW
    from gypsum_tpu.solve.ephemeris import satellite_position
    from gypsum_tpu.solve.fix import solve_position
    from gypsum_tpu.solve.geodesy import ecef_to_lla, elevation_azimuth, lla_to_ecef

    c_mps = 299_792_458.0
    rx = lla_to_ecef(51.5, -0.1, 80.0)
    t = DEMO_GPS_START_SOW
    sat_pos = np.array(
        [satellite_position(DEMO_EPHEMERIDES[s], t) for s in (0, 1, 2, 3)]
    )
    els = [elevation_azimuth(rx, p)[0] for p in sat_pos]
    meas = (
        np.linalg.norm(sat_pos - rx, axis=1) / c_mps
        + 1.7e-3
        + np.array([tropo_delay_s(e, 80.0) for e in els])
    )
    p0, _ = solve_position(sat_pos, meas)
    err_uncorrected = np.linalg.norm(p0 - rx)
    assert err_uncorrected > 2.0, err_uncorrected

    corr = meas.copy()
    for i in range(4):
        el, _az = elevation_azimuth(p0, sat_pos[i])
        corr[i] -= tropo_delay_s(el, ecef_to_lla(p0)[2])
    p1, _ = solve_position(sat_pos, corr)
    assert np.linalg.norm(p1 - rx) < 0.05


def test_e2e_tropo_correction_displacement():
    """End to end, the correction must move the fix by the model's
    predicted direction and magnitude: mostly DOWN in altitude by roughly
    the zenith delay for this geometry. (An absolute
    corrected-beats-uncorrected assertion is not statistically meaningful
    at the receiver's ±2 m per-SV measurement floor.)"""
    from gypsum_tpu.core.config import ReceiverConfig, SolverConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
    from gypsum_tpu.solve.geodesy import ecef_to_lla, lla_to_ecef

    rx = lla_to_ecef(51.5, -0.1, 80.0)
    iq, _ = synthesize_constellation(
        demo_constellation([25, 28, 31, 32]), rx, DEMO_GPS_START_SOW, 24.0,
        2.046e6, noise_sigma=0.3,  # tropo injected by default
    )

    def final_alt(apply):
        cfg = ReceiverConfig(solver=SolverConfig(apply_tropo_correction=apply))
        recv = Receiver(ArraySampleSource(iq, 2.046e6), cfg)
        recv.run()
        assert recv.world.position_fixes, "no fix"
        alts = [ecef_to_lla(f.ecef)[2] for f in recv.world.position_fixes]
        err = float(np.linalg.norm(recv.world.position_fixes[-1].ecef - rx))
        assert err < 30.0, err  # both variants stay well within bounds
        return float(np.mean(alts))

    delta_alt = final_alt(True) - final_alt(False)
    # The model predicts roughly -2..-6 m for this sky (isolated solve:
    # -4.0 m); the displacement is deterministic, so the band is tight.
    assert -7.0 < delta_alt < -1.5, delta_alt

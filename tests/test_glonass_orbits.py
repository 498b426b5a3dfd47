"""GLONASS ephemeris / orbit-propagation tests (solve/glonass.py)."""

import numpy as np
import pytest

from gypsum_tpu.solve.geodesy import elevation_azimuth, lla_to_ecef
from gypsum_tpu.solve.glonass import (
    GlonassEphemeris,
    glonass_clock_ahead_s,
    glonass_day_time_from_gps_sow,
    glonass_ephemeris_from_look,
    glonass_ephemeris_from_strings,
    glonass_satellite_position,
    glonass_satellite_velocity,
    gps_sow_from_glonass_day_time,
    propagate_state,
    strings_from_glonass_ephemeris,
)

RX = lla_to_ecef(51.5, -0.1, 80.0)


def _eph(k: int = 0, el: float = 55.0, az: float = 120.0) -> GlonassEphemeris:
    return glonass_ephemeris_from_look(
        RX, el, az, frequency_number=k, tb_day_s=45 * 900.0,
        tau_n_s=2.5e-5, gamma_n=1.8e-11, slot=9, heading_deg=40.0,
    )


def test_string_roundtrip_preserves_ephemeris():
    eph = _eph()
    strings = strings_from_glonass_ephemeris(eph)
    from gypsum_tpu.nav.glonass import encode_string, kx_verify, parse_string

    reparsed = {}
    for m, s in strings.items():
        bits = encode_string(s)
        ok, corrected, _ = kx_verify(bits)
        assert ok
        reparsed[m] = parse_string(corrected)
    back = glonass_ephemeris_from_strings(
        reparsed[1], reparsed[2], reparsed[3], reparsed[4], frequency_number=eph.frequency_number
    )
    # from_look already quantized through the broadcast fields, so the
    # round trip is EXACT.
    assert back == eph


def test_propagation_is_reversible():
    eph = _eph()
    t1 = eph.tb_day_s + 870.0
    pos1, vel1 = propagate_state(eph, t1, step_s=30.0)
    back = GlonassEphemeris(
        frequency_number=eph.frequency_number, tb_day_s=t1,
        pos_m=tuple(pos1), vel_mps=tuple(vel1), acc_mps2=eph.acc_mps2,
    )
    pos0, vel0 = propagate_state(back, eph.tb_day_s, step_s=30.0)
    assert np.linalg.norm(pos0 - np.array(eph.pos_m)) < 1e-3  # < 1 mm
    assert np.linalg.norm(vel0 - np.array(eph.vel_mps)) < 1e-6


def test_propagation_matches_adaptive_integrator():
    from scipy.integrate import solve_ivp

    from gypsum_tpu.solve.glonass import _acceleration

    eph = _eph(el=30.0, az=300.0)
    t1 = eph.tb_day_s + 900.0
    acc = np.asarray(eph.acc_mps2)
    sol = solve_ivp(
        lambda t, y: _acceleration(y, acc),
        (eph.tb_day_s, t1),
        np.array([*eph.pos_m, *eph.vel_mps]),
        rtol=1e-12, atol=1e-9,
    )
    pos_rk4, vel_rk4 = propagate_state(eph, t1, step_s=30.0)
    assert np.linalg.norm(pos_rk4 - sol.y[:3, -1]) < 1e-2  # < 1 cm over 15 min
    assert np.linalg.norm(vel_rk4 - sol.y[3:, -1]) < 1e-5


def test_orbit_stays_near_radius_and_j2_matters():
    eph = _eph()
    r0 = np.linalg.norm(eph.pos_m)
    pos, _ = propagate_state(eph, eph.tb_day_s + 900.0)
    # Circular construction: radius drifts < 20 km over 15 min.
    assert abs(np.linalg.norm(pos) - r0) < 20e3
    # Dropping J2 moves the 15-minute position by meters — the term is real.
    import gypsum_tpu.solve.glonass as g

    class NoJ2(GlonassEphemeris):
        pass

    import unittest.mock as mock

    with mock.patch.object(g, "PZ90_J2", 0.0):
        pos_noj2, _ = propagate_state(eph, eph.tb_day_s + 900.0)
    assert 1.0 < np.linalg.norm(pos - pos_noj2) < 5e3


def test_look_geometry_and_doppler_plausible():
    eph = _eph(k=3, el=55.0, az=120.0)
    pos = glonass_satellite_position(eph, eph.tb_day_s)
    el, az = elevation_azimuth(RX, pos)
    assert abs(el - 55.0) < 0.5 and abs(az - 120.0) < 0.5
    # Range-rate at a mid-elevation look: |Doppler| at L1 under ~3.5 kHz.
    vel = glonass_satellite_velocity(eph, eph.tb_day_s)
    los = (pos - RX) / np.linalg.norm(pos - RX)
    doppler = -float(vel @ los) / 2.99792458e8 * eph.carrier_frequency_hz
    assert abs(doppler) < 3500.0
    assert eph.carrier_frequency_hz == 1602e6 + 3 * 562.5e3


def test_clock_ahead_sign_and_slope():
    eph = _eph()
    t0 = eph.tb_day_s
    # At tb: ahead = -tau_n (positive tau_n -> SV clock BEHIND GLONASS time).
    # eph's tau/gamma are the broadcast-quantized values (2^-30 s / 2^-40).
    assert glonass_clock_ahead_s(eph, t0) == pytest.approx(-eph.tau_n_s, abs=1e-15)
    assert eph.tau_n_s == pytest.approx(2.5e-5, abs=2**-30)
    d = glonass_clock_ahead_s(eph, t0 + 1000.0) - glonass_clock_ahead_s(eph, t0)
    assert d == pytest.approx(eph.gamma_n * 1000.0)
    assert eph.gamma_n == pytest.approx(1.8e-11, abs=2**-40)


def test_time_scale_mapping_roundtrip():
    leap = 18
    for sow in (0.0, 21600.0, 86399.0, 86400.0 * 3 + 12345.6, 604799.0):
        day_t = glonass_day_time_from_gps_sow(sow, leap)
        assert 0.0 <= day_t < 86400.0
        # Invert near various approximations within the half-day basin.
        for err in (-40000.0, 0.0, 40000.0):
            back = gps_sow_from_glonass_day_time(day_t, sow + err, leap)
            assert back == pytest.approx(sow, abs=1e-9)
    # 21600 SOW (Sunday 06:00 GPS) -> UTC 05:59:42 -> Moscow 08:59:42.
    assert glonass_day_time_from_gps_sow(21600.0, 18) == pytest.approx(
        6 * 3600 - 18 + 3 * 3600
    )

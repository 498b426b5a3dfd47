"""Solver-layer tests: Kepler/ECEF propagation vs an analytic oracle, clock
correction, Newton fix on synthetic geometry, geodesy, and a full world-model
fix through the real ingestion path (SURVEY.md §4)."""

import numpy as np
import pytest

from gypsum_tpu.core.config import SolverConfig
from gypsum_tpu.core.constants import (
    EARTH_GRAVITATIONAL_PARAM,
    EARTH_ROTATION_RATE_RAD_PER_S,
    SPEED_OF_LIGHT_M_PER_S as C,
)
from gypsum_tpu.nav.frames import EmitSubframeEvent
from gypsum_tpu.nav.subframes import decode_subframe, encode_subframe
from gypsum_tpu.solve.ephemeris import (
    Ephemeris,
    clock_correction,
    eccentric_anomaly,
    satellite_position,
)
from gypsum_tpu.solve.fix import solve_position
from gypsum_tpu.solve.geodesy import ecef_to_lla, lla_to_ecef
from gypsum_tpu.solve.world import WorldModel
from tests.ephemeris_fixtures import TEST_EPHEMERIDES, subframes_for_ephemeris


def _circular_ephemeris(omega0=0.3, m0=1.1, i0=0.96) -> Ephemeris:
    return Ephemeris(
        sqrt_a=np.sqrt(26_560_000.0), eccentricity=0.0, i0=i0, omega0=omega0,
        omega=0.0, m0=m0, delta_n=0.0, idot=0.0, omega_dot=0.0,
        cuc=0.0, cus=0.0, crc=0.0, crs=0.0, cic=0.0, cis=0.0, t_oe=0.0,
        a_f0=0.0, a_f1=0.0, a_f2=0.0, t_oc=0.0, t_gd=0.0,
    )


def test_satellite_position_matches_analytic_circular_orbit():
    """For e=0 with no perturbations the ICD algorithm reduces to a circle
    rotated into the orbital plane — checkable in closed form."""
    eph = _circular_ephemeris()
    a = eph.semi_major_axis
    n = np.sqrt(EARTH_GRAVITATIONAL_PARAM / a**3)
    for t in (0.0, 1234.5, 40000.0):
        u = eph.m0 + n * t  # argument of latitude (e=0, omega=0)
        omega_k = eph.omega0 - EARTH_ROTATION_RATE_RAD_PER_S * t  # t_oe = 0
        xo, yo = a * np.cos(u), a * np.sin(u)
        want = np.array([
            xo * np.cos(omega_k) - yo * np.cos(eph.i0) * np.sin(omega_k),
            xo * np.sin(omega_k) + yo * np.cos(eph.i0) * np.cos(omega_k),
            yo * np.sin(eph.i0),
        ])
        got = satellite_position(eph, t)
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_orbit_radius_and_period():
    eph = TEST_EPHEMERIDES[0]
    t = np.linspace(0, 86400, 500)
    pos = satellite_position(eph, t)
    r = np.linalg.norm(pos, axis=-1)
    a, e = eph.semi_major_axis, eph.eccentricity
    assert r.min() > a * (1 - e) - 50e3
    assert r.max() < a * (1 + e) + 50e3


def test_eccentric_anomaly_solves_kepler():
    eph = TEST_EPHEMERIDES[0]
    tk = 5000.0
    ek = eccentric_anomaly(eph, tk, iterations=20)
    n = np.sqrt(EARTH_GRAVITATIONAL_PARAM / eph.semi_major_axis**3) + eph.delta_n
    m = eph.m0 + n * tk
    np.testing.assert_allclose(ek - eph.eccentricity * np.sin(ek), m, atol=1e-10)


def test_clock_correction_polynomial_and_tgd():
    eph = _circular_ephemeris()
    eph = Ephemeris(**{**eph.__dict__, "a_f0": 1e-4, "a_f1": 1e-11,
                       "t_oc": 1000.0, "t_gd": 5e-9})
    t = 4000.0
    # e = 0 -> no relativistic term.
    want = 1e-4 + 1e-11 * (t - 1000.0) - 5e-9
    np.testing.assert_allclose(float(clock_correction(eph, t)), want, atol=1e-15)


def test_clock_correction_af2_is_icd_correct():
    # delta = af2 * (t-toc)^2, NOT (af2*(t-toc))^2 (reference bug,
    # gypsum/world_model.py:701).
    eph = _circular_ephemeris()
    eph = Ephemeris(**{**eph.__dict__, "a_f2": 1e-12, "t_oc": 0.0})
    t = 100.0
    np.testing.assert_allclose(float(clock_correction(eph, t)), 1e-12 * t * t, atol=1e-18)


def test_relativistic_term_sign_and_magnitude():
    eph = TEST_EPHEMERIDES[0]
    t = np.linspace(0, 43200, 100)
    delta = clock_correction(eph, t) - clock_correction(
        Ephemeris(**{**eph.__dict__, "eccentricity": 0.0}), t
    )
    # |dt_rel| <= F * e * sqrt(A): a few tens of ns for typical e.
    bound = abs(-4.442807633e-10 * eph.eccentricity * eph.sqrt_a)
    assert np.abs(delta).max() <= bound * 1.01
    assert np.abs(delta).max() > bound * 0.5  # sin sweeps near +/-1


# ------------------------------------------------------------------- Newton


def test_newton_recovers_known_position(rng):
    truth = lla_to_ecef(51.5, -0.1, 80.0)
    bias = 0.0023
    sats = np.array([
        lla_to_ecef(60.0, 10.0, 20_200e3),
        lla_to_ecef(30.0, -40.0, 20_200e3),
        lla_to_ecef(45.0, 30.0, 20_200e3),
        lla_to_ecef(70.0, -60.0, 20_200e3),
        lla_to_ecef(20.0, 5.0, 20_200e3),
    ])
    transit = np.linalg.norm(sats - truth, axis=1) / C + bias
    pos, b = solve_position(sats, transit)
    np.testing.assert_allclose(pos, truth, atol=1e-3)
    np.testing.assert_allclose(b, bias, atol=1e-12)


def test_newton_requires_four_satellites():
    with pytest.raises(ValueError):
        solve_position(np.zeros((3, 3)), np.zeros(3))


def test_geodesy_roundtrip():
    for lat, lon, alt in [(51.5, -0.1, 80.0), (-33.9, 151.2, 10.0), (0.0, 0.0, 0.0),
                          (89.0, 45.0, 1000.0)]:
        ecef = lla_to_ecef(lat, lon, alt)
        lat2, lon2, alt2 = ecef_to_lla(ecef)
        np.testing.assert_allclose([lat2, lon2], [lat, lon], atol=1e-9)
        np.testing.assert_allclose(alt2, alt, atol=1e-6)


# ------------------------------------------------------ world-model fix


def _world_with_consistent_observations(
    truth: np.ndarray, n_svs: int = 4, config: SolverConfig | None = None
) -> tuple[WorldModel, float]:
    """World model fed real decoded subframes + PRN ticks constructed to be
    geometrically consistent with receiver position ``truth``; returns
    (world, receiver_timestamp_now)."""
    t_gps = 3600.0 * 6  # GPS time-of-week "now"
    r_ts = 50.0  # receiver stream timestamp "now"
    delta_frames = t_gps - r_ts

    world = WorldModel(config or SolverConfig())
    used_ephs = TEST_EPHEMERIDES[:n_svs]
    for sv_idx, eph in enumerate(used_ephs):
        prn = sv_idx + 1
        # Emission time of the signal arriving at t_gps (fixed point).
        t_em = t_gps
        for _ in range(4):
            tau = np.linalg.norm(satellite_position(eph, t_em) - truth) / C
            t_em = t_gps - tau
        dtsv = float(clock_correction(eph, t_em))
        # SV-clock time of the PRN edge that arrived 1 ms before "now":
        v = t_gps - 1e-3 - tau + dtsv
        tow = 6.0 * np.floor(v / 6.0)
        # Sub-ms arrival offset making the tick count whole, in the world
        # model's dominant-PRN convention (wrapped to [-0.5, +0.5) ms).
        cpd = (((-v) % 1e-3) + 0.5e-3) % 1e-3 - 0.5e-3
        ticks = int(round((v + cpd - tow) / 1e-3))
        assert 0 <= ticks <= 6000

        # Ingest subframes 1..3 through the real path; each ends at a
        # receiver timestamp consistent with slide = delta_frames.
        sf1, sf2, sf3 = subframes_for_ephemeris(eph)
        for k, payload in enumerate([sf1, sf2, sf3]):
            sub_tow = tow - 6.0 * (2 - k)
            bits = encode_subframe(payload, tow_count=int(sub_tow / 6))
            event = EmitSubframeEvent(
                receiver_timestamp=sub_tow - delta_frames - 6.0,
                trailing_edge_receiver_timestamp=sub_tow - delta_frames,
                decoded=decode_subframe(bits),
            )
            world.handle_subframe_emitted(prn, event)
        world.handle_prn_observed(prn, cpd, count=ticks)
    return world, r_ts


def test_world_model_full_fix_from_constructed_observations():
    """Feed the world model real decoded subframes + PRN ticks constructed to
    be geometrically consistent with a known receiver position, through the
    same ingestion path the live receiver uses; the fix must recover the
    position."""
    truth = lla_to_ecef(51.5, -0.1, 80.0)
    world, r_ts = _world_with_consistent_observations(truth, n_svs=4)
    solution = world.attempt_position_fix(r_ts)
    assert solution is not None
    err = np.linalg.norm(solution.ecef - truth)
    assert err < 30.0, f"position error {err:.1f} m"
    assert solution.lat_deg == pytest.approx(51.5, abs=0.001)
    assert solution.lon_deg == pytest.approx(-0.1, abs=0.001)


def test_repair_on_final_outer_round_publishes_repaired_fix():
    """Regression (advisor finding): when the integer-ms ambiguity repair
    first commits on the LAST outer solve round, the published solution must
    be re-solved on the repaired transit — not the pre-repair position that
    is hundreds of km off. Forced by outer_rounds=1 so the only round is the
    final one."""
    truth = lla_to_ecef(51.5, -0.1, 80.0)
    world, r_ts = _world_with_consistent_observations(
        truth, n_svs=5, config=SolverConfig(outer_rounds=1)
    )
    # Inject a 1 ms bit-phase slip on one SV: one extra counted PRN tick.
    world._sats[3].prn_ticks_since_subframe += 1
    solution = world.attempt_position_fix(r_ts)
    assert solution is not None
    # The repair must have corrected the tick counter...
    err = np.linalg.norm(solution.ecef - truth)
    # ...and the single-round fix itself must already reflect the repair.
    assert err < 30.0, f"published fix not re-solved after repair: {err:.0f} m"


def test_world_model_gates():
    world = WorldModel()
    assert world.attempt_position_fix(1.0) is None  # nothing tracked
    # Lost lock invalidates the time base but keeps the ephemeris.
    eph = TEST_EPHEMERIDES[0]
    sf1, sf2, sf3 = subframes_for_ephemeris(eph)
    for k, payload in enumerate([sf1, sf2, sf3]):
        bits = encode_subframe(payload, tow_count=100 + k)
        ev = EmitSubframeEvent(6.0 * k, 6.0 * (k + 1),
                               decoded=decode_subframe(bits))
        events = world.handle_subframe_emitted(1, ev)
    assert world.satellites_with_ephemeris() == [1]
    assert events, "completing subframes 1-3 should emit a determined-orbit event"
    world.handle_lost_satellite_lock(1)
    assert world._sats[1].ephemeris is not None
    assert not world._sats[1].counting
    assert world.attempt_position_fix(20.0) is None


def test_velocity_solve_recovers_known_motion():
    """solve_velocity on exact synthetic geometry: a moving receiver and a
    drifting clock are recovered to numerical precision."""
    import numpy as np

    from gypsum_tpu.solve.velocity import WAVELENGTH_M, solve_velocity

    rng = np.random.default_rng(5)
    rx = np.array([3980000.0, -10000.0, 4970000.0])
    v_true = np.array([12.0, -7.0, 3.0])
    drift_true = 2.5e-9  # s/s
    c = 2.99792458e8

    sat_pos = rx + rng.normal(0, 1, (6, 3)) * 1e6 + np.array([0, 0, 2.0e7])
    sat_vel = rng.normal(0, 1000.0, (6, 3))
    los = sat_pos - rx
    e = los / np.linalg.norm(los, axis=1, keepdims=True)
    rho_dot = np.einsum("ij,ij->i", e, sat_vel - v_true)
    dopplers = -(rho_dot + c * drift_true) / WAVELENGTH_M

    v, drift = solve_velocity(sat_pos, sat_vel, rx, dopplers)
    np.testing.assert_allclose(v, v_true, atol=1e-6)
    assert abs(drift - drift_true) < 1e-15


def test_satellite_velocity_consistent_with_position():
    """Central-difference ephemeris velocity integrates back to the position
    change over a short interval."""
    import numpy as np

    from ephemeris_fixtures import TEST_EPHEMERIDES

    from gypsum_tpu.solve.ephemeris import satellite_position
    from gypsum_tpu.solve.velocity import satellite_velocity

    eph = TEST_EPHEMERIDES[0]
    t = 21600.0
    v = satellite_velocity(eph, t)
    speed = np.linalg.norm(v)
    assert 2000.0 < speed < 5000.0  # GPS orbital speed ~3.9 km/s
    dt = 2.0
    p0 = satellite_position(eph, t)
    p1 = satellite_position(eph, t + dt)
    # Compare against the midpoint velocity (centripetal acceleration is
    # ~0.6 m/s^2, so the endpoint velocity differs by ~1 m over 2 s).
    v_mid = satellite_velocity(eph, t + dt / 2)
    np.testing.assert_allclose(p1 - p0, v_mid * dt, atol=0.05)


def test_dilution_of_precision():
    import numpy as np

    from gypsum_tpu.solve.fix import dilution_of_precision

    rx = np.array([6378137.0, 0.0, 0.0])
    # Well-spread geometry: one overhead, three at wide angles.
    up = rx / np.linalg.norm(rx)
    sats_good = np.array([
        rx + 2.0e7 * up,
        rx + 2.0e7 * np.array([0.5, 0.8, 0.33]) / np.linalg.norm([0.5, 0.8, 0.33]),
        rx + 2.0e7 * np.array([0.5, -0.8, 0.33]) / np.linalg.norm([0.5, -0.8, 0.33]),
        rx + 2.0e7 * np.array([0.4, 0.0, -0.9]) / np.linalg.norm([0.4, 0.0, -0.9]),
    ])
    good = dilution_of_precision(sats_good, rx)
    # Clustered geometry: all satellites within a narrow cone.
    base = np.array([0.9, 0.1, 0.42])
    sats_bad = np.array([
        rx + 2.0e7 * (base + d) / np.linalg.norm(base + d)
        for d in (np.zeros(3), np.array([0.02, 0, 0]), np.array([0, 0.02, 0]), np.array([0, 0, 0.02]))
    ])
    bad = dilution_of_precision(sats_bad, rx)
    assert good["gdop"] < 10 < bad["gdop"]
    assert good["pdop"] < good["gdop"]
    assert {"gdop", "pdop", "tdop"} <= set(good)


def test_carrier_smoothing_survives_code_phase_wrap():
    """The routine 0 <-> 1 ms delay wrap is deterministic (high-Doppler code
    drift), so the Hatch filter must smooth through it; only a genuine slip
    (large wrapped innovation) resets the depth."""
    from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ
    from gypsum_tpu.solve.world import WorldModel

    w = WorldModel()
    doppler = -4000.0  # delay grows ~2.54 us per 1 s block
    rate = -doppler / GPS_L1_FREQUENCY_HZ  # s of delay per s
    delay = 0.999e-3  # start just below the wrap
    for block in range(8):
        w.handle_channel_block(7, delay % 1e-3, doppler, 1000)
        delay += rate * 1.0
    rec = w._sats[7]
    assert rec.smoothing_depth == 8, rec.smoothing_depth  # no reset at wrap
    # A genuine slip (measurement jumps half a millisecond) resets.
    w.handle_channel_block(7, (delay + 0.4e-3) % 1e-3, doppler, 1000)
    assert w._sats[7].smoothing_depth == 1


def _ambiguous_4sv_case():
    """Pinned ambiguous 4-SV lattice geometry (tools/lattice_study.py seed 6):
    slip dk=(0,0,-1,0) yields TWO altitude-plausible hypotheses, the wrong
    one ~1200 km from truth."""
    from gypsum_tpu.core.constants import SPEED_OF_LIGHT_M_PER_S as C_MS
    from gypsum_tpu.signal.scenarios import DEMO_EPHEMERIDES, DEMO_GPS_START_SOW
    from gypsum_tpu.solve.ephemeris import satellite_position

    rng = np.random.default_rng(6)
    rx = lla_to_ecef(
        51.5 + rng.uniform(-3, 3), -0.1 + rng.uniform(-3, 3), rng.uniform(0, 500)
    )
    slots = rng.choice(8, size=4, replace=False)
    t = DEMO_GPS_START_SOW + rng.uniform(0, 60.0)
    sat_pos = np.array([satellite_position(DEMO_EPHEMERIDES[s], t) for s in slots])
    bias = rng.uniform(-2e-3, 2e-3)
    transit = np.linalg.norm(sat_pos - rx[None, :], axis=1) / C_MS + bias
    dk = None
    while True:
        dk = rng.integers(-1, 2, size=4)
        dk[0] = 0
        if dk.any():
            break
    return rx, sat_pos, transit + dk * 1e-3, dk


def test_ambiguous_4sv_lattice_is_detected():
    """The pinned geometry must actually be ambiguous (2 plausible groups),
    with the wrong hypothesis far from truth — the premise of the prior-fix
    tie-break (measured rates: tools/lattice_study.py, ~7% of slipped 4-SV
    geometries, separation always >> 50 km)."""
    from gypsum_tpu.solve.world import enumerate_4sv_hypotheses

    rx, sat_pos, slipped, _dk = _ambiguous_4sv_case()
    groups = enumerate_4sv_hypotheses(sat_pos, slipped, 20)
    assert len(groups) == 2, len(groups)
    dists = sorted(np.linalg.norm(g[2] - rx) for g in groups.values())
    assert dists[0] < 1_000.0  # truth is among them
    assert dists[1] > 300_000.0  # the impostor is far beyond the tie-break


def test_ambiguous_4sv_repair_tiebreaks_on_prior_fix():
    """With a prior fix near truth, _repair_four_satellite must commit the
    correct hypothesis instead of abstaining; without any prior fix it must
    leave the transit untouched (abstain)."""
    from gypsum_tpu.solve.world import ReceiverSolution, WorldModel

    rx, sat_pos, slipped, _dk = _ambiguous_4sv_case()
    prns = [1, 2, 3, 4]

    def make_world(with_prior):
        w = WorldModel(SolverConfig())
        for p in prns:
            w._record(p)
        if with_prior:
            w.position_fixes.append(
                ReceiverSolution(
                    clock_bias_s=0.0, ecef=rx + 200.0, lat_deg=0, lon_deg=0,
                    alt_m=0, satellites_used=tuple(prns), receiver_timestamp=0.0,
                )
            )
        return w

    # Abstains with no history...
    w0 = make_world(False)
    out0 = w0._repair_four_satellite(prns, sat_pos, slipped.copy(), rx + 9e5, 0.0)
    np.testing.assert_array_equal(out0, slipped)
    # ...and commits the truth-side hypothesis with one.
    w1 = make_world(True)
    out1 = w1._repair_four_satellite(prns, sat_pos, slipped.copy(), rx + 9e5, 0.0)
    assert not np.array_equal(out1, slipped)
    p2, _b = solve_position(sat_pos, out1, initial_position=None, initial_bias=0.0)
    assert np.linalg.norm(p2 - rx) < 1_000.0


def test_multi_sv_millisecond_slip_repair():
    """Regression (campaign seed 16 at sub-meter accuracy): TWO satellites
    slipped +1 ms simultaneously. The old repair required each greedy step
    to HALVE the residual RMS and stay on the Earth shell — impossible when
    fixing one of two slips (RMS falls only ~sqrt(1/2), position still far
    off) — so the set was declared unrepairable and the fix landed ~100 km
    out. The descent now accepts 10% improvements and defers plausibility
    to the final commit."""
    truth = lla_to_ecef(51.5, -0.1, 80.0)
    world, r_ts = _world_with_consistent_observations(truth, n_svs=6)
    world._sats[3].prn_ticks_since_subframe += 1
    world._sats[5].prn_ticks_since_subframe += 1
    solution = world.attempt_position_fix(r_ts)
    assert solution is not None
    err = np.linalg.norm(solution.ecef - truth)
    assert err < 30.0, f"multi-slip not repaired: {err:.0f} m"


def test_exhaustive_exclusion_repairs_two_of_eight():
    """Regression (campaign seed 26): with 2 of 8 satellites slipped +1 ms,
    Newton smearing makes a NON-slipped satellite the largest residual, so
    greedy exclusion and whole-set median snapping both chase decoys. The
    exhaustive leave-k-out FDE must still find the unique consistent
    6-subset and repair both slips."""
    from gypsum_tpu.signal.scenarios import DEMO_EPHEMERIDES, DEMO_GPS_START_SOW
    from gypsum_tpu.solve.ephemeris import satellite_position
    from gypsum_tpu.solve.world import WorldModel

    rng = np.random.default_rng(26)
    truth = lla_to_ecef(51.8, -2.0, 250.0)
    t = DEMO_GPS_START_SOW + 20.0
    sat_pos = np.array([satellite_position(DEMO_EPHEMERIDES[s], t) for s in range(8)])
    bias = 0.36e-3
    transit = np.linalg.norm(sat_pos - truth[None, :], axis=1) / C + bias
    transit += rng.normal(0.0, 1.0 / C, size=8)  # ~1 m code noise
    slipped = transit.copy()
    slipped[3] += 1e-3
    slipped[6] += 1e-3

    w = WorldModel(SolverConfig())
    prns = list(range(1, 9))
    for p in prns:
        w._record(p)
    pos0, b0 = solve_position(sat_pos, slipped)
    assert np.linalg.norm(pos0 - truth) > 50_000  # the smeared bad fix
    repaired = w._repair_millisecond_ambiguities(prns, sat_pos, slipped, pos0, b0)
    p2, _ = solve_position(sat_pos, repaired)
    err = np.linalg.norm(p2 - truth)
    assert err < 30.0, f"2-of-8 slips unrepaired: {err:.0f} m"
    # Tick corrections committed for exactly the slipped satellites.
    assert w._sats[4].prn_ticks_since_subframe == 1
    assert w._sats[7].prn_ticks_since_subframe == 1
    assert all(
        w._sats[p].prn_ticks_since_subframe == 0 for p in (1, 2, 3, 5, 6, 8)
    )

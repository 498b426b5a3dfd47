"""Dual-antenna attitude determination (solve/attitude.py).

Heading/pitch from a rigid carrier-phase baseline, with the known antenna
separation validating and — where the ratio test alone is indecisive —
arbitrating the integer ambiguity fix. reference: no counterpart (gypsum is
a single-receiver meter-level code solver)."""

import numpy as np

from gypsum_tpu.core.config import ReceiverConfig
from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ, SPEED_OF_LIGHT_M_PER_S
from gypsum_tpu.solve.attitude import heading_pitch_of, solve_attitude
from gypsum_tpu.solve.geodesy import enu_basis, lla_to_ecef
from gypsum_tpu.solve.rtk import DDObservations, _dd_rho, sv_position_fn_from_ephemerides


def _demo_sv_fn(prns):
    from gypsum_tpu.signal.scenarios import DEMO_EPHEMERIDES, DEMO_GPS_START_SOW, DEMO_PRNS_8

    eph = {p: DEMO_EPHEMERIDES[DEMO_PRNS_8.index(p)] for p in prns}
    return sv_position_fn_from_ephemerides(eph, DEMO_GPS_START_SOW)


def _ang_err(a, b):
    """Circular angle difference in degrees (heading 359.99... == 0)."""
    return np.abs((np.asarray(a) - np.asarray(b) + 180.0) % 360.0 - 180.0)


def test_heading_pitch_conversion():
    ref = lla_to_ecef(51.5, -0.1, 80.0)
    east, north, up = enu_basis(ref)

    h, p = heading_pitch_of(2.0 * north, ref)
    assert _ang_err(h, 0.0) < 1e-9 and abs(p) < 1e-9
    h, p = heading_pitch_of(3.0 * east, ref)
    assert _ang_err(h, 90.0) < 1e-9 and abs(p) < 1e-9
    h, p = heading_pitch_of(-1.0 * north, ref)
    assert _ang_err(h, 180.0) < 1e-9
    # 45 deg up-tilted north-east baseline.
    b = north + east + np.sqrt(2.0) * up
    h, p = heading_pitch_of(b, ref)
    assert _ang_err(h, 45.0) < 1e-9
    assert abs(p - 45.0) < 1e-9
    # Stacked input -> arrays of the leading shape.
    hs, ps = heading_pitch_of(np.stack([2.0 * north, 3.0 * east]), ref)
    assert hs.shape == (2,) and np.all(_ang_err(hs, [0.0, 90.0]) < 1e-9)


def _rotating_platform_dd(prns, antenna1, separation_m, headings_deg,
                          pitch_deg, epochs, sigma_phase=0.01,
                          sigma_code=0.5, seed=7):
    """Model-generated DDs for antenna 2 on a rigid arm swinging through
    ``headings_deg`` at constant ``pitch_deg`` (a turntable scene — the
    pure-geometry analogue of tests/test_rtk.py's model-DD baseline test)."""
    east, north, up = enu_basis(antenna1)
    hz = np.radians(np.asarray(headings_deg))
    pz = np.radians(pitch_deg)
    arm = (np.cos(pz) * (np.sin(hz)[:, None] * east + np.cos(hz)[:, None] * north)
           + np.sin(pz) * up)  # [T, 3] unit vectors
    rover_t = antenna1 + separation_m * arm  # [T, 3]

    sv_fn = _demo_sv_fn(prns)
    ref, others = prns[-1], prns[:-1]
    sv_s = np.stack([[sv_fn(p, t) for p in others] for t in epochs])
    sv_r = np.stack([[sv_fn(ref, t)] for t in epochs])
    rho = np.stack([
        _dd_rho(rover_t[t][None, None, :], antenna1,
                sv_s[t : t + 1], sv_r[t : t + 1, 0:1, :])[0]
        for t in range(len(epochs))
    ])

    rng = np.random.default_rng(seed)
    scale = 2.0 * GPS_L1_FREQUENCY_HZ / SPEED_OF_LIGHT_M_PER_S
    a_true = rng.integers(-30, 30, size=len(others)).astype(float)
    dd = DDObservations(
        prns=others, ref_prn=ref, epochs_s=np.asarray(epochs, float),
        phase_half_cycles=-scale * rho + a_true
        + rng.normal(0, sigma_phase, rho.shape),
        code_m=rho + rng.normal(0, sigma_code, rho.shape),
    )
    return dd, sv_fn, rover_t


def test_attitude_tracks_rotating_platform():
    """A 2 m arm swinging 40 -> 100 deg at 5 deg pitch: per-epoch heading
    must track the sweep to ~0.1 deg and the fix must validate against the
    known separation."""
    prns = [25, 28, 31, 32, 3, 7]
    antenna1 = lla_to_ecef(51.5, -0.1, 80.0)
    epochs = np.arange(2.0, 32.0, 1.0)
    truth_heading = np.linspace(40.0, 100.0, len(epochs))
    dd, sv_fn, _ = _rotating_platform_dd(
        prns, antenna1, 2.0, truth_heading, 5.0, epochs)

    sol = solve_attitude(dd, sv_fn, antenna1, separation_m=2.0,
                         sigma_phase_half_cycles=0.01)
    assert sol.fixed and sol.fixed_by == "ratio", (sol.fixed_by, sol.ratio)
    assert not sol.mount_alarm
    assert sol.length_rms_m < 0.01
    # 1 mm of phase noise over a 2 m arm is ~0.03 deg of direction.
    assert np.max(np.abs(sol.heading_deg - truth_heading)) < 0.15
    assert np.max(np.abs(sol.pitch_deg - 5.0)) < 0.3
    # The published formal direction sigmas must be honest: per-epoch
    # heading errors should sit within ~4 sigma, and the sigmas themselves
    # in the sub-0.1-deg class this geometry implies (not optimistic zeros).
    assert sol.sigma_heading_deg.shape == sol.heading_deg.shape
    assert np.all(sol.sigma_heading_deg > 1e-4)
    assert np.all(np.abs(sol.heading_deg - truth_heading)
                  < 4.0 * sol.sigma_heading_deg + 0.02)
    assert np.all(np.abs(sol.pitch_deg - 5.0)
                  < 4.0 * sol.sigma_pitch_deg + 0.02)


def test_length_constraint_arbitrates_when_ratio_gate_fails():
    """With the ratio gate forced closed, the known separation alone must
    pick the true integer candidate (exactly one of the best 8 is
    length-consistent) and the headings must still be right."""
    prns = [25, 28, 31, 32, 3]
    antenna1 = lla_to_ecef(51.5, -0.1, 80.0)
    epochs = np.arange(2.0, 14.0, 1.0)
    truth_heading = np.linspace(310.0, 335.0, len(epochs))
    dd, sv_fn, _ = _rotating_platform_dd(
        prns, antenna1, 1.5, truth_heading, -3.0, epochs, seed=3)

    sol = solve_attitude(dd, sv_fn, antenna1, separation_m=1.5,
                         sigma_phase_half_cycles=0.01,
                         ratio_threshold=1e9)  # ratio can never pass
    assert sol.fixed and sol.fixed_by == "length"
    assert sol.n_length_consistent == 1
    assert np.max(np.abs(sol.heading_deg - truth_heading)) < 0.3


def test_wrong_separation_is_rejected():
    """Validation direction: claiming a 2.5 m separation for a true 2.0 m
    baseline must refuse to fix (every candidate fails the length gate) —
    the gate catches a wrong mount model instead of publishing a confident
    wrong attitude."""
    prns = [25, 28, 31, 32, 3, 7]
    antenna1 = lla_to_ecef(51.5, -0.1, 80.0)
    epochs = np.arange(2.0, 22.0, 1.0)
    truth_heading = np.linspace(40.0, 80.0, len(epochs))
    dd, sv_fn, _ = _rotating_platform_dd(
        prns, antenna1, 2.0, truth_heading, 5.0, epochs)

    sol = solve_attitude(dd, sv_fn, antenna1, separation_m=2.5,
                         sigma_phase_half_cycles=0.01)
    assert not sol.fixed and sol.fixed_by is None
    assert sol.n_length_consistent == 0
    # This is exactly the ratio-pass + length-fail interaction: the phase
    # data fix decisively (strong 6-SV window), the geometry contradicts the
    # claimed separation. The solve must raise the mount alarm and must NOT
    # fall through to length arbitration and publish a different candidate.
    assert sol.ratio >= 2.0, "scenario must exercise the ratio-pass path"
    assert sol.mount_alarm
    assert sol.ambiguities is None


def test_attitude_end_to_end_two_receivers():
    """Full-stack: two receivers 3 m apart track the same IQ scene; the
    attitude of the fixed baseline must land within ~0.1 deg of the
    synthesized antenna axis."""
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        DEMO_PRNS_8,
        demo_constellation,
    )
    from gypsum_tpu.solve.rtk import CarrierPhaseLog, form_double_differences

    fs = 2.046e6
    prns = DEMO_PRNS_8[:6]
    sats = demo_constellation(prns)
    antenna1 = lla_to_ecef(51.5, -0.1, 80.0)
    east, north, up = enu_basis(antenna1)
    heading_true, pitch_true, sep = 63.0, 4.0, 3.0
    axis = (np.cos(np.radians(pitch_true))
            * (np.sin(np.radians(heading_true)) * east
               + np.cos(np.radians(heading_true)) * north)
            + np.sin(np.radians(pitch_true)) * up)
    antenna2 = antenna1 + sep * axis

    logs = []
    for rx in (antenna1, antenna2):
        iq, _ = synthesize_constellation(
            sats, rx, DEMO_GPS_START_SOW, 14.0, fs, noise_sigma=0.25,
        )
        recv = Receiver(ArraySampleSource(iq, fs), ReceiverConfig(),
                        eligible_prns=prns)
        log = CarrierPhaseLog(recv.sample_rate, recv.samples_per_prn,
                              recv.config.tracking)
        recv.add_block_listener(log.listener())
        recv.run()
        logs.append(log)

    dd = form_double_differences(logs[0], logs[1], prns=prns,
                                 epoch_every_ms=250, settle_ms=2000)
    sol = solve_attitude(dd, _demo_sv_fn(prns), antenna1, separation_m=sep,
                         sigma_phase_half_cycles=0.006)
    assert sol.fixed, f"not fixed (ratio {sol.ratio:.2f})"
    assert sol.length_rms_m < 0.01
    # Tracker phase noise ~1 mm over a 3 m arm: ~0.02 deg; allow seed drift.
    assert np.max(np.abs(sol.heading_deg - heading_true)) < 0.12
    assert np.max(np.abs(sol.pitch_deg - pitch_true)) < 0.25

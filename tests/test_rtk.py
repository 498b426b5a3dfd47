"""RTK baseline solver (solve/rtk.py): integer least squares, carrier-phase
accumulation exactness, and the dual-receiver end-to-end fix.

The reference has no differential capability at all; ground truth comes from
the synthesizer's exact phase model (signal/constellation.py:438)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
from gypsum_tpu.solve.geodesy import enu_basis, lla_to_ecef
from gypsum_tpu.solve.rtk import (
    CarrierPhaseLog,
    DDObservations,
    HALF_CYCLE_M,
    _dd_rho,
    _decorrelate,
    _ltdl,
    form_double_differences,
    integer_least_squares,
    solve_baseline,
    solve_kinematic,
    sv_position_fn_from_ephemerides,
)

RNG = np.random.default_rng(7)


# --------------------------------------------------------------------------
# Integer least squares
# --------------------------------------------------------------------------


def _random_spd(n: int, rng) -> np.ndarray:
    A = rng.normal(size=(n, n))
    return A @ A.T + 0.05 * np.eye(n)


def test_ltdl_reconstructs():
    for _ in range(20):
        Q = _random_spd(6, RNG)
        L, d = _ltdl(Q)
        assert np.allclose(L.T @ np.diag(d) @ L, Q, atol=1e-9)
        assert np.allclose(np.diag(L), 1.0)
        assert np.allclose(np.triu(L, 1), 0.0)


def test_decorrelation_is_unimodular_and_consistent():
    for _ in range(20):
        Q = _random_spd(6, RNG)
        L, d, Z = _decorrelate(Q)
        # Z integer with |det| = 1 (unimodular): the transform preserves the
        # integer lattice.
        assert np.allclose(Z, np.round(Z))
        assert abs(abs(np.linalg.det(Z)) - 1.0) < 1e-9
        assert np.allclose(L.T @ np.diag(d) @ L, Z.T @ Q @ Z, atol=1e-8)


def test_ils_search_matches_brute_force():
    """The LAMBDA search must find the exact minimizer (and runner-up) of the
    quadratic form over the integer lattice."""
    for trial in range(15):
        rng = np.random.default_rng(100 + trial)
        n = 4
        Q = _random_spd(n, rng)
        a = rng.uniform(-3, 3, size=n)
        cands, costs = integer_least_squares(a, Q, n_cand=2)

        Qi = np.linalg.inv(Q)
        grid = range(-5, 6)
        brute = []
        center = np.round(a)
        for off in itertools.product(grid, repeat=n):
            z = center + np.array(off)
            y = a - z
            brute.append((float(y @ Qi @ y), tuple(z)))
        brute.sort()
        assert costs[0] == pytest.approx(brute[0][0], rel=1e-9)
        assert tuple(cands[0]) == brute[0][1]
        assert costs[1] == pytest.approx(brute[1][0], rel=1e-9)


# --------------------------------------------------------------------------
# Carrier-phase accumulation
# --------------------------------------------------------------------------


class _FakeObs:
    """Minimal ChannelObservation stand-in for CarrierPhaseLog.ingest."""

    def __init__(self, prn, carrier_phases, dopplers, pll_errors, locked,
                 block_start, fs, spp, code=None):
        b = len(carrier_phases)
        self.prn = prn
        self.carrier_phases = np.asarray(carrier_phases, np.float32)
        self.dopplers = np.asarray(dopplers, np.float32)
        self.pll_errors = np.asarray(pll_errors, np.float32)
        self.locked = np.asarray(locked, bool)
        self.code_phases = np.zeros(b, np.float32)
        self.code_phases_measured = (
            np.zeros(b, np.float32) if code is None else np.asarray(code, np.float32)
        )
        self.start_times = block_start + np.arange(b) * (spp / fs)


def _simulate_nco(theta0, dopplers, pll_errors, locked, kp_locked, kp_pullin, t_ms):
    """f32 mod-2pi NCO exactly as the kernel runs it, plus the f64 truth."""
    two_pi = np.float32(2 * np.pi)
    th32 = np.float32(theta0)
    acc64 = float(theta0)
    wrapped, truth = [], []
    for fd, pe, lk in zip(dopplers, pll_errors, locked):
        wrapped.append(float(th32))
        truth.append(acc64)
        kp = kp_locked if lk else kp_pullin
        d32 = np.float32(two_pi * np.float32(fd) * np.float32(t_ms) + np.float32(kp) * np.float32(pe))
        th32 = np.float32(np.mod(th32 + d32, two_pi))
        acc64 += 2 * np.pi * float(np.float32(fd)) * t_ms + float(kp) * float(np.float32(pe))
    return np.array(wrapped), np.array(truth), float(th32)


def test_phase_accumulation_exact_across_blocks():
    fs, spp = 2.046e6, 2046
    t_ms = spp / fs
    log = CarrierPhaseLog(fs, spp)
    rng = np.random.default_rng(3)
    b = 400
    dop = 1234.5 + rng.normal(0, 2, size=2 * b)
    pll = rng.normal(0, 0.05, size=2 * b)
    lk = np.ones(2 * b, bool)
    wrapped, truth, _ = _simulate_nco(
        1.0, dop, pll, lk, log.kp_locked, log.kp_pullin, t_ms
    )
    for blk in range(2):
        s = slice(blk * b, (blk + 1) * b)
        log.ingest(_FakeObs(25, wrapped[s], dop[s], pll[s], lk[s],
                            blk * b * t_ms, fs, spp))
    arcs = log.arcs[25]
    assert len(arcs) == 1  # continuity held across the block boundary
    got = np.array(arcs[0].phase_cycles) * 2 * np.pi
    # ~1.9 million radians accumulate over 0.8 s at 1.2 kHz Doppler; the
    # reconstruction must stay within f32-rounding of the true NCO path.
    assert np.max(np.abs(got - truth)) < 5e-3
    assert log.max_pin_residual_rad < 0.5


def test_phase_accumulation_detects_host_edit():
    """A pi/2 host-side phase edit between blocks (the rescue tier's move)
    must start a new arc, not silently corrupt the ambiguity."""
    fs, spp = 2.046e6, 2046
    t_ms = spp / fs
    log = CarrierPhaseLog(fs, spp)
    b = 100
    dop = np.full(2 * b, 800.0)
    pll = np.zeros(2 * b)
    lk = np.ones(2 * b, bool)
    w1, _, th_end = _simulate_nco(0.5, dop[:b], pll[:b], lk[:b],
                                  log.kp_locked, log.kp_pullin, t_ms)
    w2, _, _ = _simulate_nco(th_end + np.pi / 2, dop[b:], pll[b:], lk[b:],
                             log.kp_locked, log.kp_pullin, t_ms)
    log.ingest(_FakeObs(31, w1, dop[:b], pll[:b], lk[:b], 0.0, fs, spp))
    log.ingest(_FakeObs(31, w2, dop[b:], pll[b:], lk[b:], b * t_ms, fs, spp))
    assert len(log.arcs[31]) == 2


# --------------------------------------------------------------------------
# Baseline estimator on model-generated double differences
# --------------------------------------------------------------------------


def _demo_sv_fn(prns):
    from gypsum_tpu.signal.scenarios import DEMO_EPHEMERIDES, DEMO_GPS_START_SOW, DEMO_PRNS_8

    eph = {p: DEMO_EPHEMERIDES[DEMO_PRNS_8.index(p)] for p in prns}
    return sv_position_fn_from_ephemerides(eph, DEMO_GPS_START_SOW)


def test_solver_recovers_synthetic_baseline():
    from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ, SPEED_OF_LIGHT_M_PER_S

    prns = [25, 28, 31, 32, 3, 7]
    base = lla_to_ecef(51.5, -0.1, 80.0)
    east, north, up = enu_basis(base)
    truth = 14.0 * east + 6.0 * north + 1.5 * up
    rover = base + truth

    sv_fn = _demo_sv_fn(prns)
    ref = prns[-1]
    others = prns[:-1]
    # 58 epochs: enough float precision that the bootstrap success bound
    # (the dual validation gate's model half) clears 0.99 honestly at this
    # noise level.
    epochs = np.arange(2.0, 60.0, 1.0)
    sv_s = np.stack([[sv_fn(p, t) for p in others] for t in epochs])
    sv_r = np.stack([[sv_fn(ref, t)] for t in epochs])
    rho = _dd_rho(rover[None, None, :], base, sv_s, sv_r)

    rng = np.random.default_rng(11)
    scale = 2.0 * GPS_L1_FREQUENCY_HZ / SPEED_OF_LIGHT_M_PER_S
    a_true = rng.integers(-40, 40, size=len(others)).astype(float)
    dd = DDObservations(
        prns=others, ref_prn=ref, epochs_s=epochs,
        phase_half_cycles=-scale * rho + a_true + rng.normal(0, 0.02, rho.shape),
        code_m=rho + rng.normal(0, 0.6, rho.shape),
    )
    sol = solve_baseline(dd, sv_fn, base)
    assert sol.fixed, f"ratio {sol.ratio}"
    assert np.array_equal(sol.ambiguities, a_true)
    assert np.linalg.norm(sol.baseline_fixed_m - truth) < 5e-3
    assert np.linalg.norm(sol.baseline_float_m - truth) < 1.0
    assert sol.phase_rms_half_cycles < 0.05


# --------------------------------------------------------------------------
# End to end: two receivers, one scene
# --------------------------------------------------------------------------


def test_dual_receiver_rtk_end_to_end():
    """Two receivers 15 m apart track the same 6-SV scene; the fixed RTK
    baseline must land within 2 cm of the synthesized truth (the reference
    receiver's best case is meter-level, single-receiver)."""
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        DEMO_PRNS_8,
        demo_constellation,
    )

    fs = 2.046e6
    prns = DEMO_PRNS_8[:6]
    sats = demo_constellation(prns)
    base = lla_to_ecef(51.5, -0.1, 80.0)
    east, north, up = enu_basis(base)
    truth = 11.0 * east - 7.5 * north + 2.0 * up
    rover = base + truth

    seconds = 16.0
    logs = []
    for rx in (base, rover):
        iq, _ = synthesize_constellation(
            sats, rx, DEMO_GPS_START_SOW, seconds, fs, noise_sigma=0.25,
        )
        recv = Receiver(ArraySampleSource(iq, fs), ReceiverConfig(),
                        eligible_prns=prns)
        log = CarrierPhaseLog(recv.sample_rate, recv.samples_per_prn,
                              recv.config.tracking)
        recv.add_block_listener(log.listener())
        recv.run()
        assert log.max_pin_residual_rad < 0.5
        logs.append(log)

    dd = form_double_differences(logs[0], logs[1], prns=prns,
                                 epoch_every_ms=200, settle_ms=2000)
    sol = solve_baseline(dd, _demo_sv_fn(prns), base)

    err_float = np.linalg.norm(sol.baseline_float_m - truth)
    assert err_float < 0.5, f"float baseline off by {err_float:.2f} m"
    assert sol.fixed, f"ambiguities not fixed (ratio {sol.ratio:.2f})"
    err_fixed = np.linalg.norm(sol.baseline_fixed_m - truth)
    # Measured 1.2 mm on this scene; 10 mm leaves margin for seed drift.
    assert err_fixed < 0.010, f"fixed baseline off by {err_fixed*1000:.1f} mm"
    assert sol.phase_rms_half_cycles < 0.02


def test_kinematic_rtk_tracks_moving_rover():
    """A rover moving at 0.43 m/s: per-epoch fixed baselines must follow the
    true trajectory at the centimeter level and recover the velocity."""
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        DEMO_PRNS_8,
        demo_constellation,
    )

    fs = 2.046e6
    prns = DEMO_PRNS_8[:6]
    sats = demo_constellation(prns)
    base = lla_to_ecef(51.5, -0.1, 80.0)
    east, north, up = enu_basis(base)
    b0 = 8.0 * east + 3.0 * north
    vel = 0.35 * east - 0.25 * north  # |v| = 0.43 m/s

    seconds = 14.0
    logs = []
    for rx, v in ((base, None), (base + b0, vel)):
        iq, _ = synthesize_constellation(
            sats, rx, DEMO_GPS_START_SOW, seconds, fs, noise_sigma=0.25,
            receiver_velocity_ecef=v,
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
    # Weights at the MEASURED tracker phase noise (~0.005 half-cycles; see
    # the static e2e's phase RMS) so the bootstrap bound reflects the data.
    sol = solve_kinematic(dd, _demo_sv_fn(prns), base,
                          sigma_phase_half_cycles=0.006)
    assert sol.fixed, f"ambiguities not fixed (ratio {sol.ratio:.2f})"

    truth_t = b0[None, :] + vel[None, :] * dd.epochs_s[:, None]
    err = np.linalg.norm(sol.baselines_fixed_m - truth_t, axis=1)
    assert np.max(err) < 0.03, f"worst epoch error {np.max(err)*100:.1f} cm"
    # Velocity from a linear fit over the fixed trajectory.
    v_est = np.polyfit(dd.epochs_s, sol.baselines_fixed_m, 1)[0]
    assert np.linalg.norm(v_est - vel) < 0.01


def test_common_view_time_transfer():
    """Two receivers at known positions, the rover's oscillator fast by
    1e-7: the code-based offset series must track d*t at nanosecond
    scatter, and the carrier-based drift must agree with the code-based
    one (both equal the injected value under the synthesizer's consistent
    single-oscillator model)."""
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        DEMO_PRNS_8,
        demo_constellation,
    )
    from gypsum_tpu.solve.rtk import time_transfer

    fs = 2.046e6
    prns = DEMO_PRNS_8[:5]
    sats = demo_constellation(prns)
    base = lla_to_ecef(51.5, -0.1, 80.0)
    east, north, _up = enu_basis(base)
    rover_pos = base + 400.0 * east - 250.0 * north
    d_true = 1e-7

    logs = []
    for rx, drift in ((base, 0.0), (rover_pos, d_true)):
        iq, _ = synthesize_constellation(
            sats, rx, DEMO_GPS_START_SOW, 16.0, fs, noise_sigma=0.25,
            receiver_clock_drift=drift,
        )
        recv = Receiver(ArraySampleSource(iq, fs), ReceiverConfig(),
                        eligible_prns=prns)
        log = CarrierPhaseLog(recv.sample_rate, recv.samples_per_prn,
                              recv.config.tracking)
        recv.add_block_listener(log.listener())
        recv.run()
        logs.append(log)

    res = time_transfer(logs[0], logs[1], base, rover_pos, _demo_sv_fn(prns))
    assert abs(res.drift_s_per_s - d_true) < 3e-9
    assert abs(res.drift_carrier_s_per_s - d_true) < 1e-9
    assert res.sigma_offset_s < 3e-9  # nanosecond-level epoch scatter
    # The offset series is d * t from a shared start.
    assert abs(res.offset_at_start_s - d_true * res.epochs_s[0]) < 5e-9


# --------------------------------------------------------------------------
# Independent receiver clocks: stream alignment + interpolated DD
# --------------------------------------------------------------------------


def test_unwrap_code_delay():
    from gypsum_tpu.solve.rtk import _unwrap_code_delay

    t = np.arange(5000) * 1e-3
    true = 0.95e-3 + 2.7e-6 * t  # range-rate-scale drift crossing the wrap
    wrapped = true % 1e-3
    un = _unwrap_code_delay(wrapped)
    # Continuous and equal to the truth up to the starting branch.
    assert np.allclose(np.diff(un), np.diff(true), atol=1e-12)
    assert np.allclose(un - un[0], true - true[0], atol=1e-12)


def test_independent_clock_rtk_end_to_end():
    """Rover sampled on its OWN clock — started 2.37 ms later in GPS time
    and drifting at 2e-8 — must still fix to millimeters: the alignment is
    estimated from the observables (sub-ms from SD code, drift from SD
    carrier) and the rover is interpolated onto the base epochs."""
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        DEMO_PRNS_8,
        demo_constellation,
    )
    from gypsum_tpu.solve.rtk import estimate_stream_alignment

    fs = 2.046e6
    prns = DEMO_PRNS_8[:6]
    sats = demo_constellation(prns)
    base = lla_to_ecef(51.5, -0.1, 80.0)
    east, north, up = enu_basis(base)
    truth = 11.0 * east - 7.5 * north + 2.0 * up
    rover = base + truth
    offset_true = 2.37e-3  # rover's first sample is 2.37 ms late in GPS time
    drift_rover = 2e-8

    seconds = 16.0
    logs = []
    for rx, sow, drift in (
        (base, DEMO_GPS_START_SOW, 0.0),
        (rover, DEMO_GPS_START_SOW + offset_true, drift_rover),
    ):
        iq, _ = synthesize_constellation(
            sats, rx, sow, seconds, fs, noise_sigma=0.25,
            receiver_clock_drift=drift,
        )
        recv = Receiver(ArraySampleSource(iq, fs), ReceiverConfig(),
                        eligible_prns=prns)
        log = CarrierPhaseLog(recv.sample_rate, recv.samples_per_prn,
                              recv.config.tracking)
        recv.add_block_listener(log.listener())
        recv.run()
        logs.append(log)

    # Whole-ms part from "decoded time bases" (here: the known 2 ms); the
    # estimator recovers the sub-ms part and the drift from the data.
    align = estimate_stream_alignment(logs[0], logs[1], prns=prns,
                                      coarse_offset_s=2e-3)
    # r_b = offset + (1 + drift) r_v: rover stream 0 is at base stream
    # +offset_true; rover seconds run long by d (synth: t = sow + r(1-d)),
    # so the relative rate is -drift_rover.
    assert abs(align.offset_s - offset_true) < 0.5e-6, align
    assert abs(align.drift - (-drift_rover)) < 2e-9, align
    assert align.sigma_offset_s < 1e-6

    dd = form_double_differences(logs[0], logs[1], prns=prns,
                                 epoch_every_ms=200, settle_ms=2000,
                                 alignment=align)
    sol = solve_baseline(dd, _demo_sv_fn(prns), base)
    err_float = np.linalg.norm(sol.baseline_float_m - truth)
    assert err_float < 0.5, f"float baseline off by {err_float:.2f} m"
    assert sol.fixed, f"not fixed (ratio {sol.ratio:.2f})"
    err_fixed = np.linalg.norm(sol.baseline_fixed_m - truth)
    assert err_fixed < 0.010, f"fixed baseline off by {err_fixed*1000:.1f} mm"
    assert sol.phase_rms_half_cycles < 0.02

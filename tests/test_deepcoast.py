"""Deep-integration ranging on coasting channels (track/deepmeas.py).

The vector coast of round 3 held a blocked channel's NCOs on predicted
geometry but went blind: no measurement, no fix contribution, and a
coast_max_s deadline that dropped the channel even when the signal was
merely weak. The deep-integration tier re-correlates each block's raw IQ
in a narrow window around the prediction (grouped coherent x non-coherent,
the acquire/deep.py structure) and keeps MEASURING code phase and Doppler
~7-10 dB below the tracking loops' threshold — so the receiver keeps
producing genuine position fixes through a deep fade that blinds every
scalar loop. The reference has no counterpart at any tier
(reference: gypsum/receiver.py:248-267 can only drop and reacquire).
"""

import numpy as np
import pytest

from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ
from gypsum_tpu.io.sources import ArraySampleSource
from gypsum_tpu.runtime.receiver import Receiver
from gypsum_tpu.signal.constellation import synthesize_constellation
from gypsum_tpu.signal.prn import ALL_PRN_IDS
from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
from gypsum_tpu.solve.geodesy import lla_to_ecef
from gypsum_tpu.track.deepmeas import DeepCoastMeasurer

FS = 2.046e6
L = 2046
RX = lla_to_ecef(51.5, -0.1, 80.0)


# ------------------------------------------------------------------ unit


def test_measures_code_and_doppler_below_loop_threshold():
    """At -17 dB vs the nominal scene amplitude (far below PLL/DLL lock),
    a 1 s block measurement recovers a deliberately wrong prediction's code
    phase to ~0.1 sample and Doppler to ~1 Hz."""
    sats = demo_constellation([25], amplitude=0.03)
    iq, truth = synthesize_constellation(
        sats, RX, DEMO_GPS_START_SOW, 1.2, FS, noise_sigma=0.35, seed=3
    )
    m = DeepCoastMeasurer(FS, L, ALL_PRN_IDS, TrackingConfig())
    f_true = truth.doppler_hz[25]
    cp_true = truth.code_phase_samples[25]
    delta_cp, delta_f = 2.6, 11.0
    drift = -(f_true + delta_f) * FS / GPS_L1_FREQUENCY_HZ * 1.0
    res = m.measure(
        iq[: 1000 * L],
        25,
        (cp_true + delta_cp) % L,
        drift,
        f_true + delta_f,
    )
    assert res is not None and res.detected, res
    assert abs(res.cp_error_samples - (-delta_cp)) < 0.15, res
    assert abs(res.doppler_hz - f_true) < 2.0, (res.doppler_hz, f_true)


def test_no_false_measurement_on_noise():
    """A genuinely absent signal (noise only) must never clear the gate —
    a false measurement would feed a fake pseudorange to the fix."""
    rng = np.random.default_rng(7)
    n = 600 * L
    iq = (
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2.0) * 0.35
    ).astype(np.complex64)
    m = DeepCoastMeasurer(FS, L, ALL_PRN_IDS, TrackingConfig())
    hits = 0
    for prn, cp, f in [(25, 100.0, -1500.0), (28, 900.3, 2200.0), (31, 40.7, 300.0)]:
        drift = -f * FS / GPS_L1_FREQUENCY_HZ * 0.6
        res = m.measure(iq, prn, cp, drift, f)
        assert res is not None
        hits += res.detected
    assert hits == 0


def test_short_block_returns_none():
    m = DeepCoastMeasurer(FS, L, ALL_PRN_IDS, TrackingConfig())
    iq = np.zeros(50 * L, np.complex64)  # 50 ms < min_groups * coherent_ms
    assert m.measure(iq, 25, 0.0, 0.0, 0.0) is None


# ------------------------------------------------------------------- e2e

FADE = (18.0, 30.0)
FADE_SCALE = 0.13  # ~ -17.7 dB: below every scalar loop, above the deep floor


@pytest.fixture(scope="module")
def fade_capture():
    sats = demo_constellation([25, 28, 31, 32, 3])
    for s in sats:
        s.faded_s = [(FADE[0], FADE[1], FADE_SCALE)]
    iq, _ = synthesize_constellation(
        sats, RX, DEMO_GPS_START_SOW, 36.0, FS,
        noise_sigma=0.35, receiver_clock_drift=2e-8,
    )
    return iq


def _run(iq, deep: bool):
    cfg = ReceiverConfig(
        tracking=TrackingConfig(
            watchdog_warmup_ms=1500,
            quality_drop_threshold=0.25,
            # Half the fade length: WITHOUT measurements every channel hits
            # the open-loop deadline mid-fade; WITH them each detection
            # refreshes it (the signal is demonstrably present).
            coast_max_s=6.0,
            coast_deep_measurement=deep,
            coast_meas_doppler_bins=3,
        ),
    )
    recv = Receiver(ArraySampleSource(iq, FS), cfg)
    recv.run()
    return recv


@pytest.fixture(scope="module")
def deep_run(fade_capture):
    return _run(fade_capture, deep=True)


@pytest.fixture(scope="module")
def blind_run(fade_capture):
    return _run(fade_capture, deep=False)


def test_deep_fade_keeps_measuring_and_fixing(deep_run):
    reports = deep_run.block_reports
    # Every faded channel keeps producing deep-integration measurements.
    measured = {p for r in reports for p in r.deep_measured_prns}
    assert measured == {25, 28, 31, 32, 3}, measured
    # No channel is ever dropped: each detection refreshes the coast
    # deadline even though the fade outlasts coast_max_s twice over.
    dropped = [(r.block_start, p) for r in reports for p in r.dropped_prns]
    assert not dropped, dropped
    # Least-squares fixes CONTINUE through the fade on deep-measured
    # pseudoranges (the blind receiver goes dark here — see the A/B test).
    in_fade = [
        f for f in deep_run.world.position_fixes
        if FADE[0] + 4.0 <= f.receiver_timestamp <= FADE[1] and f.kind == "lsq"
    ]
    assert len(in_fade) >= 6, [f.receiver_timestamp for f in in_fade]
    errs = [float(np.linalg.norm(f.ecef - RX)) for f in in_fade]
    assert max(errs) < 40.0, errs
    assert float(np.median(errs)) < 20.0, errs


def test_deep_fade_recovery(deep_run):
    reports = deep_run.block_reports
    recovered = [
        (r.block_start, p) for r in reports for p in r.coast_recovered_prns
    ]
    assert recovered, "no channel exited coast after the fade"
    assert all(FADE[1] <= t <= FADE[1] + 3.0 for t, _ in recovered), recovered
    post = [
        f for f in deep_run.world.position_fixes
        if f.receiver_timestamp >= FADE[1] + 3.0 and f.kind == "lsq"
    ]
    assert post, "no post-fade fixes"
    errs = [float(np.linalg.norm(f.ecef - RX)) for f in post]
    assert max(errs) < 5.0, errs


def test_blind_coast_goes_dark_in_the_same_fade(blind_run, deep_run):
    """A/B control: the identical capture without the measurement tier.
    Open-loop coasting excludes every satellite from the fix and the
    coast_max_s deadline drops the channels mid-fade."""
    fixes = [
        f for f in blind_run.world.position_fixes
        if FADE[0] + 4.0 <= f.receiver_timestamp <= FADE[1] and f.kind == "lsq"
    ]
    assert not fixes, [f.receiver_timestamp for f in fixes]
    dropped = [
        (r.block_start, p)
        for r in blind_run.block_reports
        for p in r.dropped_prns
    ]
    assert dropped, "expected coast_max_s to drop blind channels mid-fade"
    assert min(t for t, _ in dropped) < FADE[1], dropped

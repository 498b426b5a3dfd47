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


def test_static_offset_wiped_in_float64():
    """GLONASS FDMA path: a channel at a ~MHz sub-band offset must measure
    as precisely as a baseband one — the offset is wiped on host in float64
    (float32 chunk phases at 4e6 cycles would jitter ~45° per ms; advisor
    finding, round 3)."""
    sats = demo_constellation([25], amplitude=0.03)
    iq, truth = synthesize_constellation(
        sats, RX, DEMO_GPS_START_SOW, 1.2, FS, noise_sigma=0.35, seed=3
    )
    off = 3_937_500.0  # GLONASS k=7 sub-band offset
    n = 1000 * L
    t = np.arange(n, dtype=np.float64) / FS
    shifted = (iq[:n] * np.exp(2j * np.pi * off * t)).astype(np.complex64)
    m = DeepCoastMeasurer(FS, L, ALL_PRN_IDS, TrackingConfig())
    f_true = truth.doppler_hz[25]
    cp_true = truth.code_phase_samples[25]
    drift = -f_true * FS / GPS_L1_FREQUENCY_HZ * 1.0
    res = m.measure(
        shifted, 25, cp_true % L, drift, f_true, static_offset_hz=off
    )
    assert res is not None and res.detected, res
    assert abs(res.cp_error_samples) < 0.15, res
    assert abs(res.doppler_hz - f_true) < 2.0, (res.doppler_hz, f_true)


def test_short_block_returns_none():
    m = DeepCoastMeasurer(FS, L, ALL_PRN_IDS, TrackingConfig())
    iq = np.zeros(50 * L, np.complex64)  # 50 ms < min_groups * coherent_ms
    assert m.measure(iq, 25, 0.0, 0.0, 0.0) is None


# ---------------------------------------------------- cross-correlation gate


def test_xcorr_veto_flags_sidelobe_detections():
    """The one deadly failure mode of this tier: a DEAD PRN's narrow window
    'detects' a strong live satellite through C/A cross-correlation
    sidelobes (worst case 65/1023 ~ -24 dB) whenever the live SV's Doppler
    aliases onto a 1 kHz code line. The noise gate cannot see this (the
    artifact is real signal energy), so the receiver vetoes detections that
    are Doppler-consistent with a live channel and not clearly stronger
    than its sidelobe bound (track/deepmeas.py:xcorr_suspect)."""
    from gypsum_tpu.track.deepmeas import CA_XCORR_PEAK, xcorr_suspect

    live = [(1000.0 - 12.0, 450.0)]  # live SV at 988 Hz, per-ms prompt 450
    bound = 450.0 * 10 * 100 * CA_XCORR_PEAK
    # A detection at the live SV's Doppler folded by one code line, at the
    # sidelobe level: vetoed.
    assert xcorr_suspect(-12.0, bound, 100, 10, live, 60.0, 2.0)
    # Same Doppler but far stronger than any sidelobe could be: passes.
    assert not xcorr_suspect(-12.0, 3.0 * bound, 100, 10, live, 60.0, 2.0)
    # Doppler far from every code line of the live SV: passes at any level.
    assert not xcorr_suspect(400.0, bound, 100, 10, live, 60.0, 2.0)
    # No live channels (everyone faded): nothing to veto against.
    assert not xcorr_suspect(-12.0, bound, 100, 10, [], 60.0, 2.0)


def test_measurer_detects_crosscorr_artifact_that_the_veto_must_catch():
    """Documents the hazard end-to-end at the measurer level: with a strong
    live satellite on the air and the target PRN ABSENT, a window centered
    near the live SV's Doppler (mod 1 kHz) clears the noise-only gate — the
    raw detection is genuinely there, which is exactly why the receiver
    layers the cross-correlation veto on top."""
    sats = demo_constellation([25], amplitude=0.22)
    iq, truth = synthesize_constellation(
        sats, RX, DEMO_GPS_START_SOW, 1.2, FS, noise_sigma=0.35, seed=11
    )
    m = DeepCoastMeasurer(FS, L, ALL_PRN_IDS, TrackingConfig())
    f_live = truth.doppler_hz[25]
    from gypsum_tpu.track.deepmeas import CA_XCORR_PEAK, xcorr_suspect

    hit = None
    # Scan dead PRNs x code lines for an artifact that clears the noise
    # gate (alignment depends on the PRN pair's cross-spectrum).
    for prn in (1, 7, 13, 21, 29):
        for line in (-2000.0, -1000.0, 0.0, 1000.0, 2000.0):
            f_pred = f_live + line
            drift = -f_pred * FS / GPS_L1_FREQUENCY_HZ
            for cp in (150.0, 700.0, 1300.0, 1900.0):
                res = m.measure(iq[: 1000 * L], prn, cp, drift, f_pred)
                assert res is not None
                if res.detected:
                    hit = (prn, res)
                    break
            if hit:
                break
        if hit:
            break
    assert hit is not None, "expected at least one sidelobe false detection"
    prn, res = hit
    live = [(f_live, 0.22 * L)]
    assert xcorr_suspect(
        res.doppler_hz, res.peak_abs, res.groups, 10, live, 60.0, 2.0
    ), (prn, res)


# ------------------------------------------------------------------- e2e

# The fade must start AFTER the first position fix exists (~20-22 s: the
# ephemeris subframes 1-3 land at the frame phase the demo start time sets,
# same timing as test_ekf's 22 s outage) — vector coast requires a recent
# fix to predict geometry from; fading out earlier just drops every channel.
FADE = (23.0, 33.0)
# ~ -30.5 dB: the 1 kHz loops' quality EMA collapses to ~0 (measured: at
# 0.13 the PLL still tracks comfortably and no channel ever coasts; quality
# only crosses the 0.25 drop threshold below ~0.05) while the deep
# measurer's normalized strength is ~2.5 against its 1.5 gate.
FADE_SCALE = 0.03


@pytest.fixture(scope="module")
def fade_capture():
    sats = demo_constellation([25, 28, 31, 32, 3])
    for s in sats:
        s.faded_s = [(FADE[0], FADE[1], FADE_SCALE)]
    iq, _ = synthesize_constellation(
        sats, RX, DEMO_GPS_START_SOW, 38.0, FS,
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
        if FADE[0] + 5.0 <= f.receiver_timestamp <= FADE[1] and f.kind == "lsq"
    ]
    assert len(in_fade) >= 4, [f.receiver_timestamp for f in in_fade]
    errs = [float(np.linalg.norm(f.ecef - RX)) for f in in_fade]
    assert max(errs) < 50.0, errs
    assert float(np.median(errs)) < 25.0, errs


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


def test_published_protection_bounds_true_error(deep_run):
    """Round-3 verdict item 8's acceptance: every *published* lsq fix —
    including the degraded in-fade ones on deep-measured pseudoranges —
    carries a protection level that bounds its true error. The RAIM
    chi-square test (solve/integrity.py:raim_residual_test) inflates the
    sigmas feeding HPL/VPL whenever the post-fit residuals disagree with
    the formal weights, so optimistic formal sigmas can't survive a fade."""
    from gypsum_tpu.solve.geodesy import enu_basis

    enu = enu_basis(RX)
    checked = 0
    for f in deep_run.world.position_fixes:
        if f.kind != "lsq" or f.protection is None:
            continue
        err = enu @ (np.asarray(f.ecef) - RX)
        horiz = float(np.hypot(err[0], err[1]))
        vert = float(abs(err[2]))
        assert horiz <= f.protection["hpl_m"], (
            f.receiver_timestamp, horiz, f.protection)
        assert vert <= f.protection["vpl_m"], (
            f.receiver_timestamp, vert, f.protection)
        checked += 1
    assert checked >= 10, "expected protection levels on most lsq fixes"


def test_blind_coast_goes_dark_in_the_same_fade(blind_run, deep_run):
    """A/B control: the identical capture without the measurement tier.
    Open-loop coasting excludes every satellite from the fix and the
    coast_max_s deadline drops the channels mid-fade."""
    fixes = [
        f for f in blind_run.world.position_fixes
        if FADE[0] + 5.0 <= f.receiver_timestamp <= FADE[1] and f.kind == "lsq"
    ]
    assert not fixes, [f.receiver_timestamp for f in fixes]
    dropped = [
        (r.block_start, p)
        for r in blind_run.block_reports
        for p in r.dropped_prns
    ]
    assert dropped, "expected coast_max_s to drop blind channels mid-fade"
    assert min(t for t, _ in dropped) < FADE[1], dropped

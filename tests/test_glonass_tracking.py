"""FDMA (GLONASS) tracking tests: carrier offsets through the real tracker."""

import numpy as np
import pytest

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.core.constants import (
    GLONASS_L1_BASE_HZ,
    GLONASS_L1_CHANNEL_SPACING_HZ,
)
from gypsum_tpu.signal.constellation import synthesize_constellation
from gypsum_tpu.signal.prn import GLONASS_PRN_IDS, glonass_frequency_number
from gypsum_tpu.signal.scenarios import (
    DEMO_GLONASS_SAMPLE_RATE as FS,
    DEMO_GPS_START_SOW,
    demo_glonass_constellation,
    demo_receiver_ecef,
)
from gypsum_tpu.track.loop import TrackerBank

L = int(FS / 1000)
RX = demo_receiver_ecef()


def _capture(ks, seconds, noise=0.25, seed=0):
    sats = demo_glonass_constellation(list(ks))
    iq, truth = synthesize_constellation(
        sats, RX, DEMO_GPS_START_SOW, seconds, FS, noise_sigma=noise, seed=seed
    )
    return sats, iq, truth


def _bank(cfg, n_channels=4):
    return TrackerBank(
        FS, L, cfg, n_channels=n_channels, prns=GLONASS_PRN_IDS
    )


def _assign_from_truth(bank, sat, truth):
    prn = sat.prn
    k = glonass_frequency_number(prn)
    offset = k * GLONASS_L1_CHANNEL_SPACING_HZ
    bank.assign(
        prn=prn,
        doppler_hz=truth.doppler_hz[prn] - offset,
        code_phase_samples=truth.code_phase_samples[prn],
        carrier_phase_rad=0.0,
        carrier_offset_hz=offset,
    )


@pytest.mark.parametrize("tracker", ["matmul", "scan"])
def test_fdma_channels_lock_and_track_doppler(tracker):
    cfg = TrackingConfig(
        block_size_ms=500,
        aiding_carrier_hz=GLONASS_L1_BASE_HZ,
        use_matmul_tracker=(tracker == "matmul"),
        use_pallas_block_tracker=False,
    )
    sats, iq, truth = _capture(ks=(-2, 0, 2), seconds=2.0)
    bank = _bank(cfg)
    for sat in sats:
        _assign_from_truth(bank, sat, truth)
    blocks = iq.reshape(-1, L)
    last = {}
    for b in range(4):
        obs = bank.process_block(blocks[b * 500 : (b + 1) * 500], b * 0.5)
        for o in obs:
            last[o.prn] = o
    for sat in sats:
        o = last[sat.prn]
        k = glonass_frequency_number(sat.prn)
        assert not o.lost
        assert o.locked[-1], f"channel k={k} never locked"
        assert o.quality[-1] > 0.6
        residual = o.dopplers[-1] - (
            truth.doppler_hz[sat.prn] - k * GLONASS_L1_CHANNEL_SPACING_HZ
        )
        # The loop's Doppler state is the offset-RELATIVE Doppler; it must
        # track the geometric truth, not absorb the 562.5 kHz sub-band.
        assert abs(residual) < 5.0, f"k={k} doppler residual {residual:.1f} Hz"


def test_wrong_offset_fails_to_track():
    """Assigning the k=+2 satellite with a k=0 offset leaves nothing to
    track in that sub-band: the FDMA offset is load-bearing."""
    cfg = TrackingConfig(block_size_ms=500, aiding_carrier_hz=GLONASS_L1_BASE_HZ)
    sats, iq, truth = _capture(ks=(2,), seconds=1.0)
    sat = sats[0]
    bank = _bank(cfg, n_channels=1)
    bank.assign(
        prn=sat.prn,
        doppler_hz=truth.doppler_hz[sat.prn] - 2 * GLONASS_L1_CHANNEL_SPACING_HZ,
        code_phase_samples=truth.code_phase_samples[sat.prn],
        carrier_phase_rad=0.0,
        carrier_offset_hz=0.0,  # wrong: satellite is at k=+2
    )
    obs = bank.process_block(iq.reshape(-1, L)[:500], 0.0)
    assert float(obs[0].quality[-1]) < 0.3


def test_strings_decode_through_real_tracker():
    """End-to-end signal chain minus the receiver: synthesized FDMA band ->
    matmul tracker -> pseudosymbols -> string decoder -> intact ephemeris
    strings with 2 s edges."""
    from gypsum_tpu.nav.glonass import GlonassStringDecoder
    from gypsum_tpu.solve.glonass import strings_from_glonass_ephemeris

    cfg = TrackingConfig(block_size_ms=1000, aiding_carrier_hz=GLONASS_L1_BASE_HZ)
    sats, iq, truth = _capture(ks=(1,), seconds=7.0, noise=0.2)
    sat = sats[0]
    bank = _bank(cfg, n_channels=1)
    _assign_from_truth(bank, sat, truth)
    dec = GlonassStringDecoder()
    events = []
    blocks = iq.reshape(-1, L)
    for b in range(7):
        obs = bank.process_block(blocks[b * 1000 : (b + 1) * 1000], float(b))
        events += dec.process_block(
            obs[0].pseudosymbol_signs.astype(np.float64), obs[0].start_times
        )
    assert len(events) >= 2
    want = strings_from_glonass_ephemeris(sat.ephemeris)
    decoded_ms = []
    for e in events:
        m = e.string.m
        decoded_ms.append(m)
        if m in want and m != 1:
            assert e.string.fields == want[m].fields
    edges = np.array([e.trailing_edge_receiver_timestamp for e in events])
    np.testing.assert_allclose(np.diff(edges), 2.0, atol=2e-3)
    # The decoded strings walk the frame in order.
    assert decoded_ms == sorted(decoded_ms)


def test_block_kernel_guard_rejects_offsets():
    cfg = TrackingConfig(
        use_pallas_block_tracker=True, use_matmul_tracker=False
    )
    bank = _bank(cfg, n_channels=1)
    with pytest.raises(ValueError, match="FDMA"):
        bank.assign(
            prn=GLONASS_PRN_IDS[0], doppler_hz=0.0, code_phase_samples=0.0,
            carrier_phase_rad=0.0, carrier_offset_hz=562.5e3,
        )


def test_fdma_acquisition_finds_channels():
    """The acquisition engine with per-row FDMA centers: every on-air
    channel detected at its truth code phase and absolute baseband
    frequency; the empty channels stay below threshold."""
    from gypsum_tpu.acquire.engine import AcquisitionEngine

    ks = (-2, 0, 1)
    sats, iq, truth = _capture(ks=ks, seconds=0.2, noise=0.3)
    offsets = tuple(
        float(glonass_frequency_number(p) * GLONASS_L1_CHANNEL_SPACING_HZ)
        for p in GLONASS_PRN_IDS
    )
    eng = AcquisitionEngine(
        FS, L, prns=GLONASS_PRN_IDS, center_offsets_hz=offsets
    )
    results = {r.prn: r for r in eng.acquire_all(iq[: 10 * L].reshape(10, L))}
    on_air = {s.prn for s in sats}
    for prn, r in results.items():
        if prn in on_air:
            assert r.strength > eng.config.detection_threshold, prn
            err_cp = (r.code_phase_samples - truth.code_phase_samples[prn] + L / 2) % L - L / 2
            assert abs(err_cp) <= 1.0
            assert abs(r.doppler_hz - truth.doppler_hz[prn]) < 30.0
        else:
            assert r.strength < eng.config.detection_threshold, prn


def test_fdma_acquisition_misaligned_offsets_rejected():
    from gypsum_tpu.acquire.engine import AcquisitionEngine

    with pytest.raises(ValueError):
        AcquisitionEngine(FS, L, prns=GLONASS_PRN_IDS, center_offsets_hz=(0.0,))
    with pytest.raises(ValueError, match="one code"):
        AcquisitionEngine(
            FS, L, prns=(25, 28), center_offsets_hz=(0.0, 562.5e3)
        )

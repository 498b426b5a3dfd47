"""GLONASS band synthesis tests: verify the capture with independent numpy
correlation before any receiver machinery touches it."""

import numpy as np
import pytest

from gypsum_tpu.core.constants import (
    GLONASS_L1_BASE_HZ,
    GLONASS_L1_CHANNEL_SPACING_HZ,
)
from gypsum_tpu.signal.constellation import (
    ConstellationSatellite,
    GlonassSatellite,
    synthesize_constellation,
)
from gypsum_tpu.signal.prn import glonass_frequency_number, sampled_replica
from gypsum_tpu.signal.scenarios import (
    DEMO_GLONASS_SAMPLE_RATE as FS,
    DEMO_GPS_START_SOW,
    demo_constellation,
    demo_glonass_constellation,
    demo_receiver_ecef,
)

L = int(FS / 1000)  # 4092 samples per 1 ms code period
RX = demo_receiver_ecef()


def _synthesize(seconds=0.2, ks=(-2, 0, 2), noise=0.0, **kw):
    sats = demo_glonass_constellation(list(ks))
    iq, truth = synthesize_constellation(
        sats, RX, DEMO_GPS_START_SOW, seconds, FS, noise_sigma=noise, **kw
    )
    return sats, iq, truth


def _correlate_channel(iq_ms, prn, doppler_hz, n_ms=8):
    """Non-coherent FFT correlation profile at one baseband frequency."""
    rep = sampled_replica(prn, L, dtype=np.complex128)
    rep_fft = np.conj(np.fft.fft(rep))
    t = np.arange(L) / FS
    prof = np.zeros(L)
    for k in range(n_ms):
        x = iq_ms[k * L : (k + 1) * L] * np.exp(-2j * np.pi * doppler_hz * t)
        prof += np.abs(np.fft.ifft(np.fft.fft(x) * rep_fft))
    return prof


def test_each_channel_correlates_at_truth_code_phase_and_offset():
    sats, iq, truth = _synthesize()
    for sat in sats:
        prn = sat.prn
        prof = _correlate_channel(iq, prn, truth.doppler_hz[prn])
        peak = int(np.argmax(prof))
        strength = prof[peak] / np.mean(np.delete(prof, peak))
        assert strength > 8.0, f"channel {prn} not detectable"
        expected = truth.code_phase_samples[prn]
        err = (peak - expected + L / 2) % L - L / 2
        assert abs(err) <= 1.0, f"channel {prn} code phase off by {err}"


def test_fdma_offset_separates_satellites():
    """All channels share ONE code: frequency is what separates satellites.
    Correlating at an UNOCCUPIED channel's frequency (k=1; only -2/0/2 are
    on air) finds nothing, while each occupied offset finds exactly its own
    satellite's code phase — the FDMA analogue of GPS code separation."""
    sats, iq, truth = _synthesize(ks=(-2, 0, 2))
    prn0 = sats[1].prn  # k = 0 (same 511 code for every channel)
    empty = _correlate_channel(
        iq, prn0, truth.doppler_hz[prn0] + GLONASS_L1_CHANNEL_SPACING_HZ
    )
    s_empty = empty.max() / np.mean(np.delete(empty, int(np.argmax(empty))))
    assert s_empty < 3.0  # k = 1: nobody there
    # k = 2's sub-band: the k = 2 satellite appears at ITS code phase.
    prn2 = sats[2].prn
    prof = _correlate_channel(iq, prn0, truth.doppler_hz[prn2])
    peak = int(np.argmax(prof))
    err = (peak - truth.code_phase_samples[prn2] + L / 2) % L - L / 2
    assert abs(err) <= 1.0
    assert prof[peak] / np.mean(np.delete(prof, peak)) > 8.0


def test_truth_doppler_includes_fdma_offset_and_geometry():
    sats, iq, truth = _synthesize(ks=(-2, 1))
    for sat in sats:
        k = glonass_frequency_number(sat.prn)
        base = truth.doppler_hz[sat.prn] - k * GLONASS_L1_CHANNEL_SPACING_HZ
        # Geometric Doppler at GLONASS L1 stays within +/-3.5 kHz.
        assert abs(base) < 3500.0
        assert abs(truth.doppler_hz[sat.prn] - k * GLONASS_L1_CHANNEL_SPACING_HZ) < 3500.0


def test_glonass_time_offset_shifts_code_phase():
    """The sub-us inter-system offset delays the SV timeline: code phases
    move by offset * fs samples (mod the code period)."""
    off = 2.0e-4  # 200 us for a visible, unambiguous shift
    _, _, t0 = _synthesize(ks=(0,), seconds=0.05)
    _, _, t1 = _synthesize(ks=(0,), seconds=0.05, glonass_time_offset_s=off)
    prn = demo_glonass_constellation([0])[0].prn
    spp = FS / 1000.0
    d = (t0.code_phase_samples[prn] - t1.code_phase_samples[prn]) % spp
    assert d == pytest.approx((off * FS) % spp, abs=0.2)


def test_strings_decode_from_synthesized_band():
    """Demodulate channel k=0 with the truth wipeoff and feed the
    pseudosymbols straight into the string decoder: the broadcast
    ephemeris strings must come back intact with 2 s edge spacing."""
    from gypsum_tpu.nav.glonass import GlonassStringDecoder
    from gypsum_tpu.solve.glonass import (
        glonass_ephemeris_from_strings,
        strings_from_glonass_ephemeris,
    )

    sats, iq, truth = _synthesize(ks=(0,), seconds=6.5, noise=0.05)
    sat = sats[0]
    prn = sat.prn
    rep = sampled_replica(prn, L, dtype=np.complex128)
    cp0 = truth.code_phase_samples[prn]
    n_ms = int(len(iq) / L)
    # CONTINUOUS truth-Doppler wipeoff (a per-ms local ramp would leave
    # phase jumps between milliseconds), then prompt correlations with the
    # code-Doppler drift applied (the code phase advances by
    # -doppler/f_carrier * L samples per ms — ~7 samples/s here; ignoring
    # it kills the correlation within a second).
    t_all = np.arange(n_ms * L) / FS
    wiped = iq[: n_ms * L] * np.exp(-2j * np.pi * truth.doppler_hz[prn] * t_all)
    drift = truth.doppler_hz[prn] / sat.ephemeris.carrier_frequency_hz * L
    p = np.array([
        np.vdot(
            np.roll(rep, int(round(cp0 - drift * k)) % L),
            wiped[k * L : (k + 1) * L],
        )
        for k in range(n_ms)
    ])
    assert np.abs(p).mean() > 0.5 * 0.22 * L  # coherent prompts throughout
    # Residual carrier (Doppler slew over 6.5 s): fit the squared-prompt
    # phase (BPSK-flip free) with a cubic and counter-rotate by half of it.
    z = p * p
    phi2 = np.unwrap(np.angle(z))
    k_idx = np.arange(n_ms)
    fit = np.polyval(np.polyfit(k_idx, phi2, 3), k_idx)
    signs = np.sign(np.real(p * np.exp(-0.5j * fit)))
    signs[signs == 0] = 1.0
    times = np.arange(n_ms) * 1e-3
    dec = GlonassStringDecoder()
    events = dec.process_block(signs, times)
    assert len(events) >= 2
    ms = [e.string.m for e in events]
    # Consecutive string numbers and 2 s spacing.
    edges = [e.trailing_edge_receiver_timestamp for e in events]
    np.testing.assert_allclose(np.diff(edges), 2.0, atol=2e-3)
    got = {e.string.m: e.string for e in events}
    want = strings_from_glonass_ephemeris(sat.ephemeris)
    for m in got:
        if m in want and m != 1:  # string 1 differs by per-frame tk
            assert got[m].fields == want[m].fields


def test_mixed_band_rejected():
    sats = demo_constellation([25]) + demo_glonass_constellation([0])
    with pytest.raises(ValueError):
        synthesize_constellation(sats, RX, DEMO_GPS_START_SOW, 0.01, FS)

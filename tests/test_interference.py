"""Narrowband interference detection + excision (ops/interference.py,
io.sources.NotchingSampleSource, synth CW jammer impairment).

The reference has no interference handling at all; ground truth comes from
injecting a known tone and checking (a) the detector statistics, (b) signal
preservation through the notch, and (c) acquisition/fix recovery at jammer
levels that break the unprotected path."""

from __future__ import annotations

import numpy as np
import pytest

from gypsum_tpu.ops.interference import make_stft_notch_jax, stft_notch_np

FS = 2.046e6


def _tone(n, freq, amp, phase=0.3):
    t = np.arange(n) / FS
    return (amp * np.exp(1j * (2 * np.pi * freq * t + phase))).astype(np.complex64)


def _noise(n, sigma, seed):
    rng = np.random.default_rng(seed)
    return (sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n)) /
            np.sqrt(2)).astype(np.complex64)


def test_no_false_alarms_on_noise():
    """Thermal noise alone (GPS signals are ~20 dB below it and spectrally
    flat) must never trip the detector."""
    for seed in range(20):
        _, rep = stft_notch_np(_noise(102_300, 0.3, seed), FS)
        assert not rep.detected, f"false alarm at seed {seed}: {rep}"


def test_detects_and_localizes_tone():
    n = 102_300  # 50 ms
    x = _noise(n, 0.3, 7) + _tone(n, 257_000.0, 0.5)  # J/N ~ +4.4 dB
    clean, rep = stft_notch_np(x, FS)
    assert rep.detected
    assert rep.peak_over_median_db > 10.0
    assert any(abs(f - 257_000.0) < 2 * FS / 4096 for f in rep.freqs_hz)
    # Excision actually removed the tone's power: the cleaned block is back
    # at the noise floor (tone power 0.25 vs noise 0.09 per sample).
    p_dirty = np.mean(np.abs(x) ** 2)
    p_clean = np.mean(np.abs(clean) ** 2)
    p_noise = np.mean(np.abs(_noise(n, 0.3, 7)) ** 2)
    assert p_dirty / p_noise > 3.0
    assert p_clean / p_noise < 1.05


def test_notch_preserves_unmasked_signal():
    """With a strong tone on top of a known signal, the notched output must
    equal the signal up to the THEORETICAL floor of any notch filter: the
    signal's own content in the masked bins, i.e. amplitude sqrt(fraction).
    Block-edge frames (the interferer truncated by the block boundary
    splatters broadband there) are excluded — one frame per block end, and
    consecutive blocks hide them inside tracking's 1000-ms integrations."""
    n = 204_600
    nfft = 4096
    sig = _noise(n, 0.5, 3)  # stand-in for signal+noise composite
    x = sig + _tone(n, -310_000.0, 8.0)
    clean, rep = stft_notch_np(x, FS)
    assert rep.detected and rep.fraction < 0.005, rep
    interior = slice(2 * nfft, n - 2 * nfft)
    rel_err = (np.linalg.norm(clean[interior] - sig[interior])
               / np.linalg.norm(sig[interior]))
    floor = np.sqrt(rep.fraction)
    assert rel_err < 1.5 * floor + 0.01, (
        f"notch distorted the signal by {rel_err:.3f} "
        f"(theoretical floor {floor:.3f})"
    )
    # The 24 dB J/S tone itself is gone to better than -45 dB: project the
    # residual onto the tone.
    tone = _tone(n, -310_000.0, 1.0)[interior]
    resid = np.vdot(tone, (clean - x)[interior] + _tone(n, -310_000.0, 8.0)[interior])
    leak = abs(resid) / np.linalg.norm(tone) ** 2  # residual tone amplitude
    assert leak < 0.05, f"tone residual amplitude {leak:.4f} of 8.0"


def test_swept_jammer_masked_as_band():
    """A chirped jammer paints a band over the block; the mask follows it
    as long as the swept band stays under max_fraction."""
    n = 204_600  # 100 ms; 20 kHz/s sweep -> 2 kHz band ~ 4-5 bins
    t = np.arange(n) / FS
    chirp = np.exp(1j * 2 * np.pi * (100e3 * t + 0.5 * 20e3 * t * t))
    x = _noise(n, 0.3, 11) + (4.0 * chirp).astype(np.complex64)
    clean, rep = stft_notch_np(x, FS)
    assert rep.detected
    p_noise = np.mean(np.abs(_noise(n, 0.3, 11)) ** 2)
    assert np.mean(np.abs(clean) ** 2) / p_noise < 1.1


def test_jax_parity_with_numpy():
    n = 40_960
    x = _noise(n, 0.4, 5) + _tone(n, 150_000.0, 3.0)
    clean_np, rep = stft_notch_np(x, FS)
    assert rep.detected
    fn = make_stft_notch_jax(n, FS)
    planes = np.stack([x.real, x.imag]).astype(np.float32)
    out, stats = fn(planes)
    out = np.asarray(out)
    assert int(stats[0]) == rep.n_bins
    assert bool(stats[2])  # applied
    clean_jax = out[0] + 1j * out[1]
    err = np.linalg.norm(clean_jax - clean_np) / np.linalg.norm(clean_np)
    assert err < 2e-3, f"jax/numpy parity {err:.2e}"

    # No-detection case passes the input through bit-identically.
    quiet = _noise(n, 0.4, 6)
    out_q, stats_q = fn(np.stack([quiet.real, quiet.imag]).astype(np.float32))
    assert not bool(stats_q[2])
    assert np.array_equal(np.asarray(out_q)[0], quiet.real.astype(np.float32))


def test_acquisition_survives_jammer_only_with_notch():
    """A CW jammer strong enough to bury the correlation peaks: the raw
    capture must fail acquisition, the notched capture must recover every
    satellite with correct Doppler."""
    from gypsum_tpu.acquire.engine import AcquisitionEngine
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

    fs, L, M = 2.046e6, 2046, 10
    sats = [
        SyntheticSatellite(prn=25, doppler_hz=1234.0, delay_samples=701, amplitude=0.3),
        SyntheticSatellite(prn=28, doppler_hz=-2500.0, delay_samples=100, amplitude=0.3),
        SyntheticSatellite(prn=31, doppler_hz=400.0, delay_samples=1500, amplitude=0.3),
        SyntheticSatellite(prn=32, doppler_hz=-3900.0, delay_samples=900, amplitude=0.3),
    ]
    n = M * L
    iq = synthesize_iq(sats, n, fs, noise_sigma=0.3, seed=2)
    jammed = iq + _tone(n, 257_000.0, 12.0)  # J/S ~ 32 dB

    engine = AcquisitionEngine(sample_rate=fs, samples_per_prn=L)
    raw = engine.detect(jammed.reshape(M, L), eligible_prns={25, 28, 31, 32})
    clean, rep = stft_notch_np(jammed, fs)
    assert rep.detected
    notched = engine.detect(
        clean.reshape(M, L).astype(np.complex64),
        eligible_prns={25, 28, 31, 32},
    )
    assert len(raw) < 4, f"jammer was not strong enough: {raw}"
    assert len(notched) == 4
    truth = {s.prn: s.doppler_hz for s in sats}
    for r in notched:
        assert abs(r.doppler_hz - truth[r.prn]) < 20.0


def test_replay_fixes_through_jammer_with_notch():
    """End to end: a 25 s scene with a 10x-amplitude CW jammer fixes through
    NotchingSampleSource; the detection events cover the whole stream."""
    from gypsum_tpu.core.config import ReceiverConfig
    from gypsum_tpu.io.sources import ArraySampleSource, NotchingSampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import (
        RfImpairments,
        apply_rf_impairments,
        synthesize_constellation,
    )
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        DEMO_PRNS_8,
        demo_constellation,
    )
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    fs = 2.046e6
    prns = DEMO_PRNS_8[:5]  # 5 SVs: integer-ms repair stays overdetermined
    truth = lla_to_ecef(51.5, -0.1, 80.0)
    iq, _ = synthesize_constellation(
        demo_constellation(prns), truth, DEMO_GPS_START_SOW, 25.0, fs,
        noise_sigma=0.25,
    )
    imp = RfImpairments(cw_amplitude=10.0, cw_freq_hz=257e3)
    jammed = apply_rf_impairments(iq, fs, imp)

    source = NotchingSampleSource(ArraySampleSource(jammed, fs))
    recv = Receiver(source, ReceiverConfig(), eligible_prns=prns)
    reports = recv.run(until_fix=True)
    fix = reports[-1].fix
    assert fix is not None, "no fix through the jammer"
    err = np.linalg.norm(fix.ecef - truth)
    assert err < 20.0, f"fix off by {err:.1f} m"
    assert source.interference_seconds >= fix.receiver_timestamp - 2.0
    assert all(rep.fraction < 0.01 for _, rep in source.events)

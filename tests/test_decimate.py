"""Decimating front-end tests: filters, polyphase resampler vs numpy oracle,
streaming continuity, and acquisition after decimation (BASELINE config 4 —
high-rate captures the reference declares but cannot process)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gypsum_tpu.io.sources import ArraySampleSource, DecimatingSampleSource
from gypsum_tpu.ops.decimate import (
    decimation_filter,
    design_lowpass,
    fir_decimate,
    rational_filter,
    resample_rational,
)


def _upfirdn_oracle(x, h, up, down):
    """Zero-stuff, filter ('VALID' correlation like lax.conv), stride."""
    u = np.zeros(len(x) * up - (up - 1), dtype=complex)
    u[::up] = x
    t = len(h)
    n_out = (len(u) - t) // down + 1
    y = np.empty(n_out, dtype=complex)
    for m in range(n_out):
        y[m] = np.dot(h, u[m * down : m * down + t])
    return y


def test_lowpass_design():
    h = design_lowpass(121, cutoff=0.25)
    assert len(h) == 121
    np.testing.assert_allclose(h.sum(), 1.0, rtol=1e-6)
    w = np.fft.rfftfreq(4096) * 2  # in Nyquist fractions
    mag = np.abs(np.fft.rfft(h, 4096))
    assert mag[w < 0.15].min() > 0.95  # passband
    assert mag[w > 0.4].max() < 0.01  # stopband


def test_fir_decimate_matches_oracle(rng):
    x = (rng.standard_normal(4000) + 1j * rng.standard_normal(4000)).astype(np.complex64)
    h = decimation_filter(4)
    got = np.asarray(fir_decimate(jnp.asarray(x), jnp.asarray(h), 4))
    want = _upfirdn_oracle(x, h, 1, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resample_rational_matches_oracle(rng):
    x = (rng.standard_normal(800) + 1j * rng.standard_normal(800)).astype(np.complex64)
    h = rational_filter(3, 7, taps_per_phase=6)
    got = np.asarray(resample_rational(jnp.asarray(x), jnp.asarray(h), 3, 7))
    want = _upfirdn_oracle(x, h, 3, 7)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_decimate_preserves_tone(rng):
    # A 50 kHz tone at 8.184 Msps must survive /4 decimation to 2.046 Msps.
    fs_in, factor = 8.184e6, 4
    t = np.arange(81840) / fs_in
    x = np.exp(2j * np.pi * 50e3 * t).astype(np.complex64)
    h = decimation_filter(factor)
    y = np.asarray(fir_decimate(jnp.asarray(x), jnp.asarray(h), factor))
    spec = np.abs(np.fft.fft(y[200:200 + 8192]))
    f_axis = np.fft.fftfreq(8192, d=factor / fs_in)
    assert abs(f_axis[np.argmax(spec)] - 50e3) < 300


def test_streaming_decimating_source_matches_batch(rng):
    fs_in, fs_out = 8.184e6, 2.046e6
    n_ms = 12
    x = (rng.standard_normal(n_ms * 8184) + 1j * rng.standard_normal(n_ms * 8184)).astype(np.complex64)
    src = DecimatingSampleSource(ArraySampleSource(x, fs_in), fs_out)
    assert (src.up, src.down) == (1, 4)
    blocks = [src.read_block(3)[1].ravel() for _ in range(3)]
    streamed = np.concatenate(blocks)

    # Batch oracle over the whole signal at once (global conv, then aligned
    # slicing identical to the source's bookkeeping).
    h = src.taps
    pad = np.zeros(src._hist, dtype=np.complex64)
    y = _upfirdn_oracle(np.concatenate([pad, x]), h, 1, 4)
    want = y[src._m_offset : src._m_offset + len(streamed)]
    np.testing.assert_allclose(streamed, want, rtol=1e-4, atol=1e-5)


def test_acquisition_after_integer_decimation():
    from gypsum_tpu.acquire.engine import AcquisitionEngine
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

    fs_in, fs_out = 8.184e6, 2.046e6
    truth = SyntheticSatellite(prn=13, doppler_hz=2100.0, delay_samples=1600.0, amplitude=0.25)
    # delay is in *input* samples here; at the output rate it becomes /4.
    iq = synthesize_iq([truth], 11 * 8184, fs_in, noise_sigma=0.3, seed=6)
    src = DecimatingSampleSource(ArraySampleSource(iq, fs_in), fs_out)
    _, block = src.read_block(10)
    eng = AcquisitionEngine(fs_out, 2046)
    # The anti-alias filter colors the noise (it occupies only ~80% of the
    # output band), which inflates the peak/mean-of-rest ratio for every PRN;
    # the planted satellite must still dominate by a wide margin.
    results = eng.acquire_all(block)
    assert results[0].prn == 13
    assert results[0].strength > 2.0 * results[1].strength
    assert abs(results[0].doppler_hz - 2100.0) < 10.0
    hits = results[:1]
    # Group delay of the anti-alias filter shifts the code phase by
    # (T-1)/2 input samples.
    expected_cp = (1600.0 - (len(src.taps) - 1) / 2) / 4 % 2046
    cp_err = abs(hits[0].code_phase_samples - expected_cp)
    assert min(cp_err, 2046 - cp_err) <= 1.5


def test_acquisition_after_rational_resample():
    from gypsum_tpu.acquire.engine import AcquisitionEngine
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

    fs_in, fs_out = 10e6, 2.046e6
    truth = SyntheticSatellite(prn=21, doppler_hz=-1500.0, delay_samples=5000.0, amplitude=0.25)
    iq = synthesize_iq([truth], 11 * 10000, fs_in, noise_sigma=0.25, seed=7)
    src = DecimatingSampleSource(ArraySampleSource(iq, fs_in), fs_out)
    assert (src.up, src.down) == (1023, 5000)
    _, block = src.read_block(10)
    assert block.shape == (10, 2046)
    eng = AcquisitionEngine(fs_out, 2046)
    results = eng.acquire_all(block)
    assert results[0].prn == 21
    assert results[0].strength > 2.0 * results[1].strength
    assert abs(results[0].doppler_hz - (-1500.0)) < 10.0

"""Correlation kernel tests against straight-line numpy oracles
(SURVEY.md §4 "kernel" tests: device kernels vs np.fft-based oracle
re-implementing reference gypsum/utils.py:59-108)."""

import jax.numpy as jnp
import numpy as np

from gypsum_tpu.ops.correlate import (
    circular_correlate,
    doppler_wipeoff,
    lag_window_correlate,
    noncoherent_acquisition_sweep,
    peak_strength,
    replica_fft_conj_table,
)
from gypsum_tpu.signal.prn import replica_table, sampled_replica

L = 2046
FS = 2.046e6


def _oracle_correlate(samples: np.ndarray, replica: np.ndarray) -> np.ndarray:
    """The reference's frequency_domain_correlation (gypsum/utils.py:59-73)."""
    return np.fft.ifft(np.fft.fft(samples) * np.conj(np.fft.fft(replica)))


def _oracle_noncoherent(samples, dopplers, replicas, fs):
    """The reference's integrate_correlation_with_doppler_shifted_prn, looped
    (gypsum/utils.py:77-108), evaluated for every (sat, doppler)."""
    m, length = samples.shape
    out = np.zeros((len(replicas), len(dopplers), length))
    for si, rep in enumerate(replicas):
        for di, f in enumerate(dopplers):
            acc = np.zeros(length)
            for i in range(m):
                t = (np.arange(length) + i * length) / fs
                shifted = samples[i] * np.exp(-2j * np.pi * f * t)
                acc += np.abs(_oracle_correlate(shifted, rep))
            out[si, di] = acc
    return out


def test_circular_correlate_matches_oracle(rng):
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(np.complex64)
    rep = sampled_replica(5, L)
    got = np.asarray(circular_correlate(jnp.asarray(x), jnp.conj(jnp.fft.fft(jnp.asarray(rep)))))
    want = _oracle_correlate(x, rep)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_correlation_peak_locates_shift(rng):
    rep = sampled_replica(9, L).real
    delay = 777
    x = np.roll(rep, delay) + 0.1 * rng.standard_normal(L)
    pfc = jnp.conj(jnp.fft.fft(jnp.asarray(rep.astype(np.complex64))))
    corr = np.abs(np.asarray(circular_correlate(jnp.asarray(x, dtype=jnp.complex64), pfc)))
    assert int(np.argmax(corr)) == delay


def test_doppler_wipeoff_matches_absolute_time_oracle(rng):
    m = 4
    x = (rng.standard_normal((m, L)) + 1j * rng.standard_normal((m, L))).astype(np.complex64)
    dops = np.array([-3000.0, 0.0, 1250.0], dtype=np.float32)
    got = np.asarray(doppler_wipeoff(jnp.asarray(x), jnp.asarray(dops), FS))
    for di, f in enumerate(dops):
        for i in range(m):
            t = (np.arange(L) + i * L) / FS
            want = x[i] * np.exp(-2j * np.pi * f * t)
            np.testing.assert_allclose(got[di, i], want, atol=5e-3)


def test_noncoherent_sweep_matches_oracle(rng):
    m = 3
    sats = [1, 7]
    reps = replica_table(L)[np.array(sats) - 1]
    x = (0.3 * np.roll(reps[0], 100) * np.exp(2j * np.pi * 500 * np.arange(m * L) / FS).reshape(m, L)
         + 0.5 * (rng.standard_normal((m, L)) + 1j * rng.standard_normal((m, L)))).astype(np.complex64)
    dops = np.array([0.0, 500.0], dtype=np.float32)
    pfc = jnp.asarray(replica_fft_conj_table(reps))
    got = np.asarray(noncoherent_acquisition_sweep(jnp.asarray(x), jnp.asarray(dops), pfc, FS))
    want = _oracle_noncoherent(x, dops, reps, FS)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=0.5)
    # And the signal is found where it was planted.
    si, di, cp = np.unravel_index(np.argmax(got), got.shape)
    assert (si, di, cp) == (0, 1, 100)


def test_peak_strength_matches_reference_definition(rng):
    profile = np.abs(rng.standard_normal(L)).astype(np.float32)
    profile[123] = 50.0
    got = float(peak_strength(jnp.asarray(profile)))
    peak = profile.max()
    want = peak / profile[profile != peak].mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lag_window_matches_full_correlation(rng):
    rep = sampled_replica(12, L).real.astype(np.float32)
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(np.complex64)
    tiled = jnp.asarray(np.concatenate([rep, rep]))
    full = _oracle_correlate(x, rep)
    for cp in (0, 1, 1000, 2045):
        got = np.asarray(lag_window_correlate(jnp.asarray(x), tiled, jnp.int32(cp), 3))
        lags = (cp + np.arange(-3, 4)) % L
        np.testing.assert_allclose(got, full[lags], rtol=2e-3, atol=2e-2)


def test_device_circulant_table_matches_host_builder():
    """build_circulant_table_device (the upload-free path the acquisition
    engine uses) must equal the host-numpy construction exactly (+/-1 chips
    are bf16-exact)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gypsum_tpu.ops.correlate import (
        build_circulant_table_device,
        circulant_replica_table,
    )
    from gypsum_tpu.signal.prn import replica_table

    reps = replica_table(2046)[:3]
    host = np.asarray(circulant_replica_table(reps)).astype(np.float32)
    dev = np.asarray(
        jax.jit(build_circulant_table_device)(jnp.asarray(reps))
    ).astype(np.float32)
    np.testing.assert_array_equal(dev, host)

"""Pallas kernel parity tests (interpret mode on CPU; the same kernel code
compiles on TPU — SURVEY.md §4: kernel vs oracle, bit-for-bit on float32
within tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gypsum_tpu.core.planes import np_to_complex, to_planes
from gypsum_tpu.ops.correlate import rolled_lag_window
from gypsum_tpu.ops.decimate import decimation_filter, design_lowpass, fir_decimate_planes
from gypsum_tpu.ops.pallas_kernels import (
    fir_decimate_pallas,
    peak_reduce_pallas,
    wipeoff_lag_correlate_pallas,
)

FS = 2.046e6
L = 2046


# ------------------------------------------------------------- decimator


@pytest.mark.parametrize("factor,n", [(4, 40_000), (8, 65_536), (5, 12_345)])
def test_fir_decimate_pallas_matches_xla(rng, factor, n):
    taps = decimation_filter(factor)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    want = np.asarray(fir_decimate_planes(jnp.asarray(to_planes(x)), jnp.asarray(taps), factor))
    got = np.asarray(fir_decimate_pallas(x, taps, factor))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fir_decimate_pallas_numpy_oracle(rng):
    """Direct numpy convolution oracle, complex output round-trip."""
    factor, n = 8, 30_000
    taps = design_lowpass(97, cutoff=0.1)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    full = np.convolve(x, taps, mode="valid")
    want = full[::factor]
    got = np_to_complex(np.asarray(fir_decimate_pallas(x, taps, factor)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fir_decimate_pallas_accepts_planes(rng):
    factor, n = 4, 10_000
    taps = decimation_filter(factor)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    a = np.asarray(fir_decimate_pallas(x, taps, factor))
    b = np.asarray(fir_decimate_pallas(to_planes(x), taps, factor))
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------- peak reduce


def test_peak_reduce_matches_numpy(rng):
    grid = rng.standard_normal((32, 29, L)).astype(np.float32)
    mx, arg, total = jax.device_get(peak_reduce_pallas(jnp.asarray(grid)))
    flat = grid.reshape(32, -1)
    np.testing.assert_allclose(mx, flat.max(axis=1), rtol=1e-6)
    np.testing.assert_array_equal(arg, flat.argmax(axis=1))
    np.testing.assert_allclose(total, flat.sum(axis=1), rtol=1e-4)


def test_peak_reduce_ties_pick_lowest_index():
    grid = np.zeros((8, 3, 100), dtype=np.float32)
    grid[:, 1, 7] = 5.0
    grid[:, 2, 90] = 5.0  # same value, later flat index
    _, arg, _ = jax.device_get(peak_reduce_pallas(jnp.asarray(grid)))
    np.testing.assert_array_equal(arg, np.full(8, 1 * 100 + 7))


def test_peak_reduce_odd_sizes(rng):
    # Non-multiple-of-tile trailing size and non-multiple-of-8 rows.
    grid = rng.standard_normal((5, 3, 1234)).astype(np.float32)
    mx, arg, total = jax.device_get(peak_reduce_pallas(jnp.asarray(grid)))
    flat = grid.reshape(5, -1)
    np.testing.assert_allclose(mx, flat.max(axis=1), rtol=1e-6)
    np.testing.assert_array_equal(arg, flat.argmax(axis=1))
    np.testing.assert_allclose(total, flat.sum(axis=1), rtol=1e-4)


# ------------------------------------------- fused wipeoff + lag window


def test_wipeoff_lag_correlate_matches_xla_path(rng):
    """Oracle = the exact math of track/loop.py's scan step: wipeoff with the
    per-channel NCO phase, then the (2K+1)-lag window correlation."""
    from gypsum_tpu.signal.prn import replica_table

    k_half = 4
    n_lags = 2 * k_half + 1
    s_count = 8
    reps = replica_table(L)
    wide = np.concatenate([reps, reps, reps[:, : 2 * k_half]], axis=1).astype(np.float32)
    replicas = wide[:s_count]

    chunk = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(np.complex64)
    theta = rng.uniform(0, 2 * np.pi, s_count).astype(np.float32)
    doppler = rng.uniform(-5000, 5000, s_count).astype(np.float32)
    cp_int = rng.integers(0, L, s_count).astype(np.int32)
    base = np.mod(L - cp_int - k_half, L).astype(np.float32)

    # Oracle (numpy, float64 trig then cast):
    l_over_fs = np.arange(L) / FS
    want = np.zeros((s_count, 2, n_lags), dtype=np.float64)
    for s in range(s_count):
        phase = theta[s] + 2 * np.pi * doppler[s] * l_over_fs
        x = chunk * np.exp(-1j * phase)
        window = np.asarray(
            rolled_lag_window(jnp.asarray(np.concatenate([replicas[s][:L], replicas[s][:L]])),
                              jnp.asarray(cp_int[s]), k_half, L)
        )
        corr = window @ x
        want[s, 0] = corr.real
        want[s, 1] = corr.imag

    params = np.stack([theta, doppler, base], axis=-1).astype(np.float32)
    got = np.asarray(
        wipeoff_lag_correlate_pallas(
            jnp.asarray(np.stack([chunk.real, chunk.imag])),
            jnp.asarray(replicas),
            jnp.asarray(params),
            length=L,
            n_lags=n_lags,
            inv_fs=1.0 / FS,
        )
    )
    # f32 trig of phases up to ~6e4 rad loses some precision vs the f64
    # oracle; the tracking loop only consumes discriminator ratios, so a
    # relative tolerance around 1e-2 of the correlation scale is plenty.
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-2 * scale)


def test_wipeoff_lag_zero_doppler_exact(rng):
    """With zero Doppler and zero phase the kernel must equal the plain
    lag-window correlation to float32 accuracy."""
    from gypsum_tpu.signal.prn import replica_table

    k_half = 2
    n_lags = 5
    reps = replica_table(L)
    wide = np.concatenate([reps, reps, reps[:, : 2 * k_half]], axis=1).astype(np.float32)
    replicas = wide[:4]
    chunk = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(np.complex64)
    cp_int = np.array([0, 1, 1000, 2045], dtype=np.int32)
    base = np.mod(L - cp_int - k_half, L).astype(np.float32)
    params = np.stack([np.zeros(4, np.float32), np.zeros(4, np.float32), base], axis=-1)

    got = np.asarray(
        wipeoff_lag_correlate_pallas(
            jnp.asarray(np.stack([chunk.real, chunk.imag])),
            jnp.asarray(replicas),
            jnp.asarray(params),
            length=L,
            n_lags=n_lags,
            inv_fs=1.0 / FS,
        )
    )
    for s in range(4):
        window = np.asarray(
            rolled_lag_window(jnp.asarray(np.concatenate([replicas[s][:L], replicas[s][:L]])),
                              jnp.asarray(cp_int[s]), k_half, L)
        )
        corr = window @ chunk
        np.testing.assert_allclose(got[s, 0], corr.real, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(got[s, 1], corr.imag, rtol=1e-4, atol=1e-3)

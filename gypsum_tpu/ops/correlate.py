"""Circular-correlation kernels for acquisition and tracking.

These are the compute core of the receiver (the analogue of reference:
gypsum/utils.py:59-108), re-designed for XLA/TPU:

- Everything is *batched*: one traced program evaluates the whole
  [satellite x Doppler x millisecond] grid instead of the reference's
  per-PRN/per-bin Python loops (~2,000 sequential numpy FFT pairs per PRN,
  reference: gypsum/acquisition.py:77-108).
- Sample FFTs are computed once per (Doppler, ms) and reused across all 32
  satellites; replica FFTs are precomputed constants (the reference recomputes
  the replica FFT on every call, reference: gypsum/utils.py:66).
- The tracking path avoids FFTs entirely: it evaluates the correlation only in
  a small lag window around the prompt as a batched matmul
  (`lag_window_correlate`), replacing the reference's full 2046-point FFT
  correlation per millisecond per satellite (reference: gypsum/tracker.py:307).
- Phase/time numerics are f32-safe: wipeoff phasors are built from
  per-millisecond phase offsets reduced mod 2*pi rather than absolute stream
  time (float32 cannot represent 2*pi*f*t for minutes of stream at kHz
  Dopplers; the reference leans on numpy float64,
  reference: gypsum/utils.py:93-96).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def ifft_via_fft(x: jax.Array) -> jax.Array:
    """Inverse FFT along the last axis via the conjugation identity
    ifft(x) = conj(fft(conj(x))) / N.

    The TPU backend in this environment implements only the *forward*
    transform (jnp.fft.ifft lowers to an UNIMPLEMENTED op); the identity costs
    the same one forward FFT plus two elementwise conjugations, which XLA
    fuses, so it is the default everywhere.
    """
    n = x.shape[-1]
    return jnp.conj(jnp.fft.fft(jnp.conj(x))) / n


def circular_correlate(samples: jax.Array, replica_fft_conj: jax.Array) -> jax.Array:
    """Circular cross-correlation via the frequency domain.

    corr[s] = sum_l samples[l] * replica[(l - s) mod L]: the peak index gives
    the code phase (in samples) that aligns the replica with the signal.
    Batched over any leading dims of either argument (normal broadcasting).

    ``replica_fft_conj`` must be conj(fft(replica)) — precompute it once.
    """
    return ifft_via_fft(jnp.fft.fft(samples) * replica_fft_conj)


def replica_fft_conj_table(replica_table: np.ndarray) -> np.ndarray:
    """conj(FFT) of each replica row: the constant multiplied into sample FFTs."""
    return np.conj(np.fft.fft(replica_table, axis=-1)).astype(np.complex64)


@functools.partial(jax.jit, static_argnames=("sample_rate",))
def doppler_wipeoff(
    samples_ms: jax.Array,  # [M, L] complex64 — M milliseconds of IQ
    dopplers: jax.Array,  # [D] float32 Hz
    sample_rate: float | jax.Array,
) -> jax.Array:
    """Multiply each 1 ms chunk by e^{-j 2 pi f (t_ms + l/fs)} for every Doppler.

    Returns [D, M, L]. The phase is continuous across the M chunks (the
    reference offsets each chunk's time base the same way,
    reference: gypsum/utils.py:93-97) but is accumulated per-ms mod 2*pi so
    float32 never sees large absolute phases.
    """
    m_count, length = samples_ms.shape
    # Phase advance within one chunk: 2 pi f l / fs  (max ~ 2 pi * 7e3 * 1e-3
    # ~ 44 rad: comfortably exact in f32).
    l_idx = jnp.arange(length, dtype=jnp.float32)
    intra = dopplers[:, None, None] * (l_idx / sample_rate)[None, None, :]  # [D,1,L]
    # Phase at each chunk start: 2 pi f * (m / 1000), reduced mod 1 cycle.
    ms_per_chunk = length / sample_rate
    chunk_cycles = dopplers[:, None, None] * (jnp.arange(m_count, dtype=jnp.float32) * ms_per_chunk)[None, :, None]
    chunk_cycles = chunk_cycles - jnp.round(chunk_cycles)
    phase = -2.0 * jnp.pi * (intra + chunk_cycles)
    return samples_ms[None, :, :] * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def noncoherent_acquisition_sweep(
    samples_ms: jax.Array,  # [M, L] complex64
    dopplers: jax.Array,  # [D] float32
    prn_fft_conj: jax.Array,  # [S, L] complex64
    sample_rate: float,
) -> jax.Array:
    """Non-coherently integrated correlation power over the full grid.

    Returns [S, D, L] float32: for each satellite and Doppler bin, the sum over
    the M millisecond chunks of |circular correlation| at every code phase.

    One device program replaces the reference's nested Python loops
    (sats x Doppler rounds x ms chunks of tiny numpy FFTs,
    reference: gypsum/acquisition.py:59-64,163-177 + gypsum/utils.py:77-108).
    The sample FFT for each (Doppler, ms) is shared across satellites; the scan
    over milliseconds keeps peak live memory at [S, D, L] + [D, L] instead of
    materializing [S, D, M, L].
    """
    shifted = doppler_wipeoff(samples_ms, dopplers, sample_rate)  # [D, M, L]
    sample_ffts = jnp.fft.fft(shifted, axis=-1)  # [D, M, L]
    sample_ffts = jnp.moveaxis(sample_ffts, 1, 0)  # [M, D, L] — scan over ms

    s_count = prn_fft_conj.shape[0]
    d_count = dopplers.shape[0]
    length = samples_ms.shape[-1]

    def accumulate(acc, x_dl):
        corr = ifft_via_fft(x_dl[None, :, :] * prn_fft_conj[:, None, :])  # [S, D, L]
        return acc + jnp.abs(corr), None

    # Derive the zero init from the PRN table so it inherits any device-
    # varying axes when this runs inside shard_map (a plain jnp.zeros would
    # be "unvarying" and rejected as the scan carry).
    init = jnp.zeros((s_count, d_count, length), dtype=jnp.float32) + (
        0.0 * jnp.real(prn_fft_conj[:, None, :1])
    )
    total, _ = jax.lax.scan(accumulate, init, sample_ffts)
    return total


def peak_strength(profile: jax.Array) -> jax.Array:
    """Normalized peak strength of a correlation profile: peak / mean-of-rest
    (reference: gypsum/utils.py:111-116). Batched over leading dims."""
    peak = jnp.max(profile, axis=-1)
    n = profile.shape[-1]
    mean_rest = (jnp.sum(profile, axis=-1) - peak) / (n - 1)
    return peak / mean_rest


def rolled_lag_window(
    replica_tiled: jax.Array,  # [2L] — the replica concatenated with itself
    code_phase: jax.Array,  # scalar int32: prompt roll, in samples
    half_width: int,
    length: int,
) -> jax.Array:
    """The [2K+1, L] matrix whose row k is the replica circularly rolled by
    (code_phase + k - K) samples — i.e. lags prompt-K .. prompt+K.

    roll(r, s)[l] = r[(l - s) mod L] = tiled[((L - s) mod L) + l], so each row
    is a dynamic slice of the tiled replica: no gathers, no FFT.
    """
    k = jnp.arange(-half_width, half_width + 1, dtype=jnp.int32)
    starts = jnp.mod(length - code_phase - k, length)  # [2K+1]
    return jax.vmap(lambda s: jax.lax.dynamic_slice(replica_tiled, (s,), (length,)))(starts)


def lag_window_correlate(
    samples: jax.Array,  # [L] complex64 — one ms, carrier already wiped off
    replica_tiled: jax.Array,  # [2L] float32
    code_phase: jax.Array,  # scalar int32
    half_width: int,
) -> jax.Array:
    """Correlations at the 2K+1 integer lags around the prompt code phase.

    Returns [2K+1] complex64 where index K is the prompt, K-1 early, K+1 late.
    Equivalent to sampling the full circular correlation at those lags
    (reference computes the full profile by FFT and its early/late by explicit
    rolls + np.correlate, reference: gypsum/tracker.py:286-313).
    """
    length = samples.shape[-1]
    window = rolled_lag_window(replica_tiled, code_phase, half_width, length)  # [2K+1, L]
    return window @ samples


def circulant_replica_table(replica_table_f32: np.ndarray) -> np.ndarray:
    """[S, L, L] circulant matrices C_s[l, tau] = r_s[(l - tau) mod L] in
    bfloat16 (+/-1 chips are bf16-exact). Multiplying a signal row by C_s
    evaluates its full circular cross-correlation with replica s as ONE MXU
    matmul — the TPU-first alternative to FFT correlation (measured 2.2x
    faster than the XLA FFT path for the full acquisition sweep on v5e; FFTs
    lower to scalar-heavy butterflies while the MXU runs ~200 bf16 TFLOPS).
    ~256 MB for 32 satellites at L=2046 — built once per engine.
    """
    import ml_dtypes

    length = replica_table_f32.shape[-1]
    idx = (np.arange(length)[:, None] - np.arange(length)[None, :]) % length
    # Cast the 256 KB replica table to bf16 BEFORE the fancy index so the
    # host-side peak allocation is the 256 MB result, not a 512 MB f32
    # intermediate (+/-1 chips are bf16-exact).
    return replica_table_f32.astype(ml_dtypes.bfloat16)[:, idx]


def build_circulant_table_device(replica_table: jax.Array) -> jax.Array:
    """Device-side construction of the [S, L, L] bf16 circulant tables from
    the [S, L] replica rows (one gather). Host->device bandwidth is the
    scarce resource in this environment (~45 MB/s tunnel): uploading the
    256 KB replica table and expanding on device replaces a ~3 s 256 MB
    table upload — the entirety of the measured acquisition cold-start
    after compile caching."""
    length = replica_table.shape[-1]
    l = jax.lax.broadcasted_iota(jnp.int32, (length, length), 0)
    tau = jax.lax.broadcasted_iota(jnp.int32, (length, length), 1)
    idx = jnp.mod(l - tau, length)
    return jnp.take(replica_table.astype(jnp.bfloat16), idx, axis=1)


def noncoherent_acquisition_sweep_matmul(
    samples_ms: jax.Array,  # [M, L] complex64
    dopplers: jax.Array,  # [D] float32
    circulant: jax.Array,  # [S, L, L] bfloat16 (circulant_replica_table)
    sample_rate: float,
) -> jax.Array:
    """Same contract as :func:`noncoherent_acquisition_sweep` (returns
    [S, D, L] summed |correlation|), evaluated as batched MXU matmuls against
    the circulant replica tables instead of FFT -> pointwise -> IFFT.

    The Doppler-wiped signal rows [D*M, L] hit each satellite's [L, L]
    circulant as two real bf16 matmuls with f32 accumulation; bf16 inputs
    cost <0.1% relative error on the correlation (noise-like sums), far
    below the detection threshold's margin.
    """
    m_count, length = samples_ms.shape
    shifted = doppler_wipeoff(samples_ms, dopplers, sample_rate)  # [D, M, L]
    zr = jnp.real(shifted).reshape(-1, length).astype(jnp.bfloat16)  # [D*M, L]
    zi = jnp.imag(shifted).reshape(-1, length).astype(jnp.bfloat16)
    d_count = dopplers.shape[0]

    def per_sat(c):
        cr = jnp.dot(zr, c, preferred_element_type=jnp.float32)
        ci = jnp.dot(zi, c, preferred_element_type=jnp.float32)
        mag = jnp.sqrt(cr * cr + ci * ci)
        return mag.reshape(d_count, m_count, length).sum(axis=1)  # [D, L]

    # lax.map serializes satellites: peak live memory stays [D*M, L] + one
    # [S] slice of the 256 MB circulant instead of a [S, D*M, L] blowup.
    return jax.lax.map(per_sat, circulant)  # [S, D, L]

"""Narrowband interference detection and excision (STFT notch).

Beyond the reference (which has no interference handling of any kind): GPS
L1 C/A rides ~20 dB below the thermal noise floor, so ANY spectral line
visible above the noise is hostile — a CW/narrowband jammer, a harmonic, a
DC offset. Detection is therefore simple and robust: average the power
spectrum over the frames of a block and flag bins that exceed a multiple of
the median bin (the GPS signals themselves are spectrally flat at this
scale and cannot trigger it).

Excision is a spectral mask applied frame-by-frame: cos^4 (Hann-squared)
windowed frames at 75 % overlap — the periodic Hann^2 window sums to exactly
3/2 at quarter-frame hop (its cos and cos2 terms cancel over the four
phases), so unmasked content reconstructs identically under overlap-add —
FFT, zero the flagged bins (dilated by a guard band), inverse FFT,
overlap-add, divide by 3/2. The window choice is the load-bearing detail:
a plain Hann's -31 dB sidelobes leak a strong tone across the whole band
(measured: a 24 dB J/S tone left a -40 dB residual everywhere), while
Hann^2's -47 dB first sidelobe and k^-10 rolloff keep all significant
leakage inside the adaptively-masked bins. Notching b of N bins costs the
signal only ~b/N of its power (fraction reported); a 30 dB J/N tone costs
< 0.3 % of the bins at nfft=4096.

Two implementations with identical math, parity-tested:
- ``stft_notch_np``: numpy, used by ``io.sources.NotchingSampleSource`` on
  the host path (a TPU-platform process must NOT bounce blocks through the
  device for this — upload is the scarce resource, core/planes.py).
- ``make_stft_notch_jax``: jittable on float32 I/Q planes for in-graph use
  (fits the device-boundary rules: no complex transfers).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "NotchReport",
    "stft_notch_np",
    "make_stft_notch_jax",
]


@dataclass(frozen=True)
class NotchReport:
    detected: bool
    n_bins: int  # masked bins (after guard dilation)
    fraction: float  # n_bins / nfft — the broadband SNR cost of excision
    peak_over_median_db: float  # detection statistic
    freqs_hz: tuple[float, ...] = field(default_factory=tuple)  # masked centers


#: Overlap-add constant of the cos^4 window at hop = nfft/4.
_COLA_SUM = 1.5


def _window(nfft: int) -> np.ndarray:
    # Periodic Hann^2 (cos^4): at hop = nfft/4 the four phase shifts cancel
    # both its cosine terms, so it overlap-adds to exactly 3/2.
    h = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(nfft) / nfft))
    return h * h


def _frame_starts(n_padded: int, nfft: int, hop: int) -> np.ndarray:
    return np.arange(0, n_padded - nfft + 1, hop)


def detect_mask(
    power_mean: np.ndarray, threshold: float, guard_bins: int
) -> tuple[np.ndarray, float]:
    """Flag bins whose frame-averaged power exceeds ``threshold`` x the
    median bin, dilated by ``guard_bins`` on each side (windowing leakage
    shoulders of a strong line). Returns (bool mask [nfft], peak/median)."""
    med = float(np.median(power_mean))
    ratio = power_mean / max(med, 1e-30)
    mask = ratio > threshold
    if guard_bins > 0 and mask.any():
        k = np.ones(2 * guard_bins + 1)
        mask = np.convolve(mask.astype(np.float64), k, mode="same") > 0.5
    return mask, float(ratio.max())


def stft_notch_np(
    iq: np.ndarray,
    sample_rate: float,
    nfft: int = 4096,
    threshold: float = 8.0,
    guard_bins: int = 3,
    max_fraction: float = 0.05,
) -> tuple[np.ndarray, NotchReport]:
    """Detect + excise narrowband interference from one block of IQ.

    Returns ``(clean_iq, report)``; the input comes back untouched when
    nothing is detected, or when the mask would cover more than
    ``max_fraction`` of the band (a "notch" that wide is wideband
    interference — excision would cost more signal than it saves, so it is
    reported but not applied)."""
    x = np.asarray(iq)
    n = len(x)
    hop = nfft // 4
    w = _window(nfft).astype(np.float32)

    pad = nfft
    xp = np.concatenate([np.zeros(pad, x.dtype), x, np.zeros(pad + nfft, x.dtype)])
    starts = _frame_starts(len(xp), nfft, hop)
    frames = xp[starts[:, None] + np.arange(nfft)[None, :]] * w[None, :]
    spec = np.fft.fft(frames, axis=1)
    # Detection averages only frames fully inside the block: frames that
    # straddle the zero-padded edges see the interferer truncated (broadband
    # splatter) and would smear the mask several bins wider than the true
    # line. (The edge frames are still cleaned through the same mask; the
    # residual edge transient is ~1 frame per block end.)
    interior = (starts >= pad) & (starts + nfft <= pad + n)
    power = np.mean(np.abs(spec[interior]) ** 2, axis=0)

    mask, peak = detect_mask(power, threshold, guard_bins)
    n_bins = int(mask.sum())
    freqs = np.fft.fftfreq(nfft, 1.0 / sample_rate)
    report = NotchReport(
        detected=bool(n_bins),
        n_bins=n_bins,
        fraction=n_bins / nfft,
        peak_over_median_db=10.0 * np.log10(max(peak, 1e-30)),
        freqs_hz=tuple(float(f) for f in freqs[mask][:16]),
    )
    if not report.detected or report.fraction > max_fraction:
        return x, report

    spec[:, mask] = 0.0
    clean_frames = np.fft.ifft(spec, axis=1)
    y = np.zeros(len(xp), dtype=np.complex128)
    np.add.at(y, starts[:, None] + np.arange(nfft)[None, :], clean_frames)
    return (y[pad : pad + n] / _COLA_SUM).astype(x.dtype), report


def make_stft_notch_jax(
    n_samples: int,
    sample_rate: float,
    nfft: int = 4096,
    threshold: float = 8.0,
    guard_bins: int = 3,
    max_fraction: float = 0.05,
):
    """Jittable equivalent of ``stft_notch_np`` on float32 I/Q planes.

    Returns ``fn(planes [2, n_samples]) -> (planes_clean, stats [3])`` with
    stats = (n_masked_bins, peak_over_median_ratio, applied 0/1). The mask
    logic is data-dependent but shape-static (boolean mask over nfft bins;
    the apply/skip decision is a jnp.where), so one compiled program covers
    every block."""
    import jax.numpy as jnp

    from gypsum_tpu.ops.correlate import ifft_via_fft

    hop = nfft // 4
    pad = nfft
    n_padded = n_samples + 2 * pad + nfft
    starts = np.asarray(_frame_starts(n_padded, nfft, hop))
    idx = starts[:, None] + np.arange(nfft)[None, :]  # [F, nfft]
    w = _window(nfft).astype(np.float32)
    guard_k = np.ones(2 * guard_bins + 1, np.float32)

    interior = (starts >= pad) & (starts + nfft <= pad + n_samples)

    def fn(planes):
        x = planes[0] + 1j * planes[1]
        xp = jnp.concatenate([
            jnp.zeros(pad, x.dtype), x, jnp.zeros(pad + nfft, x.dtype)
        ])
        frames = xp[idx] * w[None, :]
        spec = jnp.fft.fft(frames, axis=1)
        power = jnp.mean(jnp.abs(spec[interior]) ** 2, axis=0)
        med = jnp.median(power)
        ratio = power / jnp.maximum(med, 1e-30)
        mask = (ratio > threshold).astype(jnp.float32)
        if guard_bins > 0:
            mask = (jnp.convolve(mask, guard_k, mode="same") > 0.5).astype(
                jnp.float32
            )
        n_bins = jnp.sum(mask)
        apply = jnp.logical_and(n_bins > 0, n_bins <= max_fraction * nfft)

        spec = spec * (1.0 - mask)[None, :]
        clean = ifft_via_fft(spec)
        y = jnp.zeros(n_padded, x.dtype).at[idx].add(clean)
        y = y[pad : pad + n_samples] / _COLA_SUM
        out = jnp.where(apply, y, x)
        stats = jnp.stack([
            n_bins, jnp.max(ratio), apply.astype(jnp.float32)
        ])
        return jnp.stack([out.real, out.imag]).astype(jnp.float32), stats

    return fn

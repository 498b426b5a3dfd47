"""Deep-integration ranging on coasting channels: measure, don't just predict.

The vector-coast tier (runtime/receiver.py:_enter_coast) drives a blocked
channel's NCOs open-loop from predicted geometry — good enough to resume
instantly when the signal returns, but blind while it is gone: the
prediction drifts with receiver oscillator error (~0.04 samples/s at a
2e-8 TCXO) and the satellite is excluded from fixes the whole time
(its "observables" are circular). The reference has no counterpart at all —
below the 1 kHz loops' threshold it can only drop and reacquire
(reference: gypsum/receiver.py:248-267).

This module closes the loop the way a deep-integration (ultra-tightly
coupled) receiver does: each block, the raw IQ of the block is
re-correlated against the channel's replica in a NARROW window around the
prediction — tens of coherent 10 ms groups accumulated non-coherently, the
same integration structure as acquire/deep.py but over (2K+1) lags x a few
Doppler bins instead of the full search grid. At signal levels far below
the tracking loops' lock threshold (the 10 ms coherent x sqrt(G)
non-coherent gain reaches ~7-10 dB below the standard acquisition floor)
this still yields a sub-sample code-phase and sub-Hz Doppler MEASUREMENT:

- the coast prediction is re-anchored on it (open-loop drift is bounded by
  the measurement cadence instead of growing with outage length), and
- the satellite keeps feeding genuine pseudoranges to the fix
  (solve/world.py:_fix_ready_satellites admits deep-measured coasting SVs
  when fewer than four healthy channels remain), so the receiver keeps
  producing positions through a deep fade that blinds every scalar loop.

Device shape (one jitted program per block geometry): the per-group
coherent sums cost one Doppler wipeoff + reduce ([C, G, L]), and all
(group, Doppler, lag) correlations evaluate as ONE einsum against the
[G, K, L] window matrix — MXU-shaped, no FFTs, no data-dependent shapes.
Code-Doppler drift over the block is compensated by the per-group integer
rolls (computed on host from the prediction, like acquire/deep.py's
realignment), and the sub-sample rounding residuals of those rolls are
removed from the final vertex estimate (``mean_frac``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.core.planes import to_complex, to_planes
from gypsum_tpu.ops.correlate import doppler_wipeoff, rolled_lag_window
from gypsum_tpu.signal.prn import replica_table


#: Worst-case C/A cross-correlation magnitude relative to the autocorrelation
#: peak (Gold-code bound 65/1023 ~ -23.9 dB at aligned relative Doppler).
CA_XCORR_PEAK = 65.0 / 1023.0


@dataclass
class DeepCoastMeasurement:
    """One block's deep-integration measurement of a coasting channel."""

    detected: bool
    strength: float  # normalized peak (vs the far-lag noise floor)
    cp_error_samples: float  # measured - predicted code phase (samples)
    doppler_hz: float  # measured carrier Doppler (static offset excluded)
    groups: int  # non-coherent groups integrated
    peak_abs: float = 0.0  # non-coherent peak, absolute units (sum of G |coh|)
    floor_abs: float = 0.0  # far-lag noise floor in the same units


def xcorr_suspect(
    measured_abs_hz: float,
    peak_abs: float,
    n_groups: int,
    coherent_ms: int,
    live_channels: list[tuple[float, float]],  # [(abs Doppler Hz, per-ms prompt mag)]
    tol_hz: float,
    margin: float,
) -> bool:
    """True when a detection is explainable as C/A CROSS-correlation from a
    still-tracked strong channel rather than the coasting PRN's own signal.

    The C/A spectrum is a 1 kHz line comb (1 ms code period), so a strong
    live SV leaks into another PRN's correlator whenever the Doppler
    difference is near a multiple of 1 kHz — at up to ``CA_XCORR_PEAK`` of
    the live SV's own prompt level, which at deep-integration sensitivities
    is far above the noise gate. The veto fires when the measured absolute
    Doppler folds to within ``tol_hz`` of a live channel's AND the absolute
    peak is not more than ``margin`` x that channel's worst-case sidelobe
    (a genuinely strong faded signal exceeds the bound and passes).

    ``live_channels`` carries per-ms prompt magnitudes (~amplitude x L), the
    same units as one coherent millisecond of ``peak_abs``; a fully aligned
    sidelobe integrates to mag x coherent_ms x n_groups x CA_XCORR_PEAK.
    """
    for f_live, mag in live_channels:
        folded = (measured_abs_hz - f_live + 500.0) % 1000.0 - 500.0
        bound = float(mag) * coherent_ms * n_groups * CA_XCORR_PEAK
        if abs(folded) <= tol_hz and peak_abs <= margin * bound:
            return True
    return False


class DeepCoastMeasurer:
    """Narrow grouped coherent x non-coherent correlator around a coast
    prediction. One instance per receiver band; jitted programs are cached
    per block geometry (G groups actually present in the block)."""

    def __init__(
        self,
        sample_rate: float,
        samples_per_prn: int,
        prns: tuple[int, ...],
        config: TrackingConfig,
    ) -> None:
        self.config = config
        self.sample_rate = float(sample_rate)
        self.samples_per_prn = int(samples_per_prn)
        self.prns = tuple(prns)
        self._prn_row = {p: i for i, p in enumerate(self.prns)}
        reps = replica_table(self.samples_per_prn, self.prns)  # [N, L]
        self._replicas_tiled = np.concatenate([reps, reps], axis=1).astype(
            np.float32
        )  # [N, 2L]
        self._programs: dict[int, object] = {}
        c = int(config.coast_meas_doppler_bins)
        if c < 1 or c % 2 == 0:
            raise ValueError(f"coast_meas_doppler_bins must be odd >= 1, got {c}")

    # ------------------------------------------------------------- device

    def _program(self, n_groups: int):
        """[G*Nc, L, 2] planes x [2L] replica x [C] dopplers x [G] rolls
        -> [G, C, Ktot, 2] per-group complex correlations (signal lags
        0..2K, then noise lags at +L/2)."""
        fn = self._programs.get(n_groups)
        if fn is not None:
            return fn
        cfg = self.config
        nc = int(cfg.coast_meas_coherent_ms)
        k_half = int(cfg.coast_meas_lag_halfwidth)
        kn_half = max(1, int(cfg.coast_meas_noise_lags) // 2)
        length = self.samples_per_prn
        fs = self.sample_rate

        def program(planes, rep_tiled, dopplers, cp_rolls):
            x = to_complex(planes)  # [G*Nc, L]
            wiped = doppler_wipeoff(x, dopplers, fs)  # [C, G*Nc, L]
            coh = wiped.reshape(wiped.shape[0], n_groups, nc, length).sum(
                axis=2
            )  # [C, G, L] coherent within-group sums (one code period per ms,
            # so summing chunks before correlating is exact)

            def windows(cp):
                sig = rolled_lag_window(rep_tiled, cp, k_half, length)
                noise = rolled_lag_window(
                    rep_tiled, jnp.mod(cp + length // 2, length), kn_half, length
                )
                return jnp.concatenate([sig, noise], axis=0)  # [Ktot, L]

            win = jax.vmap(windows)(cp_rolls)  # [G, Ktot, L]
            y = jnp.einsum("cgl,gkl->gck", coh, win.astype(jnp.complex64))
            return to_planes(y)

        fn = jax.jit(program)
        self._programs[n_groups] = fn
        return fn

    # --------------------------------------------------------------- host

    def measure(
        self,
        samples: np.ndarray,  # [n_ms * L] or [n_ms, L] complex64 raw block IQ
        prn: int,
        pred_cp0_samples: float,  # predicted prompt code phase at block start
        drift_samples: float,  # predicted code-phase drift over the block
        pred_doppler_hz: float,  # predicted carrier Doppler (block center)
        static_offset_hz: float = 0.0,  # FDMA sub-band offset, wiped in f64
    ) -> DeepCoastMeasurement | None:
        """One block's measurement; None when the block is too short to form
        at least ``coast_meas_min_groups`` coherent groups.

        ``static_offset_hz`` (GLONASS FDMA sub-band offsets, up to ~±4 MHz)
        is removed HERE on host in float64 before the device program: the
        device wipeoff accumulates phase per chunk in float32, whose ~0.25
        cycle quantization at 4e6 cycles would put ~45° of per-ms phase
        jitter on exactly the weak-signal path that needs coherence. Only
        the kHz-scale Doppler grid reaches the float32 device wipeoff, and
        the returned ``doppler_hz`` excludes the offset."""
        cfg = self.config
        length = self.samples_per_prn
        nc = int(cfg.coast_meas_coherent_ms)
        samples = np.asarray(samples)
        if samples.ndim == 1:
            n_ms = samples.shape[0] // length
            samples = samples[: n_ms * length].reshape(n_ms, length)
        if static_offset_hz != 0.0:
            n_total = samples.shape[0] * samples.shape[1]
            t = np.arange(n_total, dtype=np.float64) / self.sample_rate
            rot = np.exp(-2j * np.pi * float(static_offset_hz) * t)
            samples = (samples.reshape(-1) * rot).reshape(samples.shape).astype(
                np.complex64
            )
        n_ms = samples.shape[0]
        n_groups = n_ms // nc
        if n_groups < int(cfg.coast_meas_min_groups):
            return None
        used = samples[: n_groups * nc]

        # Per-group predicted prompt code phase (linear in time: SV range
        # curvature over a block is < 1e-3 samples) and its integer rolls.
        drift_per_ms = drift_samples / max(n_ms, 1)
        g_center_ms = np.arange(n_groups) * nc + (nc - 1) / 2.0
        cp_pred_g = pred_cp0_samples + drift_per_ms * g_center_ms  # [G]
        cp_rolls = np.round(cp_pred_g).astype(np.int64)
        mean_frac = float(np.mean(cp_pred_g - cp_rolls))
        cp_rolls = np.mod(cp_rolls, length).astype(np.int32)

        c_bins = int(cfg.coast_meas_doppler_bins)
        step = float(cfg.coast_meas_doppler_step_hz)
        dopplers = (
            pred_doppler_hz + step * (np.arange(c_bins) - (c_bins - 1) / 2.0)
        ).astype(np.float32)

        fn = self._program(n_groups)
        row = self._prn_row[prn]
        y_planes = jax.device_get(
            fn(
                jnp.asarray(to_planes(used)),
                jnp.asarray(self._replicas_tiled[row]),
                jnp.asarray(dopplers),
                jnp.asarray(cp_rolls),
            )
        )
        y = y_planes[..., 0] + 1j * y_planes[..., 1]  # [G, C, Ktot]

        k_half = int(cfg.coast_meas_lag_halfwidth)
        k2 = 2 * k_half + 1
        sig = np.abs(y[:, :, :k2]).sum(axis=0)  # [C, K2]
        floor = np.abs(y[:, :, k2:]).sum(axis=0).mean(axis=-1)  # [C]
        norm = sig / np.maximum(floor[:, None], 1e-12)
        c_star, k_star = np.unravel_index(np.argmax(norm), norm.shape)
        strength = float(norm[c_star, k_star])

        peak_abs = float(sig[c_star, k_star])
        floor_abs = float(floor[c_star])
        threshold = 1.0 + float(cfg.coast_meas_threshold_k) / np.sqrt(n_groups)
        # An edge argmax cannot be vertex-interpolated and usually means the
        # true peak sits outside the window — treat as no detection. The
        # Doppler axis gets the same rule: the squared phase-slope residual
        # is only unambiguous to ±1/(4 t_group) (±25 Hz at 10 ms groups), so
        # an edge-bin Doppler would alias and re-anchor the coast to a wrong
        # frequency (advisor finding, round 3).
        detected = bool(
            strength >= threshold
            and 0 < k_star < k2 - 1
            and (c_bins == 1 or 0 < c_star < c_bins - 1)
        )
        if not detected:
            return DeepCoastMeasurement(
                detected=False,
                strength=strength,
                cp_error_samples=0.0,
                doppler_hz=float(pred_doppler_hz),
                groups=n_groups,
                peak_abs=peak_abs,
                floor_abs=floor_abs,
            )

        # Sub-sample vertex (same triangle interpolation as the tracker's
        # measured code phase, track/loop.py): R = accumulated |corr|.
        r0 = sig[c_star, k_star]
        rp = sig[c_star, k_star + 1]
        rm = sig[c_star, k_star - 1]
        frac = float(
            np.clip((rp - rm) / (2.0 * (r0 - min(rp, rm)) + 1e-12), -0.5, 0.5)
        )
        cp_error = (k_star - k_half) + frac - mean_frac

        # Doppler residual from the squared group-to-group phase slope
        # (squaring removes 50 bps data-bit sign flips between groups —
        # same estimator as acquire/deep.py:_refine).
        yw = y[:, c_star, k_star]
        q = yw[1:] * np.conj(yw[:-1])
        r = np.sum(q * q)
        t_group = nc * 1e-3
        residual = float(np.angle(r)) / (2.0 * 2.0 * np.pi * t_group)
        doppler = float(dopplers[c_star]) + residual

        return DeepCoastMeasurement(
            detected=True,
            strength=strength,
            cp_error_samples=float(cp_error),
            doppler_hz=doppler,
            groups=n_groups,
            peak_abs=peak_abs,
            floor_abs=floor_abs,
        )

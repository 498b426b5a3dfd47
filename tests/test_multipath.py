"""Multipath-resistant code-phase measurement (HRC / double-delta).

TrackingConfig.code_phase_measurement selects the sub-sample estimator that
feeds pseudoranges: "triangle" (vertex interpolation, the default) or "hrc"
(double-delta zero crossing). A reflected ray distorts the late side of the
correlation triangle, pulling the vertex by up to ~0.33 samples at a 0.5
relative amplitude; the HRC combination d1 - d2/2 cancels the ray's
contribution for delays beyond ~2 lag spacings, at the cost of ~2x thermal
noise. Only useful at >= 4 samples/chip — these tests run at 8.184 Msps
(8 samples/chip), the HackRF rate the reference declares but never uses
(reference: gypsum/radio_input.py:62-92).

reference: no counterpart — gypsum reads the raw FFT-correlation argmax
(gypsum/tracker.py:307-313) and never forms sub-sample pseudoranges.
"""

import dataclasses

import numpy as np
import pytest

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq
from gypsum_tpu.track.loop import TrackerBank

FS, L = 8.184e6, 8184  # 8 samples/chip
PRN = 25
TRUE_DELAY = 1000.3  # fractional stream samples


def _cfg(block_ms, measurement):
    return TrackingConfig(
        block_size_ms=block_ms,
        use_pallas_block_tracker=False,
        use_matmul_tracker=True,
        matmul_tracker_bf16=False,
        code_phase_measurement=measurement,
    )


def _track_bias(measurement, ray_phase, ray_delay_samples=4.0, ray_rel_amp=0.5,
                block_ms=1100, seed=1):
    """Track a static satellite (+ optional reflected ray) and return the
    median code-phase measurement error (samples) over the settled tail."""
    sats = [SyntheticSatellite(prn=PRN, delay_samples=TRUE_DELAY, amplitude=0.2)]
    if ray_rel_amp:
        sats.append(
            SyntheticSatellite(
                prn=PRN,
                delay_samples=TRUE_DELAY + ray_delay_samples,
                amplitude=0.2 * ray_rel_amp,
                carrier_phase_rad=ray_phase,
            )
        )
    iq = synthesize_iq(sats, block_ms * L, FS, noise_sigma=0.05, seed=seed)
    bank = TrackerBank(FS, L, _cfg(block_ms, measurement), n_channels=1)
    bank.assign(prn=PRN, doppler_hz=0.0, code_phase_samples=TRUE_DELAY,
                carrier_phase_rad=0.0)
    obs = bank.process_block(iq.reshape(block_ms, L), block_start_time=0.0)[0]
    assert not obs.lost
    tail = obs.code_phases_measured[-400:].astype(np.float64)
    err = (tail - TRUE_DELAY + L / 2.0) % L - L / 2.0
    return float(np.median(err))


def test_hrc_reduces_multipath_pseudorange_bias():
    """A 0.5-chip-delay ray at half amplitude: the HRC measurement's worst
    bias over the ray's carrier phase must be several times below the
    triangle estimator's (measured model values: ~0.06 vs ~0.33 samples —
    at 8.184 Msps a sample is ~37 m of pseudorange)."""
    phases = (0.0, 2.1, np.pi)
    tri = max(abs(_track_bias("triangle", p)) for p in phases)
    hrc = max(abs(_track_bias("hrc", p)) for p in phases)
    assert tri > 0.15, f"scenario too benign to discriminate (tri {tri:.3f})"
    assert hrc < 0.15, f"HRC bias {hrc:.3f} samples"
    assert hrc < 0.6 * tri, f"HRC {hrc:.3f} not better than triangle {tri:.3f}"


def test_hrc_clean_signal_unbiased():
    """No multipath: both estimators must agree with the true code phase
    (the HRC's extra noise is handled by the pseudorange projection's
    median, solve-side)."""
    for measurement, tol in (("triangle", 0.05), ("hrc", 0.08)):
        bias = _track_bias(measurement, 0.0, ray_rel_amp=0.0, block_ms=700)
        assert abs(bias) < tol, (measurement, bias)


def test_hrc_parity_scan_vs_matmul_vs_pallas_fixup():
    """The three tracker implementations must produce the same HRC
    measurement stream (scan exact-math; pallas fixup in interpret mode)."""
    import jax
    import jax.numpy as jnp

    from gypsum_tpu.core.planes import to_planes
    from gypsum_tpu.signal.prn import replica_table
    from gypsum_tpu.track.loop import fresh_state, make_track_block_fn

    B, S = 48, 4
    sat = SyntheticSatellite(prn=9, doppler_hz=700.0, delay_samples=100,
                             amplitude=0.3)
    iq = synthesize_iq([sat], B * 2046, 2.046e6, noise_sigma=0.2, seed=9)
    planes = jnp.asarray(to_planes(iq.reshape(B, 2046)))
    base = TrackingConfig(
        block_size_ms=B, use_pallas_block_tracker=False,
        use_matmul_tracker=False, code_phase_measurement="hrc",
    )
    cfg_scan = base
    cfg_mm = dataclasses.replace(base, use_matmul_tracker=True,
                                 matmul_tracker_bf16=False)
    cfg_pf = dataclasses.replace(cfg_mm, fixup_backend="pallas",
                                 fixup_group_ms=12)
    reps = replica_table(2046)
    k = base.lag_window_half_width
    wide = np.concatenate([reps, reps, reps[:, : 2 * k]], axis=1).astype(np.float32)
    replicas = jnp.asarray(np.tile(wide[8][None, :], (S, 1)))
    st = fresh_state(S)
    st = st._replace(doppler=st.doppler + 700.0, code_phase=st.code_phase + 100.0)

    outs = [
        jax.device_get(make_track_block_fn(c, 2046, 2.046e6, S)(st, planes, replicas))[1]
        for c in (cfg_scan, cfg_mm, cfg_pf)
    ]
    a = np.asarray(outs[0].code_phase_measured)
    for o in outs[1:]:
        np.testing.assert_allclose(
            np.asarray(o.code_phase_measured), a, atol=5e-3
        )


def test_hrc_validation():
    with pytest.raises(ValueError, match="lag_window_half_width"):
        TrackerBank(
            FS, L,
            dataclasses.replace(_cfg(10, "hrc"), lag_window_half_width=2),
            n_channels=1,
        )
    with pytest.raises(ValueError, match="code_phase_measurement"):
        TrackerBank(FS, L, _cfg(10, "parabola"), n_channels=1)

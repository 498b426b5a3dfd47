"""Marginal-channel rescue tier (reference: gypsum/tracker.py:380-387).

Round-1 gap (VERDICT item 5): a channel between "marginal" and "dead" went
straight to drop + 10 s-cadence reacquisition. The rescue tier corrects the
Doppler in place at a block boundary using the squared-prompt phase slope.

Scenario: a satellite tracked cleanly past watchdog warmup suffers a sudden
Doppler step (e.g. receiver clock glitch) larger than the PLL pull-in range.
Without rescue the quality EMA decays through the marginal band to the drop
threshold and the sticky lost flag fires; with rescue the host measures the
residual and re-centers the loop, keeping the channel alive.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq
from gypsum_tpu.track.loop import TrackerBank

FS, L = 2.046e6, 2046
BLOCK_MS = 500


def _doppler_step_capture(f0: float, f1: float, t_pre_s: float, t_post_s: float):
    """IQ with a carrier-Doppler step at t_pre_s.

    The CODE phase is kept continuous across the seam (a real oscillator
    glitch steps the carrier, not the code position): segment 2's delay is
    solved so chip_pos is continuous given its different code-Doppler rate.
    Only the carrier phase jumps at the seam — part of the impairment."""
    from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ

    d1 = 200.0
    r1 = 1.0 + f0 / GPS_L1_FREQUENCY_HZ
    r2 = 1.0 + f1 / GPS_L1_FREQUENCY_HZ
    t_seam = t_pre_s
    # chip_pos continuity: (t_seam - d2/fs) r2 = (t_seam - d1/fs) r1.
    d2 = FS * (t_seam * (1.0 - r1 / r2) + (d1 / FS) * (r1 / r2))
    n_pre = int(t_pre_s * 1000)
    n_post = int(t_post_s * 1000)
    seg1 = synthesize_iq(
        [SyntheticSatellite(prn=7, doppler_hz=f0, delay_samples=d1, amplitude=0.3)],
        n_pre * L, FS, noise_sigma=0.2, seed=5,
    )
    seg2 = synthesize_iq(
        [SyntheticSatellite(prn=7, doppler_hz=f1, delay_samples=d2, amplitude=0.3)],
        n_post * L, FS, noise_sigma=0.2, seed=6, t0=t_seam,
    )
    return np.concatenate([seg1, seg2]).reshape(n_pre + n_post, L)


def _run(rescue_enabled: bool):
    cfg = TrackingConfig(
        block_size_ms=BLOCK_MS,
        use_pallas_block_tracker=False,
        use_matmul_tracker=False,
        rescue_enabled=rescue_enabled,
    )
    bank = TrackerBank(FS, L, cfg, n_channels=2)
    bank.assign(prn=7, doppler_hz=1000.0, code_phase_samples=200.0, carrier_phase_rad=0.0)
    iq = _doppler_step_capture(1000.0, 1012.0, t_pre_s=6.5, t_post_s=6.0)
    n_blocks = iq.shape[0] // BLOCK_MS
    events = {"dropped_at": None, "rescued_at": [], "final_quality": None,
              "final_doppler": None}
    for b in range(n_blocks):
        t0 = b * BLOCK_MS * 1e-3
        block = iq[b * BLOCK_MS : (b + 1) * BLOCK_MS]
        obs = bank.process_block(block, t0)[0]
        if obs.lost:
            events["dropped_at"] = t0
            break
        if bank.maybe_rescue(obs, t0 + BLOCK_MS * 1e-3):
            events["rescued_at"].append(t0 + BLOCK_MS * 1e-3)
        events["final_quality"] = float(obs.quality[-1])
        events["final_doppler"] = float(obs.dopplers[-1])
    return events


def test_doppler_step_drops_without_rescue():
    """Baseline (round-1 behavior): the 12 Hz step kills the channel."""
    ev = _run(rescue_enabled=False)
    assert ev["dropped_at"] is not None, ev
    assert ev["dropped_at"] > 6.5  # healthy until the step


def test_doppler_step_rescued_in_place():
    """With the rescue tier the same scenario stays alive: the phase-slope
    measurement recovers the 12 Hz residual and the channel re-locks."""
    ev = _run(rescue_enabled=True)
    assert ev["dropped_at"] is None, ev
    assert ev["rescued_at"], "rescue never fired"
    assert ev["rescued_at"][0] > 6.5
    assert ev["final_quality"] > 0.5, ev
    assert abs(ev["final_doppler"] - 1012.0) < 2.0, ev


def test_rescue_leaves_healthy_channels_alone():
    """No Doppler step: the rescue tier must never fire on a clean track."""
    cfg = TrackingConfig(
        block_size_ms=BLOCK_MS,
        use_pallas_block_tracker=False,
        use_matmul_tracker=False,
    )
    bank = TrackerBank(FS, L, cfg, n_channels=2)
    bank.assign(prn=7, doppler_hz=-800.0, code_phase_samples=50.0, carrier_phase_rad=0.0)
    iq = synthesize_iq(
        [SyntheticSatellite(prn=7, doppler_hz=-800.0, delay_samples=50, amplitude=0.3)],
        4 * BLOCK_MS * L, FS, noise_sigma=0.25, seed=11,
    ).reshape(-1, L)
    for b in range(4):
        obs = bank.process_block(iq[b * BLOCK_MS : (b + 1) * BLOCK_MS], b * BLOCK_MS * 1e-3)[0]
        assert not bank.maybe_rescue(obs, (b + 1) * BLOCK_MS * 1e-3)
        assert not obs.lost
    assert bank.rescue_counts[0] == 0

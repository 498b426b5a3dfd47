"""Whole-block Pallas tracker (ops/pallas_track.py) vs the XLA hoisted scan:
same state evolution and observables (interpret mode on CPU; the same kernel
compiles on TPU where it is the default)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.core.planes import to_planes
from gypsum_tpu.signal.prn import replica_table
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq
from gypsum_tpu.track.loop import fresh_state, make_track_block_fn

FS, L = 2.046e6, 2046


def test_block_kernel_matches_scan_path():
    S, B = 8, 48
    sat = SyntheticSatellite(prn=9, doppler_hz=700.0, delay_samples=100, amplitude=0.3)
    iq = synthesize_iq([sat], B * L, FS, noise_sigma=0.2, seed=9).reshape(B, L)
    planes = jnp.asarray(to_planes(iq))
    # Force the same margin on both paths (the block kernel uses a fixed
    # margin of 10 to keep its lag matrix within VMEM).
    cfg_scan = TrackingConfig(
        block_size_ms=B, use_pallas_block_tracker=False, lag_window_block_margin=10
    )
    cfg_kernel = dataclasses.replace(cfg_scan, use_pallas_block_tracker=True)
    reps = replica_table(L)
    k = cfg_scan.lag_window_half_width
    wide = np.concatenate([reps, reps, reps[:, : 2 * k]], axis=1).astype(np.float32)
    replicas = jnp.asarray(np.tile(wide[8][None, :], (S, 1)))
    st = fresh_state(S)
    st = st._replace(doppler=st.doppler + 700.0, code_phase=st.code_phase + 100.0)

    f_scan = make_track_block_fn(cfg_scan, L, FS, S)
    f_kern = make_track_block_fn(cfg_kernel, L, FS, S)
    sA, oA = jax.device_get(f_scan(st, planes, replicas))
    sB, oB = jax.device_get(f_kern(st, planes, replicas))

    for name in ("code_phase", "carrier_phase", "doppler", "ema_err", "ema_quality"):
        a = np.asarray(getattr(sA, name)).ravel()
        b = np.asarray(getattr(sB, name)).ravel()
        np.testing.assert_allclose(b, a, atol=2e-3 * max(1.0, np.abs(a).max()), err_msg=name)
    assert np.array_equal(np.asarray(sA.step_count).ravel(), np.asarray(sB.step_count).ravel())
    for name in (
        "prompt_i", "prompt_q", "code_phase", "code_phase_measured",
        "doppler", "pll_error", "dll_error", "quality",
    ):
        a = np.asarray(getattr(oA, name))
        b = np.asarray(getattr(oB, name))
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=5e-3 * scale, err_msg=name)
    assert np.array_equal(np.asarray(oA.locked), np.asarray(oB.locked))
    assert np.array_equal(np.asarray(oA.lost), np.asarray(oB.lost))


def test_block_kernel_through_tracker_bank():
    """The TrackerBank wrapper path: pseudosymbols decoded identically."""
    from gypsum_tpu.track.loop import TrackerBank

    B = 64
    sat = SyntheticSatellite(prn=25, doppler_hz=-1200.0, delay_samples=777, amplitude=0.3)
    iq = synthesize_iq([sat], B * L, FS, noise_sigma=0.25, seed=4).reshape(B, L)

    def run(use_kernel):
        cfg = TrackingConfig(
            block_size_ms=B,
            use_pallas_block_tracker=use_kernel,
            lag_window_block_margin=10,
        )
        bank = TrackerBank(FS, L, cfg, n_channels=4)
        bank.assign(prn=25, doppler_hz=-1200.0, code_phase_samples=777, carrier_phase_rad=0.2)
        obs = bank.process_block(iq, block_start_time=0.0)
        return obs[0]

    a = run(False)
    b = run(True)
    np.testing.assert_array_equal(a.pseudosymbol_signs, b.pseudosymbol_signs)
    np.testing.assert_allclose(b.dopplers, a.dopplers, atol=0.5)
    np.testing.assert_allclose(b.code_phases, a.code_phases, atol=0.01)

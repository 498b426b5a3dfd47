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
        block_size_ms=B, use_pallas_block_tracker=False,
        use_matmul_tracker=False, lag_window_block_margin=10
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
            use_matmul_tracker=False if not use_kernel else None,
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


def test_block_margin_honors_config_and_scales():
    """Regression: the kernel previously hard-coded margin=10, ignoring
    lag_window_block_margin and block size — at 2000 ms blocks and ~7 kHz
    Doppler the drift outran the window and the prompt was lost mid-block."""
    from gypsum_tpu.ops.pallas_track import block_margin, lag_matrix_bytes

    assert block_margin(TrackingConfig(lag_window_block_margin=33), L) == 33
    m1000 = block_margin(TrackingConfig(block_size_ms=1000), L)
    m4000 = block_margin(TrackingConfig(block_size_ms=4000), L)
    # Auto margin covers half the worst-case aided drift (window centered on
    # the predicted mid-block code phase) plus slack, and scales with B.
    drift_1000 = 7000.0 / 1.57542e9 * L * 1000  # ~9.1 samples
    assert m1000 >= drift_1000 / 2 + 8 - 1
    assert m4000 - 8 >= 4 * (m1000 - 8) - 4
    assert lag_matrix_bytes(TrackingConfig(block_size_ms=4000), L, 32) > lag_matrix_bytes(
        TrackingConfig(block_size_ms=1000), L, 32
    )


def test_block_kernel_tracks_high_doppler_full_drift():
    """The reviewer's divergence scenario, scaled to test time: high Doppler,
    auto margin — the kernel must keep the prompt inside its window for the
    whole block and match the scan path."""
    S, B = 4, 120
    dopp = 6800.0
    sat = SyntheticSatellite(prn=3, doppler_hz=dopp, delay_samples=900, amplitude=0.35)
    iq = synthesize_iq([sat], B * L, FS, noise_sigma=0.15, seed=21).reshape(B, L)
    planes = jnp.asarray(to_planes(iq))
    reps = replica_table(L)
    k = TrackingConfig().lag_window_half_width
    wide = np.concatenate([reps, reps, reps[:, : 2 * k]], axis=1).astype(np.float32)
    replicas = jnp.asarray(np.tile(wide[2][None, :], (S, 1)))
    st = fresh_state(S)
    st = st._replace(doppler=st.doppler + dopp, code_phase=st.code_phase + 900.0)

    cfg_scan = TrackingConfig(block_size_ms=B, use_pallas_block_tracker=False, use_matmul_tracker=False)
    cfg_kern = TrackingConfig(block_size_ms=B, use_pallas_block_tracker=True)
    sA, oA = jax.device_get(make_track_block_fn(cfg_scan, L, FS, S)(st, planes, replicas))
    sB, oB = jax.device_get(make_track_block_fn(cfg_kern, L, FS, S)(st, planes, replicas))
    # The prompt magnitude must not collapse at block end (the failure mode
    # of the hard-coded margin) and the code phase must agree with the scan.
    pa = np.abs(np.asarray(oA.prompt_i))[-10:].mean()
    pb = np.abs(np.asarray(oB.prompt_i))[-10:].mean()
    assert pb > 0.5 * pa
    np.testing.assert_allclose(
        np.asarray(sB.code_phase).ravel(), np.asarray(sA.code_phase).ravel(), atol=0.05
    )

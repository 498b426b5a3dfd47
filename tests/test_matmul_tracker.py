"""Two-phase MXU tracker (track/matmul.py) vs the XLA hoisted scan.

The matmul tracker wipes every millisecond with the block-start carrier
state and rotates the prompt by the (exact) phase difference, so it matches
the scan path bit-for-bit at block start and to the within-ms residual
Doppler sinc factor (>= 0.992) during pull-in. These tests pin:
- numeric parity of state evolution and observables on a steady track;
- decode-level parity (identical pseudosymbols) through the TrackerBank;
- convergence parity during pull-in (initial Doppler error);
- farm-mode (per-channel streams) parity.
"""

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.core.planes import to_planes
from gypsum_tpu.signal.prn import replica_table
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq
from gypsum_tpu.track.loop import fresh_state, make_track_block_fn

FS, L = 2.046e6, 2046


def _cfgs(block_ms):
    scan = TrackingConfig(
        block_size_ms=block_ms,
        use_pallas_block_tracker=False,
        use_matmul_tracker=False,
    )
    mm = dataclasses.replace(
        scan, use_matmul_tracker=True, matmul_tracker_bf16=False
    )
    return scan, mm


def _replicas(prn, n_channels, cfg):
    reps = replica_table(L)
    k = cfg.lag_window_half_width
    wide = np.concatenate([reps, reps, reps[:, : 2 * k]], axis=1).astype(np.float32)
    return jnp.asarray(np.tile(wide[prn - 1][None, :], (n_channels, 1)))


def test_matmul_tracker_matches_scan_path():
    S, B = 8, 48
    sat = SyntheticSatellite(prn=9, doppler_hz=700.0, delay_samples=100, amplitude=0.3)
    iq = synthesize_iq([sat], B * L, FS, noise_sigma=0.2, seed=9).reshape(B, L)
    planes = jnp.asarray(to_planes(iq))
    cfg_scan, cfg_mm = _cfgs(B)
    replicas = _replicas(9, S, cfg_scan)
    st = fresh_state(S)
    st = st._replace(doppler=st.doppler + 700.0, code_phase=st.code_phase + 100.0)

    sA, oA = jax.device_get(make_track_block_fn(cfg_scan, L, FS, S)(st, planes, replicas))
    sB, oB = jax.device_get(make_track_block_fn(cfg_mm, L, FS, S)(st, planes, replicas))

    for name in ("code_phase", "carrier_phase", "doppler", "ema_err", "ema_quality"):
        a = np.asarray(getattr(sA, name)).ravel()
        b = np.asarray(getattr(sB, name)).ravel()
        np.testing.assert_allclose(
            b, a, atol=2e-3 * max(1.0, np.abs(a).max()), err_msg=name
        )
    assert np.array_equal(
        np.asarray(sA.step_count).ravel(), np.asarray(sB.step_count).ravel()
    )
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


def test_matmul_tracker_pullin_convergence_parity():
    """Start 5 Hz off the true Doppler (the worst the acquisition engine
    hands over is ~1 Hz after phase-slope refinement): both paths must pull
    in to the same trajectory (the matmul path's block-start wipeoff is
    exact up to the residual-Doppler sinc, negligible at these excursions).
    """
    S, B = 4, 300
    sat = SyntheticSatellite(prn=3, doppler_hz=-2500.0, delay_samples=400, amplitude=0.35)
    iq = synthesize_iq([sat], B * L, FS, noise_sigma=0.2, seed=3).reshape(B, L)
    planes = jnp.asarray(to_planes(iq))
    cfg_scan, cfg_mm = _cfgs(B)
    replicas = _replicas(3, S, cfg_scan)
    st = fresh_state(S)
    st = st._replace(
        doppler=st.doppler - 2505.0, code_phase=st.code_phase + 400.0
    )  # 5 Hz initial error (normalized-discriminator slew is ~0.07 Hz/ms)

    sA, oA = jax.device_get(make_track_block_fn(cfg_scan, L, FS, S)(st, planes, replicas))
    sB, oB = jax.device_get(make_track_block_fn(cfg_mm, L, FS, S)(st, planes, replicas))
    # Both must converge to the true Doppler...
    assert abs(float(np.asarray(sA.doppler).ravel()[0]) + 2500.0) < 2.0
    assert abs(float(np.asarray(sB.doppler).ravel()[0]) + 2500.0) < 2.0
    # ...and stay on the same trajectory throughout.
    np.testing.assert_allclose(
        np.asarray(oB.doppler), np.asarray(oA.doppler), atol=1.0
    )
    np.testing.assert_allclose(
        np.asarray(oB.code_phase), np.asarray(oA.code_phase), atol=0.05
    )


def test_matmul_tracker_through_tracker_bank():
    """Decode-level parity: identical pseudosymbol streams via TrackerBank."""
    from gypsum_tpu.track.loop import TrackerBank

    B = 64
    sat = SyntheticSatellite(prn=25, doppler_hz=-1200.0, delay_samples=777, amplitude=0.3)
    iq = synthesize_iq([sat], B * L, FS, noise_sigma=0.25, seed=4).reshape(B, L)

    def run(use_mm):
        cfg_scan, cfg_mm = _cfgs(B)
        bank = TrackerBank(FS, L, cfg_mm if use_mm else cfg_scan, n_channels=4)
        bank.assign(prn=25, doppler_hz=-1200.0, code_phase_samples=777, carrier_phase_rad=0.2)
        return bank.process_block(iq, block_start_time=0.0)[0]

    a = run(False)
    b = run(True)
    np.testing.assert_array_equal(a.pseudosymbol_signs, b.pseudosymbol_signs)
    np.testing.assert_allclose(b.dopplers, a.dopplers, atol=0.5)
    np.testing.assert_allclose(b.code_phases, a.code_phases, atol=0.01)


def test_fixup_kernel_matches_scan():
    """Phase-2 grouped Pallas fixup (ops/pallas_fixup.py, interpret mode on
    CPU) vs the lax.scan fixup: identical state evolution and observables."""
    S, B = 8, 48
    sat = SyntheticSatellite(prn=9, doppler_hz=700.0, delay_samples=100, amplitude=0.3)
    iq = synthesize_iq([sat], B * L, FS, noise_sigma=0.2, seed=9).reshape(B, L)
    planes = jnp.asarray(to_planes(iq))
    _, cfg_mm = _cfgs(B)
    cfg_pallas = dataclasses.replace(cfg_mm, fixup_backend="pallas", fixup_group_ms=12)
    replicas = _replicas(9, S, cfg_mm)
    st = fresh_state(S)
    st = st._replace(doppler=st.doppler + 700.0, code_phase=st.code_phase + 100.0)

    sA, oA = jax.device_get(make_track_block_fn(cfg_mm, L, FS, S)(st, planes, replicas))
    sB, oB = jax.device_get(make_track_block_fn(cfg_pallas, L, FS, S)(st, planes, replicas))
    for name in ("code_phase", "carrier_phase", "doppler", "ema_err", "ema_quality"):
        a = np.asarray(getattr(sA, name)).ravel()
        b = np.asarray(getattr(sB, name)).ravel()
        np.testing.assert_allclose(
            b, a, atol=1e-4 * max(1.0, np.abs(a).max()), err_msg=name
        )
    assert np.array_equal(
        np.asarray(sA.step_count).ravel(), np.asarray(sB.step_count).ravel()
    )
    for name in (
        "prompt_i", "prompt_q", "code_phase", "code_phase_measured",
        "doppler", "pll_error", "dll_error", "quality",
    ):
        a = np.asarray(getattr(oA, name))
        b = np.asarray(getattr(oB, name))
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=1e-4 * scale, err_msg=name)
    assert np.array_equal(np.asarray(oA.locked), np.asarray(oB.locked))
    assert np.array_equal(np.asarray(oA.lost), np.asarray(oB.lost))


def test_matmul_tracker_farm_mode_parity():
    """Per-channel streams (the farm batch axis): the matmul path gathers
    each channel's stream before the batched contraction."""
    from gypsum_tpu.track.loop import make_farm_track_block_fn

    n_streams, ch_per_stream, B = 2, 2, 48
    s_total = n_streams * ch_per_stream
    cfg_scan, cfg_mm = _cfgs(B)
    stream_of_channel = np.repeat(np.arange(n_streams), ch_per_stream).astype(np.int32)
    sats = [
        SyntheticSatellite(prn=7, doppler_hz=800.0, delay_samples=50, amplitude=0.3),
        SyntheticSatellite(prn=7, doppler_hz=-450.0, delay_samples=900, amplitude=0.3),
    ]
    streams = [
        synthesize_iq([s], B * L, FS, noise_sigma=0.2, seed=10 + i).reshape(B, L)
        for i, s in enumerate(sats)
    ]
    planes = jnp.asarray(
        np.stack([to_planes(s) for s in streams], axis=1)
    )  # [B, N, L, 2]
    replicas = _replicas(7, s_total, cfg_scan)
    st = fresh_state(s_total)
    st = st._replace(
        doppler=np.array([800.0, 800.0, -450.0, -450.0], dtype=np.float32),
        code_phase=np.array([50.0, 50.0, 900.0, 900.0], dtype=np.float32),
    )

    fA = make_farm_track_block_fn(cfg_scan, L, FS, s_total, stream_of_channel)
    fB = make_farm_track_block_fn(cfg_mm, L, FS, s_total, stream_of_channel)
    sA, oA = jax.device_get(fA(st, planes, replicas))
    sB, oB = jax.device_get(fB(st, planes, replicas))
    np.testing.assert_allclose(
        np.asarray(sB.doppler).ravel(), np.asarray(sA.doppler).ravel(), atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(sB.code_phase).ravel(), np.asarray(sA.code_phase).ravel(), atol=0.01
    )
    assert np.array_equal(
        np.sign(np.asarray(oA.prompt_i)), np.sign(np.asarray(oB.prompt_i))
    )


def test_fixup_kernel_channel_slabs_parity():
    """Beyond _S_SLAB (=256) channels the fixup runs as VMEM-sized
    pallas_call slabs (a single 512-channel call overflows v5e scoped
    vmem); the slabbed program must match the scan path exactly like the
    single-call one does. 300 channels exercises one full slab plus a
    44-channel tail."""
    S, B = 300, 24
    sat = SyntheticSatellite(prn=9, doppler_hz=700.0, delay_samples=100, amplitude=0.3)
    iq = synthesize_iq([sat], B * L, FS, noise_sigma=0.2, seed=9).reshape(B, L)
    planes = jnp.asarray(to_planes(iq))
    _, cfg_mm = _cfgs(B)
    cfg_pallas = dataclasses.replace(cfg_mm, fixup_backend="pallas", fixup_group_ms=12)
    replicas = _replicas(9, S, cfg_mm)
    st = fresh_state(S)
    # Spread the channels over distinct states so a slab-boundary mixup
    # cannot cancel out.
    st = st._replace(
        doppler=(st.doppler + 700.0 + 2.0 * np.arange(S)).astype(np.float32),
        code_phase=(st.code_phase + 100.0 + (np.arange(S) % 7)).astype(np.float32),
    )

    sA, oA = jax.device_get(make_track_block_fn(cfg_mm, L, FS, S)(st, planes, replicas))
    sB, oB = jax.device_get(make_track_block_fn(cfg_pallas, L, FS, S)(st, planes, replicas))
    for name in ("code_phase", "carrier_phase", "doppler", "ema_err", "ema_quality"):
        a = np.asarray(getattr(sA, name)).ravel()
        b = np.asarray(getattr(sB, name)).ravel()
        np.testing.assert_allclose(
            b, a, atol=1e-4 * max(1.0, np.abs(a).max()), err_msg=name
        )
    for name in ("prompt_i", "prompt_q", "code_phase_measured", "doppler"):
        a = np.asarray(getattr(oA, name))
        b = np.asarray(getattr(oB, name))
        np.testing.assert_allclose(
            b, a, atol=1e-4 * max(1.0, np.abs(a).max()), err_msg=name
        )

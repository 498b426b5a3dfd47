"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: mesh sharding, ppermute halo exchange, all-reduce argmax,
exercised deterministically without a cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gypsum_tpu.core.planes import to_planes
from gypsum_tpu.ops.correlate import replica_fft_conj_table
from gypsum_tpu.parallel.mesh import factor_devices, make_receiver_mesh
from gypsum_tpu.parallel.sharded import sharded_acquisition_sweep
from gypsum_tpu.parallel.streaming import (
    linear_replica_fft_conj,
    time_sharded_correlation_power,
)
from gypsum_tpu.signal.prn import replica_table, sampled_replica
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

FS = 2.046e6
L = 2046


def test_factor_devices():
    assert factor_devices(8) == (4, 2)
    assert factor_devices(16) == (4, 4)
    assert factor_devices(7) == (7, 1)
    assert factor_devices(1) == (1, 1)


def test_mesh_shape():
    mesh = make_receiver_mesh()
    assert mesh.shape == {"sat": 4, "time": 2}
    assert mesh.devices.size == 8


def test_sharded_acquisition_matches_single_device(rng):
    truth = SyntheticSatellite(prn=17, doppler_hz=1500.0, delay_samples=321, amplitude=0.3)
    iq = synthesize_iq([truth], 4 * L, FS, noise_sigma=0.3, seed=4).reshape(4, L)
    dopplers = jnp.asarray(np.arange(-2000.0, 2001.0, 500.0), dtype=jnp.float32)
    pfc = jnp.asarray(to_planes(replica_fft_conj_table(replica_table(L))))
    mesh = make_receiver_mesh()

    strength, d_idx, code_phase, best_row, best_val = jax.device_get(
        sharded_acquisition_sweep(mesh, jnp.asarray(to_planes(iq)), dopplers, pfc, FS)
    )
    assert strength.shape == (32,)
    assert int(np.argmax(strength)) == 16  # PRN 17 -> row 16
    assert int(best_row) == 16
    np.testing.assert_allclose(best_val, strength[16], rtol=1e-6)
    assert int(code_phase[16]) == 321
    assert float(dopplers[d_idx[16]]) == 1500.0


def test_time_sharded_streaming_matches_oracle(rng):
    # 16 chunks across 8 shards (2 each); correlation windows cross shard
    # boundaries, exercising the ppermute halos.
    n_chunks = 16
    rep = sampled_replica(5, L).real.astype(np.float32)
    iq = (0.1 * (rng.standard_normal(n_chunks * L) + 1j * rng.standard_normal(n_chunks * L))).astype(np.complex64)
    # Plant one PRN burst straddling a shard boundary (chunk 1->2 edge lies
    # inside shard 0->1 transition for 2-chunk shards).
    pos = 2 * L - 700
    iq[pos : pos + L] += 0.8 * rep.astype(np.complex64)

    mesh = make_receiver_mesh()
    power = np.asarray(time_sharded_correlation_power(mesh, jnp.asarray(to_planes(iq)), rep))
    assert power.shape == (n_chunks, L)

    # Oracle: direct linear correlation per chunk.
    pfc2 = linear_replica_fft_conj(rep)
    iq_ext = np.concatenate([iq, iq[:L]])
    want = np.empty((n_chunks, L))
    for i in range(n_chunks):
        win = iq_ext[i * L : i * L + 2 * L]
        want[i] = np.abs(np.fft.ifft(np.fft.fft(win) * pfc2))[:L]
    np.testing.assert_allclose(power, want, rtol=2e-3, atol=2e-2)

    # The planted burst is found at the right chunk and lag.
    ci, lag = np.unravel_index(np.argmax(power), power.shape)
    assert ci * L + lag == pos


def test_channel_sharded_tracking_block():
    """A tracking block step jitted over the mesh with channels sharded on
    'sat' must produce the same outputs as the unsharded step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gypsum_tpu.core.config import TrackingConfig
    from gypsum_tpu.signal.prn import replica_table
    from gypsum_tpu.track.loop import fresh_state, make_track_block_fn

    mesh = make_receiver_mesh()
    n_channels = 8
    cfg = TrackingConfig(block_size_ms=8)
    fn = make_track_block_fn(cfg, L, FS, n_channels)

    sat = SyntheticSatellite(prn=9, doppler_hz=700.0, delay_samples=100, amplitude=0.3)
    iq = synthesize_iq([sat], 8 * L, FS, noise_sigma=0.2, seed=9).reshape(8, L)
    k = cfg.lag_window_half_width
    reps = replica_table(L)
    wide = np.concatenate([reps, reps, reps[:, : 2 * k]], axis=1).astype(np.float32)
    replicas = np.tile(wide[8][None, :], (n_channels, 1))

    state = fresh_state(n_channels)
    state = state._replace(
        doppler=state.doppler + 700.0, code_phase=state.code_phase + 100.0
    )

    iq_planes = jnp.asarray(to_planes(iq))
    ref_state, ref_out = jax.device_get(fn(state, iq_planes, jnp.asarray(replicas)))

    chan = NamedSharding(mesh, P("sat"))
    repl = NamedSharding(mesh, P())
    state_sh = jax.tree_util.tree_map(lambda a: jax.device_put(a, chan), state)
    got_state, got_out = jax.device_get(
        fn(state_sh, jax.device_put(iq_planes, repl), jax.device_put(jnp.asarray(replicas), chan))
    )
    np.testing.assert_allclose(got_out.prompt_i, ref_out.prompt_i, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got_out.prompt_q, ref_out.prompt_q, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got_state.doppler, ref_state.doppler, rtol=1e-5)
    np.testing.assert_allclose(got_state.code_phase, ref_state.code_phase, rtol=1e-5)


def test_shard_mapped_fast_tracker_matches_single_device():
    """VERDICT round-1 item 4: multi-chip tracking must keep the fast
    (matmul + Pallas fixup) path. make_sharded_track_block_fn runs the full
    single-device program per shard inside shard_map — parity vs the
    unsharded matmul tracker on the virtual mesh."""
    import dataclasses

    from gypsum_tpu.core.config import TrackingConfig
    from gypsum_tpu.parallel.sharded import make_sharded_track_block_fn
    from gypsum_tpu.signal.prn import replica_table
    from gypsum_tpu.track.loop import fresh_state, make_track_block_fn

    mesh = make_receiver_mesh()
    n_channels = 8
    cfg = TrackingConfig(
        block_size_ms=12,
        use_matmul_tracker=True,
        matmul_tracker_bf16=False,
        fixup_backend="pallas",  # interpret mode on CPU; Mosaic on TPU
        fixup_group_ms=6,
    )
    sat = SyntheticSatellite(prn=9, doppler_hz=700.0, delay_samples=100, amplitude=0.3)
    iq = synthesize_iq([sat], 12 * L, FS, noise_sigma=0.2, seed=9).reshape(12, L)
    k = cfg.lag_window_half_width
    reps = replica_table(L)
    wide = np.concatenate([reps, reps, reps[:, : 2 * k]], axis=1).astype(np.float32)
    replicas = jnp.asarray(np.tile(wide[8][None, :], (n_channels, 1)))

    state = fresh_state(n_channels)
    state = state._replace(
        doppler=state.doppler + 700.0, code_phase=state.code_phase + 100.0
    )
    iq_planes = jnp.asarray(to_planes(iq))

    ref_fn = make_track_block_fn(cfg, L, FS, n_channels)
    ref_state, ref_out = jax.device_get(ref_fn(state, iq_planes, replicas))

    sh_fn = make_sharded_track_block_fn(mesh, cfg, L, FS, n_channels)
    got_state, got_out = jax.device_get(sh_fn(state, iq_planes, replicas))

    np.testing.assert_allclose(got_out.prompt_i, ref_out.prompt_i, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got_out.prompt_q, ref_out.prompt_q, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(got_state.doppler).ravel(), np.asarray(ref_state.doppler).ravel(), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_state.code_phase).ravel(),
        np.asarray(ref_state.code_phase).ravel(), rtol=1e-5,
    )
    assert np.array_equal(np.asarray(got_out.locked), np.asarray(ref_out.locked))

"""Multi-stream farm tracking: N independent IQ streams, one device dispatch
(track/loop.py:make_farm_track_block_fn). Each stream's channels must evolve
exactly as they would in a standalone single-stream tracker."""

import numpy as np
import jax
import jax.numpy as jnp

from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.core.planes import to_planes
from gypsum_tpu.signal.prn import replica_table
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq
from gypsum_tpu.track.loop import (
    fresh_state,
    make_farm_track_block_fn,
    make_track_block_fn,
)

FS, L = 2.046e6, 2046


def test_farm_matches_independent_single_stream_runs():
    B = 40
    sats = [
        SyntheticSatellite(prn=5, doppler_hz=900.0, delay_samples=300, amplitude=0.3),
        SyntheticSatellite(prn=23, doppler_hz=-2500.0, delay_samples=1500, amplitude=0.3),
    ]
    streams = [
        synthesize_iq([sats[0]], B * L, FS, noise_sigma=0.25, seed=41).reshape(B, L),
        synthesize_iq([sats[1]], B * L, FS, noise_sigma=0.25, seed=42).reshape(B, L),
    ]

    cfg = TrackingConfig(block_size_ms=B, lag_window_block_margin=10)
    reps = replica_table(L)
    k = cfg.lag_window_half_width
    wide = np.concatenate([reps, reps, reps[:, : 2 * k]], axis=1).astype(np.float32)

    # Farm: 2 streams x 2 channels each (PRN of its stream's satellite).
    stream_of_channel = np.array([0, 0, 1, 1], dtype=np.int32)
    prn_rows = np.array([4, 4, 22, 22])  # 0-based PRN index per channel
    replicas_farm = jnp.asarray(wide[prn_rows])
    st = fresh_state(4)
    st = st._replace(
        doppler=np.array([900.0, 900.0, -2500.0, -2500.0], np.float32),
        code_phase=np.array([300.0, 300.0, 1500.0, 1500.0], np.float32),
    )
    farm = make_farm_track_block_fn(cfg, L, FS, 4, stream_of_channel)
    farm_samples = jnp.asarray(
        np.stack([to_planes(s) for s in streams], axis=1)
    )  # [B, N, L, 2]
    s_farm, o_farm = jax.device_get(farm(st, farm_samples, replicas_farm))

    # Oracle: each stream through a standalone 2-channel tracker.
    for n, (stream, prn_row, dopp, cp) in enumerate(
        [(streams[0], 4, 900.0, 300.0), (streams[1], 22, -2500.0, 1500.0)]
    ):
        single = make_track_block_fn(cfg, L, FS, 2)
        st1 = fresh_state(2)
        st1 = st1._replace(
            doppler=st1.doppler + dopp, code_phase=st1.code_phase + cp
        )
        s1, o1 = jax.device_get(
            single(st1, jnp.asarray(to_planes(stream)), jnp.asarray(wide[[prn_row, prn_row]]))
        )
        cols = slice(2 * n, 2 * n + 2)
        np.testing.assert_allclose(
            np.asarray(s_farm.doppler)[cols], np.asarray(s1.doppler), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_farm.code_phase)[cols], np.asarray(s1.code_phase), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(o_farm.prompt_i)[:, cols], np.asarray(o1.prompt_i), rtol=1e-5, atol=1e-2
        )
        assert np.array_equal(np.asarray(o_farm.locked)[:, cols], np.asarray(o1.locked))

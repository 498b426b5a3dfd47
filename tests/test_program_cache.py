"""Process-wide sharing of jitted programs across Receiver construction.

Constructing a Receiver (campaign worker, bench run_once, checkpoint
restart) must NOT re-trace the block tracker or rebuild the acquisition
engine's device tables: both are pure functions of their hashable build
parameters. Without sharing, every construction pays hundreds of ms of
trace + lowering even on a warm persistent compile cache — the dominant
cost of in-process receiver restarts (see track/loop.py:_TRACK_FN_CACHE,
acquire/engine.py:shared_acquisition_engine).
"""

import dataclasses

import numpy as np

from gypsum_tpu.acquire.engine import shared_acquisition_engine
from gypsum_tpu.core.config import AcquisitionConfig, TrackingConfig
from gypsum_tpu.track.loop import TrackerBank, make_track_block_fn

FS = 2.046e6
L = 2046


def test_track_fn_shared_for_identical_parameters():
    cfg = TrackingConfig()
    assert make_track_block_fn(cfg, L, FS, 8) is make_track_block_fn(cfg, L, FS, 8)


def test_track_fn_distinct_for_distinct_parameters():
    cfg = TrackingConfig()
    base = make_track_block_fn(cfg, L, FS, 8)
    assert make_track_block_fn(cfg, L, FS, 16) is not base
    assert (
        make_track_block_fn(dataclasses.replace(cfg, block_size_ms=200), L, FS, 8)
        is not base
    )
    # Farm variants key on the stream assignment.
    farm_a = make_track_block_fn(cfg, L, FS, 8, stream_of_channel=np.zeros(8, np.int32))
    farm_b = make_track_block_fn(cfg, L, FS, 8, stream_of_channel=np.arange(8, dtype=np.int32) % 2)
    assert farm_a is not base and farm_a is not farm_b
    assert farm_a is make_track_block_fn(cfg, L, FS, 8, stream_of_channel=np.zeros(8, np.int32))


def test_tracker_banks_share_program_but_not_state():
    cfg = TrackingConfig()
    b1 = TrackerBank(FS, L, cfg, n_channels=8)
    b2 = TrackerBank(FS, L, cfg, n_channels=8)
    assert b1._fn is b2._fn
    b1.assign(prn=7, doppler_hz=1000.0, code_phase_samples=10.0, carrier_phase_rad=0.5)
    assert b2.slot_prn == [None] * 8
    assert float(b2.state.doppler[0]) == 0.0


def test_acquisition_engine_shared_and_keyed_on_config():
    e1 = shared_acquisition_engine(FS, L, AcquisitionConfig())
    e2 = shared_acquisition_engine(FS, L, AcquisitionConfig())
    assert e1 is e2
    e3 = shared_acquisition_engine(FS, L, AcquisitionConfig(integration_period_ms=20))
    assert e3 is not e1
    # Engines are stateless across detect() calls, so sharing is safe; guard
    # against someone adding per-call mutable state without noticing.
    # Allowed exceptions: _aot_cache is a pure memo (samples geometry ->
    # compiled executable) fully determined by the engine's construction
    # parameters — the same parameters the sharing key covers — and
    # _aot_preload holds the in-flight deserialize threads feeding that
    # memo (any number of sharers may join the same thread).
    mutable = [
        k for k, v in vars(e1).items()
        if isinstance(v, (list, dict, set))
        and k not in ("_aot_cache", "_aot_preload")
    ]
    assert mutable == [], f"AcquisitionEngine grew mutable state {mutable}; sharing is no longer safe"

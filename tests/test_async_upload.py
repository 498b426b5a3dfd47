"""Async-upload read-ahead tests (TrackingConfig.async_upload): the
background device_put path must be bit-identical to the synchronous path,
and checkpoints must not count the undispatched read-ahead block."""

import numpy as np

from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
from gypsum_tpu.io.sources import ArraySampleSource
from gypsum_tpu.runtime.checkpoint import fast_forward, load_checkpoint, save_checkpoint
from gypsum_tpu.runtime.receiver import Receiver
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

FS = 2.046e6
L = 2046


def _capture(n_ms=4000, seed=6):
    bits = np.array([1, -1, 1, 1, -1, -1, 1, -1], dtype=np.int8)
    sat = SyntheticSatellite(prn=25, doppler_hz=800.0, delay_samples=300,
                            amplitude=0.25, nav_bits=bits)
    return synthesize_iq([sat], n_ms * L, FS, noise_sigma=0.5, seed=seed)


def _run(iq, async_upload, pipeline=True, max_seconds=None):
    cfg = ReceiverConfig(tracking=TrackingConfig(
        block_size_ms=500, async_upload=async_upload,
        pipeline_tracking=pipeline,
    ))
    recv = Receiver(ArraySampleSource(iq, FS), cfg)
    recv.run(max_seconds=max_seconds)
    return recv


def test_async_upload_is_bit_identical():
    iq = _capture()
    sync = _run(iq, async_upload=False)
    asyn = _run(iq, async_upload=True)
    assert len(sync.block_reports) == len(asyn.block_reports)
    for a, b in zip(sync.block_reports, asyn.block_reports):
        assert a.block_start == b.block_start
        assert a.tracked_prns == b.tracked_prns
        for oa, ob in zip(a.observations, b.observations):
            np.testing.assert_array_equal(oa.pseudosymbol_signs, ob.pseudosymbol_signs)
            np.testing.assert_array_equal(oa.code_phases, ob.code_phases)
            np.testing.assert_array_equal(oa.dopplers, ob.dopplers)


def test_max_seconds_counts_processed_not_readahead():
    iq = _capture()
    recv = _run(iq, async_upload=True, max_seconds=2.0)
    # 2.0 s at 500 ms blocks = 4 dispatched blocks; the read-ahead block
    # must not shrink the processed span.
    processed = sum(r.block_end - r.block_start for r in recv.block_reports)
    assert processed >= 2.0 - 1e-9


def test_checkpoint_excludes_readahead_block():
    iq = _capture(n_ms=5000)
    recv = _run(iq, async_upload=True, max_seconds=2.0)
    assert recv._readahead is not None  # a block was read ahead, undispatched
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/a.ckpt"
        save_checkpoint(recv, path)

        resumed = Receiver(
            ArraySampleSource(iq, FS),
            ReceiverConfig(tracking=TrackingConfig(block_size_ms=500, async_upload=True)),
        )
        stream_s = load_checkpoint(resumed, path)
        # The undispatched read-ahead was NOT counted as consumed.
        assert stream_s == recv.stream_position_s
        assert stream_s < recv.source.seconds_consumed
        fast_forward(resumed.source, stream_s)
        resumed.run()
        # The resumed receiver processes the remainder, including the block
        # the original had only read ahead: its first dispatched block is at
        # stream_s and it consumes through the end of the capture.
        starts = [r.block_start for r in resumed.block_reports]
        assert min(starts) == stream_s
        assert resumed.source.seconds_consumed >= 5.0 - 1e-9

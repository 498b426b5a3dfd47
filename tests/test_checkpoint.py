"""Checkpoint/resume tests: a resumed receiver continues decoding without
re-acquisition and reaches the same nav state as an uninterrupted run."""

import numpy as np
import pytest

from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
from gypsum_tpu.io.sources import ArraySampleSource
from gypsum_tpu.runtime.checkpoint import fast_forward, load_checkpoint, save_checkpoint
from gypsum_tpu.runtime.receiver import Receiver
from gypsum_tpu.signal.synth import SyntheticSatellite, nav_bit_schedule, synthesize_iq

FS = 2.046e6
L = 2046


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    bits = np.array([1, -1, 1, 1, -1, -1, 1, -1, 1, 1], dtype=np.int8)
    # Noise at a realistic level: a too-clean capture makes the strong SV's
    # C/A cross-correlations against *other* PRNs exceed the 3.0 detection
    # threshold (near-far false alarms; the reference detector behaves the
    # same way).
    sat = SyntheticSatellite(prn=25, doppler_hz=1100.0, delay_samples=500,
                             amplitude=0.25, nav_bits=bits)
    iq = synthesize_iq([sat], 6000 * L, FS, noise_sigma=0.55, seed=8)
    return iq, bits


def _config():
    return ReceiverConfig(tracking=TrackingConfig(block_size_ms=500))


def test_checkpoint_roundtrip_continues_tracking(capture, tmp_path):
    iq, bits = capture

    # Uninterrupted run: the truth to compare against.
    ref = Receiver(ArraySampleSource(iq, FS), _config())
    ref.run()
    ref_symbols = np.concatenate(
        [o.pseudosymbol_signs for r in ref.block_reports for o in r.observations]
    )

    # Run half, checkpoint, resume into a fresh receiver.
    first = Receiver(ArraySampleSource(iq, FS), _config())
    first.run(max_seconds=3.0)
    assert first.bank.tracked_prns == [25]
    ckpt = tmp_path / "recv.ckpt.gz"
    save_checkpoint(first, ckpt)

    source = ArraySampleSource(iq, FS)
    resumed = Receiver(source, _config())
    at = load_checkpoint(resumed, ckpt)
    assert at == pytest.approx(3.0)
    fast_forward(source, at)
    reports = resumed.run()

    # No re-acquisition happened: the channel survived the restart.
    assert all(not r.newly_acquired for r in reports)
    assert resumed.bank.tracked_prns == [25]

    # The resumed pseudosymbol stream matches the uninterrupted run's tail.
    resumed_symbols = np.concatenate(
        [o.pseudosymbol_signs for r in resumed.block_reports for o in r.observations]
    )
    np.testing.assert_array_equal(resumed_symbols, ref_symbols[3000:])

    # And the decoded-bit truth still holds after resume.
    truth = nav_bit_schedule(bits, 6000)
    agree = np.mean(resumed_symbols == truth[3000:])
    assert max(agree, 1 - agree) > 0.99


def test_checkpoint_preserves_world_model(capture, tmp_path):
    iq, _ = capture
    recv = Receiver(ArraySampleSource(iq, FS), _config())
    recv.run(max_seconds=2.0)
    recv.world.receiver_clock_slide = 1234.5  # sentinel
    ckpt = tmp_path / "w.ckpt.gz"
    save_checkpoint(recv, ckpt)

    fresh = Receiver(ArraySampleSource(iq, FS), _config())
    load_checkpoint(fresh, ckpt)
    assert fresh.world.receiver_clock_slide == 1234.5
    assert fresh.subframe_count == recv.subframe_count


def test_version_guard(capture, tmp_path):
    import gzip
    import pickle

    iq, _ = capture
    path = tmp_path / "bad.ckpt.gz"
    with gzip.open(path, "wb") as f:
        pickle.dump({"version": 999}, f)
    recv = Receiver(ArraySampleSource(iq, FS), _config())
    with pytest.raises(ValueError):
        load_checkpoint(recv, path)


def test_checkpoint_roundtrip_sbas_channel(tmp_path):
    """An SBAS channel (frame decoder state, GEO record) survives a
    checkpoint: the resumed receiver keeps decoding CRC-verified blocks
    without re-syncing, and the restore rejects receivers whose PRN family
    does not cover the checkpointed satellites."""
    from gypsum_tpu.nav.sbas import encode_mt9_data, encode_symbol_stream
    from tests.test_sbas import GEO

    rng = np.random.default_rng(12)
    msgs = []
    for k in range(7):
        if k % 3 == 0:
            msgs.append((9, encode_mt9_data(GEO)))
        else:
            msgs.append((63, rng.integers(0, 2, 212).astype(np.int8)))
    symbols = encode_symbol_stream(msgs)
    sat = SyntheticSatellite(prn=120, doppler_hz=-20.0, delay_samples=800,
                             amplitude=0.25, nav_bits=symbols, symbol_periods=2)
    iq = synthesize_iq([sat], 6500 * L, FS, noise_sigma=0.4, seed=13)

    first = Receiver(ArraySampleSource(iq, FS), _config(), eligible_prns=[120])
    first.run(max_seconds=3.5)
    n_before = sum(len(r.sbas_blocks) for r in first.block_reports)
    assert n_before >= 1, "no SBAS blocks before the checkpoint"
    ckpt = tmp_path / "sbas.ckpt"
    save_checkpoint(first, ckpt)

    resumed = Receiver(ArraySampleSource(iq, FS), _config(), eligible_prns=[120])
    stream_s = load_checkpoint(resumed, ckpt)
    fast_forward(resumed.source, stream_s)
    resumed.run()
    blocks = [b for r in resumed.block_reports for _, b in r.sbas_blocks]
    assert len(blocks) >= 2, "resumed receiver decoded no further SBAS blocks"
    # Edges stay on the 1 s cadence across the resume (no re-sync gap).
    edges = sorted(b.leading_edge_timestamp for b in blocks)
    deltas = np.diff(edges)
    np.testing.assert_allclose(deltas, np.round(deltas), atol=2e-3)

    # Family guard: a GPS-only receiver cannot restore an SBAS checkpoint.
    gps_only = Receiver(ArraySampleSource(iq, FS), _config())
    with pytest.raises(ValueError, match="family"):
        load_checkpoint(gps_only, ckpt)

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

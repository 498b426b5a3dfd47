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


def test_dual_band_checkpoint_roundtrip(tmp_path):
    """A GPS+GLONASS dual-band replay checkpoints both bands and the
    SHARED world once; a fresh DualBandReceiver resumes mid-stream with no
    re-acquisition and reaches the dual-constellation fix."""
    from gypsum_tpu.runtime.checkpoint import (
        load_dual_checkpoint,
        save_dual_checkpoint,
    )
    from gypsum_tpu.runtime.receiver import DualBandReceiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GLONASS_SAMPLE_RATE as GLO_FS,
        demo_constellation,
        demo_glonass_constellation,
        demo_receiver_ecef,
    )

    rx = demo_receiver_ecef()
    gps_iq, _ = synthesize_constellation(
        demo_constellation([25, 28, 31, 32]), rx, 21618.0, 24.0, FS,
        noise_sigma=0.3,
    )
    glo_iq, _ = synthesize_constellation(
        demo_glonass_constellation([-2, 0, 2]), rx, 21618.0, 24.0, GLO_FS,
        noise_sigma=0.25, glonass_time_offset_s=8e-7,
    )

    first = DualBandReceiver(
        ArraySampleSource(gps_iq, FS), ArraySampleSource(glo_iq, GLO_FS),
    )
    first.run(max_seconds=12.0)
    assert first.gps.bank.tracked_prns  # both bands mid-track
    assert first.glonass.bank.tracked_prns
    ckpt = tmp_path / "dual.ckpt.gz"
    save_dual_checkpoint(first, ckpt)

    gps_src = ArraySampleSource(gps_iq, FS)
    glo_src = ArraySampleSource(glo_iq, GLO_FS)
    resumed = DualBandReceiver(gps_src, glo_src)
    per_band = load_dual_checkpoint(resumed, ckpt)
    assert per_band == {"gps": pytest.approx(12.0), "glonass": pytest.approx(12.0)}
    # One world, re-tied everywhere.
    assert resumed.gps.world is resumed.world
    assert resumed.glonass.world is resumed.world
    fast_forward(gps_src, per_band["gps"])
    fast_forward(glo_src, per_band["glonass"])
    reports = resumed.run()

    # The checkpointed channels survived the restart: none was dropped or
    # re-acquired in either band (a fresh marginal acquisition of some
    # OTHER PRN — a noise peak grazing the threshold — is not a resume
    # defect and is allowed).
    carried = set(first.gps.bank.tracked_prns) | set(first.glonass.bank.tracked_prns)
    for band_reports in (reports, resumed.glonass.block_reports):
        for r in band_reports:
            assert not (carried & {a.prn for a in r.newly_acquired})
            assert not (carried & set(r.dropped_prns))
    fixes = [r.fix for r in reports if r.fix is not None]
    assert fixes, "no fix after dual-band resume"
    last = fixes[-1]
    assert np.linalg.norm(last.ecef - rx) < 8.0
    assert any(p >= 201 for p in last.satellites_used)
    assert any(p <= 32 for p in last.satellites_used)


def test_dual_checkpoint_rejected_by_single_loader(tmp_path):
    """Band/shape mismatches fail loudly, not half-restored."""
    from gypsum_tpu.runtime.checkpoint import (
        load_dual_checkpoint,
        save_dual_checkpoint,
    )
    from gypsum_tpu.runtime.receiver import DualBandReceiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GLONASS_SAMPLE_RATE as GLO_FS,
        demo_glonass_constellation,
        demo_receiver_ecef,
    )

    glo_iq, _ = synthesize_constellation(
        demo_glonass_constellation([0]), demo_receiver_ecef(), 21618.0, 2.0,
        GLO_FS, noise_sigma=0.3,
    )
    dual = DualBandReceiver(None, ArraySampleSource(glo_iq, GLO_FS))
    dual.run(max_seconds=1.0)
    ckpt = tmp_path / "glo.ckpt.gz"
    save_dual_checkpoint(dual, ckpt)

    single = Receiver(ArraySampleSource(glo_iq, GLO_FS), _config(), band="glonass")
    with pytest.raises(ValueError, match="dual-band checkpoint"):
        load_checkpoint(single, ckpt)
    # Band-set mismatch: a GPS+GLONASS receiver cannot restore a
    # GLONASS-only checkpoint.
    other = DualBandReceiver(
        ArraySampleSource(np.zeros(20460, np.complex64), FS),
        ArraySampleSource(glo_iq, GLO_FS),
    )
    with pytest.raises(ValueError, match="bands"):
        load_dual_checkpoint(other, ckpt)

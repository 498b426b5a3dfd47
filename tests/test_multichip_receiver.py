"""Multi-chip FULL-RECEIVER parity on the virtual 8-device mesh.

Round-4 VERDICT item 1: every multi-chip path was verified at the
kernel/block level (tests/test_parallel.py) but the integrated Receiver
loop — acquisition scheduling -> sharded tracking -> nav decode -> fix —
never ran over the mesh. Here the COMPLETE receiver replays the flagship
synthetic scene with its tracking bank in mesh mode
(track/loop.py:TrackerBank mesh=..., which routes every block through
parallel/sharded.py:make_sharded_track_block_fn), and the run is asserted
equivalent to the single-device replay at every level the reference's
integrated step loop produces (gypsum/receiver.py:85-137): acquisitions,
pseudosymbol streams, decoded subframes, and the position fix.
"""

import numpy as np
import pytest

from gypsum_tpu.core.config import ReceiverConfig
from gypsum_tpu.io.sources import ArraySampleSource
from gypsum_tpu.parallel.mesh import make_receiver_mesh
from gypsum_tpu.runtime.receiver import Receiver
from gypsum_tpu.signal.constellation import (
    ConstellationSatellite,
    synthesize_constellation,
)
from gypsum_tpu.solve.geodesy import lla_to_ecef
from tests.ephemeris_fixtures import TEST_EPHEMERIDES

FS = 2.046e6
TRUTH_LLA = (51.5, -0.1, 80.0)
GPS_T0 = 21600.0
PRNS = [25, 28, 31, 32]


@pytest.fixture(scope="module")
def scene():
    rx = lla_to_ecef(*TRUTH_LLA)
    sats = [
        ConstellationSatellite(prn=p, ephemeris=TEST_EPHEMERIDES[i], amplitude=0.22)
        for i, p in enumerate(PRNS)
    ]
    iq, truth = synthesize_constellation(
        sats, rx, gps_start_time_sow=GPS_T0, duration_s=23.0,
        sample_rate=FS, noise_sigma=0.35, subframe_pattern="123",
    )
    return rx, iq


@pytest.fixture(scope="module")
def both_receivers(scene):
    rx, iq = scene
    single = Receiver(ArraySampleSource(iq, FS), ReceiverConfig())
    single.run()
    # 12 channels over the ('sat'=4, 'time'=2) mesh: 3 channels per sat
    # shard, full fast path per device inside shard_map.
    sharded = Receiver(
        ArraySampleSource(iq, FS), ReceiverConfig(), mesh=make_receiver_mesh()
    )
    sharded.run()
    return rx, single, sharded


def _signs_by_prn(recv):
    out: dict[int, list[np.ndarray]] = {}
    for report in recv.block_reports:
        for obs in report.observations:
            out.setdefault(obs.prn, []).append(np.asarray(obs.pseudosymbol_signs))
    return {p: np.concatenate(v) for p, v in out.items()}


def test_sharded_receiver_uses_the_mesh(both_receivers):
    _, single, sharded = both_receivers
    assert sharded.bank.mesh is not None
    assert sharded.bank.mesh.shape == {"sat": 4, "time": 2}
    assert single.bank.mesh is None


def test_acquisition_parity(both_receivers):
    _, single, sharded = both_receivers
    a = [(h.prn, h.code_phase_samples) for h in single.block_reports[0].newly_acquired]
    b = [(h.prn, h.code_phase_samples) for h in sharded.block_reports[0].newly_acquired]
    assert a == b
    assert {p for p, _ in a} >= set(PRNS)


def test_pseudosymbol_stream_parity(both_receivers):
    """The device-side product (sign streams per PRN) must agree between the
    sharded and single-device replays. Exact float parity of the prompt is
    not required (the per-shard einsum may tile differently) — but sign
    flips can only happen at near-zero prompts during pull-in, so the
    streams must agree everywhere except a vanishing fraction."""
    _, single, sharded = both_receivers
    a, b = _signs_by_prn(single), _signs_by_prn(sharded)
    assert set(a) == set(b)
    for prn in PRNS:
        assert a[prn].shape == b[prn].shape
        agree = float(np.mean(a[prn] == b[prn]))
        assert agree > 0.999, f"PRN {prn}: sign agreement {agree:.4%}"


def test_subframe_decode_parity(both_receivers):
    _, single, sharded = both_receivers

    def stream(recv):
        return [
            (prn, ev.decoded.handover.tow_count, ev.decoded.handover.subframe_id)
            for report in recv.block_reports
            for prn, ev in report.subframes
        ]

    a, b = stream(single), stream(sharded)
    assert a == b and len(a) >= 3 * len(PRNS)


def test_fix_parity(both_receivers):
    rx, single, sharded = both_receivers
    fa = [r.fix for r in single.block_reports if r.fix is not None]
    fb = [r.fix for r in sharded.block_reports if r.fix is not None]
    assert fa and fb, "both replays must fix"
    assert len(fa) == len(fb)
    # Same epochs, essentially the same solutions; both within the e2e gate.
    for sa, sb in zip(fa, fb):
        assert sa.receiver_timestamp == sb.receiver_timestamp
        assert np.linalg.norm(sa.ecef - sb.ecef) < 1.0
        assert sorted(sa.satellites_used) == sorted(sb.satellites_used)
    assert np.linalg.norm(fb[-1].ecef - rx) < 100.0
    # The shared world-model time bases converged identically.
    assert single.world.receiver_clock_slide == pytest.approx(
        sharded.world.receiver_clock_slide, abs=1e-6
    )

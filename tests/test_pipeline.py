"""Depth-1 host/device pipeline (VERDICT round-1 item 3).

With TrackingConfig.pipeline_tracking the receiver dispatches block k and
processes block k-1's observations while k computes; the loop-filter carry
stays device-resident between dispatches. These tests pin that the
pipelined receiver produces the SAME navigation outcome as the synchronous
one (observations arrive one block later, but their timestamps — and hence
everything downstream — are identical), and that the drain/edit paths
(EOF, drop, checkpoint) stay consistent.
"""

from __future__ import annotations

import numpy as np
import pytest

from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
from gypsum_tpu.io.sources import ArraySampleSource
from gypsum_tpu.runtime.receiver import Receiver
from gypsum_tpu.signal.constellation import synthesize_constellation
from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
from gypsum_tpu.solve.geodesy import lla_to_ecef

FS = 2.046e6


@pytest.fixture(scope="module")
def capture():
    rx = lla_to_ecef(51.5, -0.1, 80.0)
    iq, _ = synthesize_constellation(
        demo_constellation([25, 28, 31, 32]), rx, DEMO_GPS_START_SOW, 26.0, FS,
        noise_sigma=0.3,
    )
    return rx, iq


def _run(capture_iq, pipelined: bool):
    cfg = ReceiverConfig(
        tracking=TrackingConfig(
            block_size_ms=500,
            use_pallas_block_tracker=False,
            use_matmul_tracker=False,
            pipeline_tracking=pipelined,
        )
    )
    recv = Receiver(ArraySampleSource(capture_iq, FS), cfg)
    recv.run()
    return recv


def test_pipelined_matches_synchronous_nav_outcome(capture):
    rx, iq = capture
    sync = _run(iq, False)
    pipe = _run(iq, True)

    # Same subframe stream (count and TOWs)...
    def tows(r):
        return [
            (prn, ev.decoded.handover.time_of_week_seconds)
            for rep in r.block_reports for prn, ev in rep.subframes
        ]

    assert tows(pipe) == tows(sync)
    # ...and the same final fix to within numerical noise.
    fs, fp = sync.world.position_fixes[-1], pipe.world.position_fixes[-1]
    assert np.linalg.norm(fs.ecef - fp.ecef) < 1.0
    assert np.linalg.norm(fp.ecef - rx) < 60.0
    # The pipeline drained: nothing left in flight.
    assert pipe.bank.pending_blocks == 0


def test_pipelined_observations_arrive_one_block_late(capture):
    _, iq = capture
    pipe = _run(iq[: int(3.0 * FS)], True)
    reports = pipe.block_reports
    # First report: dispatch only, nothing collected yet.
    assert reports[0].observations == []
    # Subsequent reports carry the PREVIOUS block's observations.
    assert reports[1].observations, "second step should deliver block 0"
    t0_obs = reports[1].observations[0].start_times[0]
    assert t0_obs < reports[1].block_start


def test_checkpoint_refuses_in_flight_blocks(tmp_path, capture):
    from gypsum_tpu.runtime.checkpoint import save_checkpoint

    _, iq = capture
    cfg = ReceiverConfig(
        tracking=TrackingConfig(
            block_size_ms=500, use_pallas_block_tracker=False,
            use_matmul_tracker=False, pipeline_tracking=True,
        )
    )
    recv = Receiver(ArraySampleSource(iq[: int(2.0 * FS)], FS), cfg)
    recv.step_block()  # leaves one block in flight
    assert recv.bank.pending_blocks == 1
    with pytest.raises(RuntimeError, match="in flight"):
        save_checkpoint(recv, tmp_path / "ck.gz")

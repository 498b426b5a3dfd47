"""Assisted-GNSS start (solve/world.py:assist_ephemerides/_assisted_bootstrap,
solve/snapshot.py:doppler_position_seed, CLI `replay --assist-nav`).

The reference must decode subframes 1-3 on four satellites (~18-30 s at
50 bps) before its first fix (gypsum/world_model.py:567-589). With assist
ephemerides the framework needs only the first handover word: a Doppler-only
position solve seeds the snapshot integer-millisecond resolution, and the
resulting fix geometry-seeds every channel's time base."""

from __future__ import annotations

import numpy as np

from gypsum_tpu.core.config import ReceiverConfig, SolverConfig
from gypsum_tpu.core.constants import (
    GPS_L1_FREQUENCY_HZ as F_L1,
    SPEED_OF_LIGHT_M_PER_S as C,
)
from gypsum_tpu.signal.scenarios import (
    DEMO_EPHEMERIDES,
    DEMO_GPS_START_SOW,
    DEMO_PRNS_8,
)
from gypsum_tpu.solve.geodesy import lla_to_ecef
from gypsum_tpu.solve.snapshot import doppler_position_seed, orbit_fn_from_ephemerides
from gypsum_tpu.solve.world import WorldModel

EPH = dict(zip(DEMO_PRNS_8, DEMO_EPHEMERIDES))
TRUTH = lla_to_ecef(51.5, -0.1, 80.0)


def _sv_state(prn: int, arrival_sow: float):
    """(position, velocity, clock corr, tau) at emission, light-time iterated."""
    ofn = orbit_fn_from_ephemerides(EPH)
    tau = 0.075
    for _ in range(3):
        pos, vel, dtsv = ofn(prn, arrival_sow - tau)
        tau = float(np.linalg.norm(pos - TRUTH)) / C
    return pos, vel, dtsv, tau


def test_doppler_position_seed_recovers_position():
    """Exact Dopplers -> meters; 1 Hz tracker noise -> ~1 km (well inside
    the snapshot solver's ~150 km basin)."""
    t = DEMO_GPS_START_SOW + 8.0
    ofn = orbit_fn_from_ephemerides(EPH)
    meas = []
    for p in DEMO_PRNS_8[:6]:
        pos, vel, _, _ = _sv_state(p, t)
        e = (pos - TRUTH) / np.linalg.norm(pos - TRUTH)
        meas.append((p, -F_L1 / C * float(e @ vel) + 3.7))  # +3.7 Hz LO bias

    seed = doppler_position_seed(meas, ofn, t)
    assert np.linalg.norm(seed - TRUTH) < 50.0

    rng = np.random.default_rng(0)
    noisy = [(p, fd + rng.normal(0.0, 1.0)) for p, fd in meas]
    seed_n = doppler_position_seed(noisy, ofn, t)
    assert np.linalg.norm(seed_n - TRUTH) < 10e3

    assert doppler_position_seed(meas[:3], ofn, t) is None  # underdetermined


def test_assisted_bootstrap_fixes_without_decoded_time_bases():
    """A world model with assist ephemerides, a clock slide (one HOW) and
    five tracked channels' sub-ms code phases + Dopplers — but NO decoded
    per-SV time bases — must produce a position fix in one call."""
    world = WorldModel(SolverConfig(
        # The synthetic measurements below are geometric-only.
        apply_tropo_correction=False, apply_iono_correction=False,
    ))
    assert world.assist_ephemerides(EPH) == len(EPH)
    # Injecting again is a no-op (decoded/assisted orbits are kept).
    assert world.assist_ephemerides(EPH) == 0

    world.receiver_clock_slide = DEMO_GPS_START_SOW
    ts = 8.0
    arrival = DEMO_GPS_START_SOW + ts
    prns = DEMO_PRNS_8[:5]
    for p in prns:
        pos, vel, dtsv, tau = _sv_state(p, arrival)
        e = (pos - TRUTH) / np.linalg.norm(pos - TRUTH)
        frac = (tau - dtsv) % 1e-3  # sub-ms pseudo-transit, zero clock bias
        world.handle_prn_observed(
            p, frac, count=1, doppler_hz=-F_L1 / C * float(e @ vel)
        )
    assert world._fix_ready_satellites() == []

    fix = world.attempt_position_fix(ts)
    assert fix is not None
    # The bootstrap's snapshot fix is recorded first, then the seeded time
    # bases feed the ordinary least-squares solve in the SAME call.
    assert world.position_fixes[0].kind == "snapshot"
    assert fix.kind == "lsq"
    assert np.linalg.norm(fix.ecef - TRUTH) < 20.0
    assert sorted(fix.satellites_used) == sorted(prns)
    # Time bases are now anchored: the next call takes the normal path.
    assert len(world._fix_ready_satellites()) == len(prns)


def test_assisted_replay_first_fix_beats_full_decode():
    """End to end over synthesized IQ with BOTH assistance tiers.

    Tier 1 (orbits + coarse time, the classic A-GPS cold start): snapshot
    fixes are published within the first few tracking blocks — before a
    single navigation bit is decoded — and the deliberately-wrong assist
    time (+7.5 s) is solved away by the 5-state coarse-time LS.

    Tier 2 (first handover word, ~12-13 s on this scene): the exact clock
    slide replaces the coarse origin and the ordinary least-squares fix
    takes over within two blocks — far ahead of the unassisted receiver's
    full 4-SV subframe-1-3 decode (~19-20 s here)."""
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.obs.rinex import parse_nav, render_nav
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import demo_constellation

    fs = 2.046e6
    prns = DEMO_PRNS_8[:6]  # the coarse-time state needs a 5th satellite
    sats = demo_constellation(prns)
    iq, _ = synthesize_constellation(
        sats, TRUTH, DEMO_GPS_START_SOW, 14.0, fs, noise_sigma=0.25,
    )

    # Assist file: the RINEX NAV round trip is part of the path under test.
    eph = parse_nav(render_nav({p: EPH[p] for p in prns}))
    recv = Receiver(ArraySampleSource(iq, fs), ReceiverConfig(),
                    eligible_prns=prns)
    assert recv.world.assist_ephemerides(eph) == len(prns)
    recv.world.assist_time(DEMO_GPS_START_SOW + 7.5)  # network-grade time
    reports = recv.run(max_seconds=14.0)

    fixes = [r.fix for r in reports if r.fix is not None]
    assert fixes, "no fix at all"
    # Tier 1: a coarse snapshot fix within the first few blocks.
    first = fixes[0]
    assert first.kind == "snapshot"
    assert first.receiver_timestamp < 5.0, (
        f"first coarse fix at {first.receiver_timestamp:.1f} s"
    )
    err0 = np.linalg.norm(first.ecef - TRUTH)
    assert err0 < 150.0, f"coarse fix off by {err0:.1f} m"
    # The +7.5 s injected time error was estimated away.
    assert abs(recv.world.assist_time_origin_sow - DEMO_GPS_START_SOW) < 0.5

    # Tier 2: the precise path takes over soon after the first subframe.
    first_subframe_t = min(
        r.observations[0].start_times[0]
        for r in reports if r.subframes
    )
    lsq = [f for f in fixes if f.kind == "lsq"]
    assert lsq, "no precise fix after the first subframe"
    assert lsq[0].receiver_timestamp - first_subframe_t < 2.5
    err1 = np.linalg.norm(lsq[-1].ecef - TRUTH)
    assert err1 < 10.0, f"precise assisted fix off by {err1:.1f} m"


def test_glonass_assisted_start_fixes_after_first_string():
    """Injected GLONASS state-vector ephemerides (RINEX R records through
    the actual render/parse round trip) let channels range after their
    FIRST string — the 2 s time anchor needs only string 1's tk — where
    the cold receiver waits ~8 s for the full strings-1..4 frame. The
    assisted first fix must come several seconds earlier than the cold
    one on the same capture."""
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.obs.rinex import parse_nav_glonass, render_nav_glonass
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GLONASS_SAMPLE_RATE as GLO_FS,
        demo_glonass_constellation,
        demo_receiver_ecef,
    )

    rx = demo_receiver_ecef()
    sats = demo_glonass_constellation([-2, -1, 1, 2])
    iq, _ = synthesize_constellation(
        sats, rx, 21618.0, 11.0, GLO_FS, noise_sigma=0.25,
    )

    cold = Receiver(ArraySampleSource(iq, GLO_FS), ReceiverConfig(), band="glonass")
    cold_reports = cold.run(until_fix=True)
    cold_first = next(r for r in cold_reports if r.fix is not None)
    assert cold_first.block_end >= 8.0  # frame assembly gates the cold start

    warm = Receiver(ArraySampleSource(iq, GLO_FS), ReceiverConfig(), band="glonass")
    text = render_nav_glonass({s.prn: s.ephemeris for s in sats})
    n = warm.world.assist_glonass_ephemerides(parse_nav_glonass(text))
    assert n == len(sats)
    warm_reports = warm.run(until_fix=True)
    warm_first = next(r for r in warm_reports if r.fix is not None)
    assert warm_first.block_end <= cold_first.block_end - 2.0, (
        f"assisted fix at {warm_first.block_end:.1f} s vs cold "
        f"{cold_first.block_end:.1f} s"
    )
    assert np.linalg.norm(warm_first.fix.ecef - rx) < 30.0

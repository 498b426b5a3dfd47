"""Spoofing monitors (solve/spoofing.py): vestigial second peaks, clock
innovation, position jumps, C/N0 steps — and a full meaconing drag-off e2e.

The reference will happily track whatever is strongest; ground truth here is
an injected second transmitter (a delayed, amplified replay of the authentic
scene — classic meaconing)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gypsum_tpu.core.config import SpoofingConfig
from gypsum_tpu.solve.spoofing import SpoofingMonitor, vestigial_peak

FS = 2.046e6
L = 2046


def test_vestigial_peak_detects_second_transmitter():
    from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

    auth = SyntheticSatellite(prn=25, doppler_hz=1200.0, delay_samples=700, amplitude=0.8)
    spoof = SyntheticSatellite(prn=25, doppler_hz=1350.0, delay_samples=1460, amplitude=1.2)

    # Authentic alone: whatever clears the floor outside the tracked peak
    # (the code's own -24 dB correlation sidelobes do, on a strong signal)
    # must stay far below the tracked peak itself — the ratio gate.
    iq1 = synthesize_iq([auth], 10 * L, FS, noise_sigma=0.3, seed=5).reshape(10, L)
    s1, _, _, r1 = vestigial_peak(iq1, 25, FS, 700.0, 1200.0)
    assert r1 < 0.2, f"authentic-only ratio {r1:.2f} (strength {s1:.1f})"

    # Both on air: the second transmitter stands out at its code phase AND
    # rivals the tracked peak.
    iq2 = synthesize_iq([auth, spoof], 10 * L, FS, noise_sigma=0.3, seed=5).reshape(10, L)
    s2, cp2, doff, r2 = vestigial_peak(iq2, 25, FS, 700.0, 1200.0)
    assert s2 > 4.0 and r2 > 0.5, f"spoofer not seen ({s2:.1f}, ratio {r2:.2f})"
    assert abs(cp2 - 1460) < 3, cp2
    assert abs((1200.0 + doff) - 1350.0) <= 200.0


@dataclass
class _Rec:
    cn0_dbhz: float | None = None


@dataclass
class _Obs:
    prn: int


@dataclass
class _Fix:
    ecef: np.ndarray
    receiver_timestamp: float
    kind: str = "lsq"


@dataclass
class _World:
    _sats: dict = field(default_factory=dict)
    receiver_clock_slide: float | None = None


@dataclass
class _Report:
    block_end: float
    observations: list = field(default_factory=list)
    fix: object = None


def test_cn0_step_monitor():
    mon = SpoofingMonitor(SpoofingConfig(cn0_jump_db=6.0, cn0_jump_blocks=2))
    world = _World({25: _Rec(cn0_dbhz=45.0)})
    for t in range(10):  # settle the EMA
        mon.observe_block(world, _Report(float(t), [_Obs(25)]))
    assert not mon.alerts
    world._sats[25].cn0_dbhz = 53.0  # +8 dB capture step
    a1 = mon.observe_block(world, _Report(10.0, [_Obs(25)]))
    a2 = mon.observe_block(world, _Report(11.0, [_Obs(25)]))
    assert not a1 and len(a2) == 1 and a2[0].kind == "cn0" and a2[0].prn == 25
    # Sustained: no repeat alert every block.
    assert not mon.observe_block(world, _Report(12.0, [_Obs(25)]))


def test_clock_and_position_monitors():
    mon = SpoofingMonitor(SpoofingConfig())
    world = _World()
    pos = np.array([3980000.0, -7000.0, 4970000.0])
    # 20 quiet blocks: steady 1e-9 s/s drift, ~0.5 m fix scatter.
    rng = np.random.default_rng(2)
    for t in range(20):
        world.receiver_clock_slide = 21600.0 + 1e-9 * t
        fix = _Fix(pos + rng.normal(0, 0.5, 3), float(t))
        assert not mon.observe_block(world, _Report(float(t), [], fix))
    # Spoofer pulls time by 2 us and position by 400 m.
    world.receiver_clock_slide = 21600.0 + 1e-9 * 20 + 2e-6
    fix = _Fix(pos + np.array([400.0, 0.0, 0.0]), 20.0)
    alerts = mon.observe_block(world, _Report(20.0, [], fix))
    kinds = {a.kind for a in alerts}
    assert "clock" in kinds and "position" in kinds, alerts


def test_meaconing_dragoff_detected_e2e():
    """A meacon replays the whole authentic scene 0.37 ms late at 1.7x gain
    from t = 12 s. Before onset: zero alerts (false-alarm freedom on a
    clean 12 s). After onset: vestigial second-peak alerts on several PRNs
    within two scan periods."""
    from gypsum_tpu.core.config import ReceiverConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        DEMO_PRNS_8,
        demo_constellation,
    )
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    fs = 2.046e6
    prns = DEMO_PRNS_8[:5]
    truth = lla_to_ecef(51.5, -0.1, 80.0)
    iq, _ = synthesize_constellation(
        demo_constellation(prns), truth, DEMO_GPS_START_SOW, 26.0, fs,
        noise_sigma=0.25,
    )
    delay = int(round(0.37e-3 * fs))  # ~378 chips: far outside the exclusion
    spoof = np.concatenate([np.zeros(delay, np.complex64), iq[:-delay]])
    t_on = 12.0
    n_on = int(t_on * fs)
    spoof[:n_on] = 0.0
    composite = (iq + 1.7 * spoof).astype(np.complex64)

    recv = Receiver(ArraySampleSource(composite, fs), ReceiverConfig(),
                    eligible_prns=prns)
    recv.run(max_seconds=22.0)

    mon = recv.spoofing
    assert mon is not None
    early = [a for a in mon.alerts if a.t < t_on]
    assert not early, f"false alarms before spoofer onset: {early}"
    vest = [a for a in mon.alerts if a.kind == "vestigial" and a.t >= t_on]
    assert vest, "meacon never detected"
    assert min(a.t for a in vest) < t_on + 2 * recv.config.spoofing.scan_period_s + 1.5
    assert len({a.prn for a in vest}) >= 3, vest

"""TDCP velocity (solve/velocity.py:solve_tdcp + the receiver's per-block
phase-advance plumbing): mm/s-class velocity from the NCO's own cycle count.

The reference has no velocity solve at all; this framework's Doppler solve
(~0.1 m/s) remains the fallback."""

from __future__ import annotations

import numpy as np

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
from gypsum_tpu.solve.snapshot import orbit_fn_from_ephemerides
from gypsum_tpu.solve.velocity import WAVELENGTH_M, solve_tdcp

EPH = dict(zip(DEMO_PRNS_8, DEMO_EPHEMERIDES))


def test_solve_tdcp_recovers_displacement():
    """Model-generated phase deltas (NCO convention: cycles = -f tau) with
    millicycle noise must recover the displacement to millimeters and the
    velocity to mm/s."""
    ofn = orbit_fn_from_ephemerides(EPH)
    prns = DEMO_PRNS_8[:6]
    x0 = lla_to_ecef(51.5, -0.1, 80.0)
    dt = 1.0
    v_true = np.array([1.25, -0.40, 0.10])
    db_true = 3e-9  # receiver clock drift s/s
    x1 = x0 + v_true * dt
    t1 = DEMO_GPS_START_SOW + 20.0
    rng = np.random.default_rng(4)

    pos0 = np.empty((len(prns), 3))
    pos1 = np.empty_like(pos0)
    dclk = np.empty(len(prns))
    dphi = np.empty(len(prns))
    for i, p in enumerate(prns):
        p1, _, c1 = ofn(p, t1)
        p0, _, c0 = ofn(p, t1 - dt)
        pos0[i], pos1[i] = p0, p1
        dclk[i] = c1 - c0
        d_range = np.linalg.norm(p1 - x1) - np.linalg.norm(p0 - x0)
        # -lambda dphi + c dclk = d_range + c*db*dt  (solve_tdcp docstring)
        dphi[i] = (C * dclk[i] - d_range - C * db_true * dt) / WAVELENGTH_M
        dphi[i] += rng.normal(0.0, 2e-3)  # millicycle NCO noise

    v, drift = solve_tdcp(pos0, pos1, dclk, x1, dphi, dt)
    assert np.linalg.norm(v - v_true) < 5e-3, v - v_true
    assert abs(drift - db_true) < 2e-11


def test_moving_receiver_tdcp_velocity_e2e():
    """End to end: the published velocity now comes from TDCP and must match
    the true velocity ~100x tighter than the Doppler solve's 1.5 m/s
    tolerance; with the knob off the Doppler fallback still works."""
    from gypsum_tpu.core.config import ReceiverConfig, SolverConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import demo_constellation

    rx0 = lla_to_ecef(51.5, -0.1, 80.0)
    v_true = np.array([25.0, -15.0, 8.0])
    iq, _ = synthesize_constellation(
        demo_constellation(), rx0, DEMO_GPS_START_SOW, 26.0, 2.046e6,
        noise_sigma=0.3, receiver_velocity_ecef=v_true,
    )
    recv = Receiver(ArraySampleSource(iq, 2.046e6))
    recv.run(until_fix=True)
    fix = recv.world.position_fixes[-1]
    assert fix.velocity_ecef_mps is not None
    err = np.linalg.norm(fix.velocity_ecef_mps - v_true)
    assert err < 0.02, f"TDCP velocity off by {err*1000:.1f} mm/s"

    # Doppler fallback (knob off) still recovers the velocity, coarsely.
    recv2 = Receiver(
        ArraySampleSource(iq, 2.046e6),
        ReceiverConfig(solver=SolverConfig(tdcp_velocity=False)),
    )
    recv2.run(until_fix=True)
    fix2 = recv2.world.position_fixes[-1]
    err2 = np.linalg.norm(fix2.velocity_ecef_mps - v_true)
    assert err2 < 1.5
    assert err < err2, "TDCP should beat the instantaneous-Doppler solve"

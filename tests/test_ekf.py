"""Navigation EKF (solve/ekf.py): convergence, outage coasting, gating.

The filter's purpose is the capability the reference receiver lacks
entirely (gypsum/world_model.py:567-589 goes dark below four satellites):
carrying the navigation solution through a partial constellation outage.
Unit tests drive the filter directly on synthetic geometry; the end-to-end
test masks two of five satellites mid-capture and requires the receiver to
keep publishing (EKF-kind) fixes from the remaining three.
"""

import numpy as np
import pytest

from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ, SPEED_OF_LIGHT_M_PER_S as C
from gypsum_tpu.solve.ekf import NavigationEKF, WAVELENGTH_M
from gypsum_tpu.solve.geodesy import lla_to_ecef

RX = lla_to_ecef(51.5, -0.1, 80.0)


def _enu_basis(p):
    up = p / np.linalg.norm(p)
    east = np.cross([0.0, 0.0, 1.0], up)
    east /= np.linalg.norm(east)
    north = np.cross(up, east)
    return east, north, up


def _scene(n=6, range_m=22e6):
    """n satellites spread over the sky, with tangential orbital velocities."""
    east, north, up = _enu_basis(RX)
    sats, vels = [], []
    for i in range(n):
        az = 2 * np.pi * i / n
        el = np.deg2rad(35.0 + 40.0 * ((i * 37) % n) / n)
        d = np.cos(el) * (np.cos(az) * north + np.sin(az) * east) + np.sin(el) * up
        sats.append(RX + range_m * d)
        t = np.cross(d, east if abs(d @ east) < 0.9 else north)
        vels.append(3000.0 * t / np.linalg.norm(t))
    return np.array(sats), np.array(vels)


def _measure(sat_pos, sat_vel, p, v, cb_m, cd_mps, rng, pr_sigma=2.0, rr_sigma=0.1):
    los = sat_pos - p[None, :]
    rho = np.linalg.norm(los, axis=1)
    e = los / rho[:, None]
    pr = rho + cb_m + rng.normal(0.0, pr_sigma, len(rho))
    rho_dot = np.einsum("ij,ij->i", e, sat_vel - v[None, :])
    # f = -(rho_dot + cd) / lambda  =>  z_rr = -lambda f = rho_dot + cd.
    dopp = -(rho_dot + cd_mps + rng.normal(0.0, rr_sigma, len(rho))) / WAVELENGTH_M
    return pr, dopp


def _run_epochs(ekf, sat_pos, sat_vel, n_epochs, dt, rng, t0=0.0, cb0=5.0, cd=0.3):
    t = t0
    for k in range(n_epochs):
        t = t0 + (k + 1) * dt
        cb = cb0 + cd * t
        pr, dopp = _measure(sat_pos, sat_vel, RX, np.zeros(3), cb, cd, rng)
        ekf.predict(t)
        ekf.update(sat_pos, pseudoranges_m=pr)
        ekf.update(sat_pos, sat_velocities=sat_vel, dopplers_hz=dopp)
    return t


def test_converges_on_full_constellation():
    sat_pos, sat_vel = _scene()
    rng = np.random.default_rng(7)
    ekf = NavigationEKF()
    # Seed 30 m off with wrong clock states: must pull in.
    ekf.initialize(0.0, RX + np.array([20.0, -15.0, 12.0]), clock_bias_m=0.0)
    _run_epochs(ekf, sat_pos, sat_vel, n_epochs=40, dt=0.5, rng=rng)
    assert np.linalg.norm(ekf.position - RX) < 3.0
    assert np.linalg.norm(ekf.velocity) < 0.3
    # Clock drift is observable through the Doppler rows (it separates from
    # the vertical velocity component only as slowly as the sky geometry
    # allows, so the tolerance is looser than the per-row noise).
    assert abs(ekf.x[7] - 0.3) < 0.2
    assert ekf.position_sigma_m < 5.0


@pytest.mark.parametrize("n_keep,bound_m", [(3, 15.0), (2, 60.0)])
def test_coasts_through_partial_outage(n_keep, bound_m):
    """After convergence, drop to n_keep satellites for 20 s: the position
    must stay bounded (the remaining rows keep constraining the state) and
    the reported uncertainty must grow honestly."""
    sat_pos, sat_vel = _scene()
    rng = np.random.default_rng(11)
    ekf = NavigationEKF()
    ekf.initialize(0.0, RX)
    t = _run_epochs(ekf, sat_pos, sat_vel, n_epochs=40, dt=0.5, rng=rng)
    sigma_full = ekf.position_sigma_m

    keep = slice(0, n_keep)
    for k in range(40):
        tk = t + (k + 1) * 0.5
        cb = 5.0 + 0.3 * tk
        pr, dopp = _measure(sat_pos[keep], sat_vel[keep], RX, np.zeros(3), cb, 0.3, rng)
        ekf.predict(tk)
        ekf.update(sat_pos[keep], pseudoranges_m=pr)
        ekf.update(sat_pos[keep], sat_velocities=sat_vel[keep], dopplers_hz=dopp)
    assert np.linalg.norm(ekf.position - RX) < bound_m, (
        f"coast error {np.linalg.norm(ekf.position - RX):.1f} m with {n_keep} SVs"
    )
    assert ekf.position_sigma_m > sigma_full  # uncertainty must admit the outage


def test_tracks_moving_receiver_through_outage():
    """A receiver moving at a constant 15 m/s: the filter must learn the
    velocity from full epochs, then carry the trajectory through a 10 s
    3-satellite outage (constant-velocity process model does the bridging —
    this is the scenario where a static-position fallback would diverge at
    150 m)."""
    sat_pos, sat_vel = _scene()
    east, north, _up = _enu_basis(RX)
    v_rx = 15.0 * (0.8 * east + 0.6 * north)
    rng = np.random.default_rng(5)
    ekf = NavigationEKF()
    ekf.initialize(0.0, RX)

    def epoch(t, keep=slice(None)):
        p = RX + v_rx * t
        cb = 5.0 + 0.3 * t
        pr, dopp = _measure(sat_pos[keep], sat_vel[keep], p, v_rx, cb, 0.3, rng)
        ekf.predict(t)
        ekf.update(sat_pos[keep], pseudoranges_m=pr)
        ekf.update(sat_pos[keep], sat_velocities=sat_vel[keep], dopplers_hz=dopp)
        return p

    t = 0.0
    for k in range(60):
        t = (k + 1) * 0.5
        truth = epoch(t)
    assert np.linalg.norm(ekf.velocity - v_rx) < 0.5
    for k in range(20):  # 10 s on three satellites
        t += 0.5
        truth = epoch(t, keep=slice(0, 3))
    assert np.linalg.norm(ekf.position - truth) < 25.0
    assert np.linalg.norm(ekf.velocity - v_rx) < 2.0


def test_ekf_state_survives_checkpoint_pickle():
    """The world model pickles its EKF with the checkpoint
    (runtime/checkpoint.py, CHECKPOINT_VERSION 3): a coast-capable state
    must survive the round trip."""
    import pickle

    from gypsum_tpu.solve.world import WorldModel

    world = WorldModel()
    world._ekf.initialize(12.5, RX, velocity_ecef=np.array([1.0, 2.0, 3.0]),
                          clock_bias_m=4.0, clock_drift_mps=0.5)
    clone = pickle.loads(pickle.dumps(world))
    assert clone._ekf.initialized
    assert clone._ekf.t == 12.5
    np.testing.assert_array_equal(clone._ekf.x, world._ekf.x)
    np.testing.assert_array_equal(clone._ekf.P, world._ekf.P)


def test_innovation_gate_rejects_gross_outlier():
    """A 1 ms (300 km) pseudorange slip must be gated out, not swallowed."""
    sat_pos, sat_vel = _scene()
    rng = np.random.default_rng(3)
    ekf = NavigationEKF()
    ekf.initialize(0.0, RX)
    t = _run_epochs(ekf, sat_pos, sat_vel, n_epochs=20, dt=0.5, rng=rng)
    p_before = ekf.position.copy()
    pr, _ = _measure(sat_pos, sat_vel, RX, np.zeros(3), 5.0 + 0.3 * (t + 0.5), 0.3, rng)
    pr[2] += C * 1e-3  # one satellite slips a whole millisecond
    ekf.predict(t + 0.5)
    stats = ekf.update(sat_pos, pseudoranges_m=pr)
    assert stats.n_pr_rejected == 1
    assert stats.n_pr_used == len(pr) - 1
    assert np.linalg.norm(ekf.position - p_before) < 5.0


def test_sigma_grows_without_measurements():
    ekf = NavigationEKF()
    ekf.initialize(0.0, RX)
    sigmas = []
    for k in range(10):
        ekf.predict((k + 1) * 1.0)
        sigmas.append(ekf.position_sigma_m)
    assert all(b > a for a, b in zip(sigmas, sigmas[1:]))
    assert np.linalg.norm(ekf.position - RX) < 1e-6  # static prediction


def test_receiver_coasts_through_satellite_outage():
    """End to end: five satellites, two masked off at t=22 s (after the
    least-squares fix stream is established). The watchdog drops the dead
    channels, the fix-ready count falls to three, and the navigation EKF
    must keep publishing coast fixes — within tens of meters — where
    round-1 (and the reference) simply went dark."""
    from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation

    fs = 2.046e6
    outage_s = 22.0
    sats = demo_constellation([25, 28, 31, 32, 3])
    for s in sats[3:]:  # two of five vanish mid-capture
        s.visible_until_s = outage_s
    iq, _ = synthesize_constellation(
        sats, RX, DEMO_GPS_START_SOW, 34.0, fs, noise_sigma=0.35,
    )
    cfg = ReceiverConfig(
        tracking=TrackingConfig(
            watchdog_warmup_ms=1500, quality_drop_threshold=0.25,
        ),
    )
    recv = Receiver(ArraySampleSource(iq, fs), cfg)
    recv.run()

    fixes = recv.world.position_fixes
    lsq = [f for f in fixes if f.kind == "lsq"]
    coast = [f for f in fixes if f.kind == "ekf"]
    assert lsq, "no least-squares fixes before the outage"
    assert coast, "EKF published no coast fixes after the outage"
    # Coast fixes only exist after the outage, on the surviving satellites.
    assert min(f.receiver_timestamp for f in coast) > outage_s
    assert all(len(f.satellites_used) < 4 for f in coast)
    last = coast[-1]
    assert last.receiver_timestamp > 30.0, "coasting stopped early"
    err = float(np.linalg.norm(last.ecef - RX))
    assert err < 50.0, f"coast position error {err:.1f} m"

"""GLONASS receiver end-to-end: GLONASS-only and dual-constellation fixes."""

import numpy as np
import pytest

from gypsum_tpu.core.config import ReceiverConfig
from gypsum_tpu.io.sources import ArraySampleSource
from gypsum_tpu.runtime.receiver import DualBandReceiver, Receiver
from gypsum_tpu.signal.constellation import synthesize_constellation
from gypsum_tpu.signal.scenarios import (
    DEMO_GLONASS_SAMPLE_RATE as GLO_FS,
    demo_constellation,
    demo_glonass_constellation,
    demo_receiver_ecef,
)

GPS_FS = 2.046e6
# Scene start chosen so a GLONASS frame boundary lands at t=0 (GPS SOW
# 21618 -> GLONASS day time 32400 = a 30 s multiple): strings 1-4 arrive in
# the first 8 s and the first GLONASS fix lands ~t=9 s.
START_SOW = 21618.0
RX = demo_receiver_ecef()
GLO_OFFSET_S = 8e-7  # injected inter-system time offset (unknown to receiver)


def test_glonass_only_receiver_fixes():
    sats = demo_glonass_constellation([-2, -1, 0, 1, 2])
    iq, truth = synthesize_constellation(
        sats, RX, START_SOW, 13.0, GLO_FS, noise_sigma=0.25,
        glonass_time_offset_s=GLO_OFFSET_S,
    )
    recv = Receiver(ArraySampleSource(iq, GLO_FS), ReceiverConfig(), band="glonass")
    reports = recv.run()
    fixes = [r.fix for r in reports if r.fix is not None]
    assert fixes, "no GLONASS-only fix"
    first = next(r for r in reports if r.fix is not None)
    assert first.block_end <= 11.0, "first GLONASS fix too late"
    for fix in fixes:
        assert np.linalg.norm(fix.ecef - RX) < 15.0
        assert len(fix.satellites_used) >= 4
        assert all(201 <= p <= 214 for p in fix.satellites_used)
    # Strings decoded and ephemerides assembled for every channel.
    n_strings = sum(len(r.glonass_strings) for r in reports)
    assert n_strings >= 4 * len(sats)
    assert np.linalg.norm(fixes[-1].ecef - RX) < 5.0
    # Velocity solve (Doppler fallback with GLONASS wavelengths): static.
    assert fixes[-1].velocity_ecef_mps is not None
    assert np.linalg.norm(fixes[-1].velocity_ecef_mps) < 0.5


def test_dual_band_fix_recovers_inter_system_bias():
    """4 GPS + 3 GLONASS through two front ends into one world model: the
    5-unknown solve must localize AND estimate the injected GPS-GLONASS
    time offset (the estimate's constant ~120 ns residual is the cross-rate
    half-sample group-delay convention — exactly the kind of receiver
    inter-channel bias the ISB state exists to absorb)."""
    gps_iq, _ = synthesize_constellation(
        demo_constellation([25, 28, 31, 32]), RX, START_SOW, 24.0, GPS_FS,
        noise_sigma=0.3,
    )
    glo_iq, _ = synthesize_constellation(
        demo_glonass_constellation([-2, 0, 2]), RX, START_SOW, 24.0, GLO_FS,
        noise_sigma=0.25, glonass_time_offset_s=GLO_OFFSET_S,
    )
    recv = DualBandReceiver(
        ArraySampleSource(gps_iq, GPS_FS), ArraySampleSource(glo_iq, GLO_FS),
    )
    reports = recv.run()
    fixes = [r.fix for r in reports if r.fix is not None]
    assert fixes, "no dual-band fix"
    last = fixes[-1]
    assert np.linalg.norm(last.ecef - RX) < 5.0
    gps_used = [p for p in last.satellites_used if p <= 32]
    glo_used = [p for p in last.satellites_used if p >= 201]
    assert len(gps_used) == 4 and len(glo_used) == 3
    # ISB = b_glonass - b_gps = -(injected offset) + the constant
    # convention bias; must be stable and in the right neighborhood.
    isbs = [f.inter_system_bias_s for f in fixes if f.inter_system_bias_s is not None]
    assert isbs, "no dual-constellation solve ran"
    assert abs(isbs[-1] + GLO_OFFSET_S) < 250e-9
    assert np.std(isbs[-3:]) < 20e-9  # converged, not wandering
    # No spoofing false alarms on the clean dual-band scene.
    assert not any(r.spoofing_alerts for r in reports)


def test_glonass_band_rejects_gps_ids():
    iq = np.zeros(int(GLO_FS * 0.01), dtype=np.complex64)
    with pytest.raises(ValueError, match="201"):
        Receiver(
            ArraySampleSource(iq, GLO_FS), ReceiverConfig(),
            eligible_prns=[25], band="glonass",
        )
    with pytest.raises(ValueError, match="band"):
        Receiver(ArraySampleSource(iq, GLO_FS), ReceiverConfig(), band="galileo")


def test_glonass_world_state_checkpoint_roundtrip(tmp_path):
    """GLONASS records (state-vector ephemeris, frame context, inter-system
    bias) survive the checkpoint pickle; a restored receiver reproduces the
    same satellite positions."""
    import pickle

    from gypsum_tpu.nav.glonass import GlonassStringEvent
    from gypsum_tpu.solve.glonass import strings_from_glonass_ephemeris
    from gypsum_tpu.solve.world import WorldModel

    eph = demo_glonass_constellation([1])[0].ephemeris
    strings = strings_from_glonass_ephemeris(eph)
    world = WorldModel()
    world.glonass_bias_s = -9.1e-7
    prn = 209  # k = +1
    t = 10.0
    for m in (1, 2, 3, 4):
        s = strings[m]
        if m == 1:
            from gypsum_tpu.nav.glonass import GlonassString

            s = GlonassString(m=1, fields={
                **s.fields, "tk_raw": GlonassString.tk_raw_from_seconds(32400.0),
            })
        world.handle_glonass_string(
            prn, GlonassStringEvent(s, t + 2.0 * m, 0), frequency_number=1
        )
    rec = world._sats[prn]
    assert rec.glonass is not None and rec.counting
    pos_before = rec.sv_position(rec.tow_at_last_subframe, kepler_iterations=10)

    blob = pickle.loads(pickle.dumps(world))
    rec2 = blob._sats[prn]
    assert rec2.glonass == rec.glonass
    assert blob.glonass_bias_s == world.glonass_bias_s
    np.testing.assert_allclose(
        rec2.sv_position(rec2.tow_at_last_subframe, kepler_iterations=10),
        pos_before,
    )
    # The tick anchor landed on the 2 s GLONASS grid mapped into GPS frame.
    from gypsum_tpu.solve.glonass import glonass_day_time_from_gps_sow

    day = glonass_day_time_from_gps_sow(rec.tow_at_last_subframe, 18)
    assert day % 2.0 == pytest.approx(0.0, abs=1e-9)


def test_fdma_cross_channel_ghost_vetoed_by_slot_collision():
    """Campaign-found (glonass-df seed 4): the shared SP code leaks a
    strong satellite into a vacant neighboring sub-band; the ghost channel
    decodes the SAME strings (so it has an orbit and a time base) and its
    pseudorange moved the fix 335 m. Two channels decoding one orbital
    slot is the tell — the weaker must be flagged, dropped, and kept out
    of every fix."""
    import dataclasses

    from gypsum_tpu.signal.scenarios import demo_iono_page18
    from gypsum_tpu.solve.geodesy import lla_to_ecef
    from gypsum_tpu.solve.iono import IonoUtcParams

    # Exact failing scenario (tools/campaign.py run_glonass_df_trial seed 4).
    ks = [-7, -6, -4, -1, 3, 6]
    rx = lla_to_ecef(51.77840736923656, -1.9751926311883372, 38.53965397915354)
    page = demo_iono_page18()
    scale = 0.40072056427505365
    page = dataclasses.replace(
        page, alpha0=page.alpha0 * scale, alpha1=page.alpha1 * scale,
        alpha2=page.alpha2 * scale, alpha3=page.alpha3 * scale,
    )
    params = IonoUtcParams.from_page(page)
    sats = demo_glonass_constellation(ks)
    iq, _ = synthesize_constellation(
        sats, rx, START_SOW, 15.6, GLO_FS, noise_sigma=0.2610781313993226,
        seed=4, iono=params,
    )
    recv = Receiver(ArraySampleSource(iq, GLO_FS), ReceiverConfig(), band="glonass")
    reports = recv.run()
    on_air = {s.prn for s in sats}
    ghosts = {p for p, r in recv.world._sats.items() if r.glonass_ghost}
    # The leakage image was flagged (it is NOT one of the on-air channels)
    # and stays tracked for re-arbitration rather than being dropped.
    assert ghosts and not (ghosts & on_air), f"ghosts={ghosts}"
    fixes = [r.fix for r in reports if r.fix is not None]
    assert fixes, "no fix"
    for fix in fixes:
        assert not (set(fix.satellites_used) & ghosts), (
            f"ghost ranged into a fix: {set(fix.satellites_used) & ghosts}"
        )
    last = fixes[-1]
    assert set(last.satellites_used) <= on_air
    assert np.linalg.norm(last.ecef - rx) < 15.0


def test_ghost_arbitration_is_global_per_slot():
    """Advisor-found (round 4): with >= 3 channels decoding one orbital
    slot (a strong SV leaking into BOTH adjacent vacant sub-bands), the
    old pairwise weaker/stronger arbitration could un-flag a ghost that a
    stronger third claimant had already flagged (45 dBHz real + 30/25 dBHz
    ghosts left the 30 dBHz ghost fix-eligible). Arbitration is now global
    per slot: all but the single max-C/N0 claimant are flagged, regardless
    of which channel's frame decode triggers the re-vote."""
    from types import SimpleNamespace

    from gypsum_tpu.solve.world import WorldModel, _SatelliteRecord

    wm = WorldModel()
    cn0 = {204: 30.0, 205: 45.0, 206: 25.0}
    for prn, c in cn0.items():
        wm._sats[prn] = _SatelliteRecord(
            glonass=SimpleNamespace(slot=7), cn0_dbhz=c
        )
    # Trigger the re-vote from EVERY claimant's perspective: the outcome
    # must be identical (the pairwise bug depended on the trigger order).
    for prn in (205, 204, 206, 204):
        wm._flag_glonass_ghosts(prn, wm._sats[prn])
        flags = {p: wm._sats[p].glonass_ghost for p in cn0}
        assert flags == {204: True, 205: False, 206: True}, (
            f"after re-vote from {prn}: {flags}"
        )
    # A lone claimant is never a ghost.
    wm2 = WorldModel()
    wm2._sats[205] = _SatelliteRecord(
        glonass=SimpleNamespace(slot=7), cn0_dbhz=40.0, glonass_ghost=True
    )
    wm2._flag_glonass_ghosts(205, wm2._sats[205])
    assert wm2._sats[205].glonass_ghost is False

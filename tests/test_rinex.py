"""RINEX 3.04 export (obs/rinex.py): structure, round trips, and physical
consistency of the exported observables against the synthesized truth."""

from __future__ import annotations

import numpy as np

from gypsum_tpu.core.constants import (
    GPS_L1_FREQUENCY_HZ,
    SPEED_OF_LIGHT_M_PER_S as C,
)
from gypsum_tpu.obs.rinex import (
    RinexObsWriter,
    _EpochRow,
    parse_nav,
    parse_obs,
    render_nav,
)

LAMBDA_L1 = C / GPS_L1_FREQUENCY_HZ


def test_nav_round_trip_preserves_orbits():
    """Rendered + re-parsed ephemerides must propagate to the same satellite
    positions (sub-mm: the 12-significant-digit fields dominate)."""
    from gypsum_tpu.signal.scenarios import DEMO_EPHEMERIDES
    from gypsum_tpu.solve.ephemeris import satellite_position

    eph_in = {25: DEMO_EPHEMERIDES[0], 31: DEMO_EPHEMERIDES[2]}
    text = render_nav(eph_in, base_week=2048)
    eph_out = parse_nav(text)
    assert sorted(eph_out) == [25, 31]
    for prn in eph_in:
        for t in (21600.0, 21650.0, 21800.0):
            p_in = satellite_position(eph_in[prn], t)
            p_out = satellite_position(eph_out[prn], t)
            assert np.linalg.norm(p_in - p_out) < 1e-2
        # Clock terms survive too.
        assert eph_out[prn].a_f0 == eph_in[prn].a_f0
        assert eph_out[prn].t_gd == eph_in[prn].t_gd


def test_obs_structure_and_round_trip():
    """Header labels in columns 61-80, and a hand-built epoch set parses
    back value-exact at the written precision."""

    class _FakeRecv:
        sample_rate = 2.046e6
        samples_per_prn = 2046

        class config:
            from gypsum_tpu.core.config import TrackingConfig as _T

            tracking = _T()

    w = RinexObsWriter.__new__(RinexObsWriter)
    w.marker = "TEST"
    w.week = 2298
    w.epochs = [
        (21601.0, [
            _EpochRow(prn=25, c1c=21234567.891, l1c=111222333.444,
                      d1c=1234.567, s1c=44.5, new_arc=True),
            _EpochRow(prn=122, c1c=38012345.678, l1c=-222333444.555,
                      d1c=-87.125, s1c=38.25, new_arc=False),
        ]),
        (21602.0, [
            _EpochRow(prn=25, c1c=21234077.123, l1c=111221101.987,
                      d1c=1230.001, s1c=None, new_arc=False),
        ]),
    ]
    text = w.render(approx_ecef=np.array([3980000.0, -7000.0, 4970000.0]))

    for line in text.splitlines():
        if line.startswith(">") or not line[3:4].isspace() and line[0] in "GS":
            continue
        if line[60:].strip():
            assert len(line) <= 80
    assert "END OF HEADER" in text
    assert "SYS / # / OBS TYPES" in text

    parsed = parse_obs(text)
    assert parsed.obs_types == ("C1C", "L1C", "D1C", "S1C")
    assert len(parsed.epochs) == 2
    when, rows = parsed.epochs[0]
    assert when.hour == 6 and when.minute == 0 and when.second == 1
    assert rows[25]["C1C"] == 21234567.891
    assert rows[25]["L1C_slip"] == 1.0
    assert rows[122]["D1C"] == -87.125  # SBAS PRN 122 -> S22 -> 122
    assert "S1C" not in parsed.epochs[1][1][25]


def test_rtk_from_rinex_files():
    """The RTK engine consuming standard RINEX: two model-generated OBS
    files (full pseudoranges + RINEX-sign carrier with known half-cycle
    ambiguities) round-trip through the writer/parser into
    dd_from_rinex + solve_baseline, recovering the baseline at mm level."""
    from gypsum_tpu.signal.scenarios import DEMO_EPHEMERIDES, DEMO_GPS_START_SOW, DEMO_PRNS_8
    from gypsum_tpu.solve.geodesy import enu_basis, lla_to_ecef
    from gypsum_tpu.solve.rtk import (
        dd_from_rinex,
        solve_baseline,
        sv_position_fn_from_ephemerides,
    )

    prns = DEMO_PRNS_8[:6]
    eph = {p: DEMO_EPHEMERIDES[DEMO_PRNS_8.index(p)] for p in prns}
    sv_fn = sv_position_fn_from_ephemerides(eph, 0.0)  # epochs already SOW

    base = lla_to_ecef(51.5, -0.1, 80.0)
    east, north, up = enu_basis(base)
    truth = 9.0 * east + 4.0 * north - 1.0 * up
    rover = base + truth
    rng = np.random.default_rng(5)
    n_half = {p: int(rng.integers(-50, 50)) for p in prns}  # half-cycles

    def obs_text(rx, clock_bias_s, week=2298):
        w = RinexObsWriter.__new__(RinexObsWriter)
        w.marker, w.week, w.epochs = "SYN", week, []
        for sow in np.arange(DEMO_GPS_START_SOW + 20.0,
                             DEMO_GPS_START_SOW + 60.0, 1.0):
            rows = []
            for p in prns:
                rho = float(np.linalg.norm(sv_fn(p, sow) - rx))
                pr = rho + C * clock_bias_s + rng.normal(0, 0.4)
                l1 = ((rho + C * clock_bias_s) / LAMBDA_L1
                      + n_half[p] / 2.0 + rng.normal(0, 0.01))
                rows.append(_EpochRow(prn=p, c1c=pr, l1c=l1, d1c=0.0,
                                      s1c=45.0, new_arc=False))
            w.epochs.append((sow, rows))
        return w.render()

    dd = dd_from_rinex(obs_text(base, 1.7e-4), obs_text(rover, -0.9e-4),
                       prns=prns)
    sol = solve_baseline(dd, sv_fn, base)
    assert sol.fixed, f"not fixed (ratio {sol.ratio:.2f}, " \
                      f"boot {sol.bootstrap_success:.4f})"
    err = np.linalg.norm(sol.baseline_fixed_m - truth)
    assert err < 0.01, f"fixed baseline off by {err*1000:.1f} mm"


def test_receiver_export_is_physically_consistent():
    """Run the real receiver, export, re-parse, and check the observables
    against the scene geometry: pseudoranges within tens of meters of the
    true ranges, Doppler at the truth, and code-minus-carrier stable to
    sub-meter (the carrier tracks the same geometry the code measures)."""
    from gypsum_tpu.core.config import ReceiverConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_EPHEMERIDES,
        DEMO_GPS_START_SOW,
        DEMO_PRNS_8,
        demo_constellation,
    )
    from gypsum_tpu.solve.ephemeris import satellite_position
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    fs = 2.046e6
    prns = DEMO_PRNS_8[:4]
    sats = demo_constellation(prns)
    rx = lla_to_ecef(51.5, -0.1, 80.0)
    iq, truth = synthesize_constellation(
        sats, rx, DEMO_GPS_START_SOW, 24.0, fs, noise_sigma=0.25,
    )
    recv = Receiver(ArraySampleSource(iq, fs), ReceiverConfig(),
                    eligible_prns=prns)
    writer = RinexObsWriter(recv)
    recv.add_block_listener(writer.on_block)
    recv.run()
    assert writer.epochs, "no epochs exported"
    parsed = parse_obs(writer.render())
    assert len(parsed.epochs) >= 5

    eph = {p: DEMO_EPHEMERIDES[DEMO_PRNS_8.index(p)] for p in prns}
    cmc: dict[int, list[float]] = {}
    for when, rows in parsed.epochs:
        sow = (when - __import__("datetime").datetime(1980, 1, 6)).total_seconds() \
            - (2048 + eph[prns[0]].week_number) * 7 * 86400.0
        for prn, vals in rows.items():
            # True geometric range at the (approximate) emission time.
            sv = satellite_position(eph[prn], sow - 0.072)
            rng = float(np.linalg.norm(sv - rx))
            assert abs(vals["C1C"] - rng) < 50.0, (prn, vals["C1C"], rng)
            if "L1C" in vals:
                cmc.setdefault(prn, []).append(
                    vals["C1C"] - LAMBDA_L1 * vals["L1C"]
                )
    # First-epoch Doppler near the synthesized truth. The truth is at t=0
    # while export starts once the ephemeris is decoded (~18 s); geometry
    # moves Doppler ~0.6 Hz/s, hence the window.
    _, rows0 = parsed.epochs[0]
    for prn, vals in rows0.items():
        assert abs(vals["D1C"] - truth.doppler_hz[prn]) < 25.0
    # Code-minus-carrier: constant per continuous arc to sub-meter.
    for prn, series in cmc.items():
        assert len(series) >= 4
        assert np.std(np.asarray(series)) < 1.0, (prn, np.std(series))


# --------------------------------------------------------------- GLONASS


def test_glonass_nav_round_trip_preserves_orbits():
    """R records (km-unit state vectors, -tau_n clock line, frequency
    number in the body) propagate to the same positions after re-parse, in
    a standalone R file and in a MIXED file next to GPS records."""
    from gypsum_tpu.obs.rinex import parse_nav_glonass, render_nav_glonass
    from gypsum_tpu.signal.scenarios import (
        DEMO_EPHEMERIDES,
        demo_glonass_constellation,
    )
    from gypsum_tpu.solve.glonass import glonass_satellite_position

    sats = demo_glonass_constellation([-2, 0, 2])
    eph_in = {s.prn: s.ephemeris for s in sats}
    text = render_nav_glonass(eph_in)
    eph_out = parse_nav_glonass(text)
    assert sorted(eph_out) == sorted(eph_in)
    for prn in eph_in:
        a, b = eph_in[prn], eph_out[prn]
        assert b.frequency_number == a.frequency_number
        assert b.slot == a.slot
        assert b.health_bn == a.health_bn
        assert b.tb_day_s == a.tb_day_s
        assert abs(b.tau_n_s - a.tau_n_s) < 1e-15
        assert abs(b.gamma_n - a.gamma_n) < 1e-20
        for dt in (-600.0, 0.0, 600.0):
            p_in = glonass_satellite_position(a, a.tb_day_s + dt)
            p_out = glonass_satellite_position(b, a.tb_day_s + dt)
            assert np.linalg.norm(p_in - p_out) < 0.05  # km-unit rounding

    # MIXED file: both parsers read their own system and skip the other.
    mixed = render_nav({25: DEMO_EPHEMERIDES[0]}, base_week=2048, glonass=eph_in)
    assert "M: MIXED" in mixed
    assert sorted(parse_nav_glonass(mixed)) == sorted(eph_in)
    assert sorted(parse_nav(mixed)) == [25]


def test_glonass_obs_export_with_l2_end_to_end():
    """A GLONASS L1+L2 dual-frequency replay exports R<slot> rows with the
    SLOT/FRQ header and a C2C cell whose C2C-C1C difference IS the
    measured inter-band divergence (the dual-frequency iono observable,
    re-derivable by any external tool from the file alone)."""
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.obs.rinex import render_obs_merged
    from gypsum_tpu.runtime.receiver import DualBandReceiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GLONASS_SAMPLE_RATE as GLO_FS,
        demo_glonass_constellation,
        demo_iono_page18,
        demo_receiver_ecef,
    )
    from gypsum_tpu.solve.iono import IonoUtcParams

    ks = [-2, -1, 1, 2]  # 4 channels: fixes pin the receiver clock,
    # so C1C is a true ~20,000 km pseudorange (a no-fix replay leaves
    # the clock slide anchored to one SV, shifting every C1C by its
    # ~70 ms transit)
    rx = demo_receiver_ecef()
    params = IonoUtcParams.from_page(demo_iono_page18())
    sats = demo_glonass_constellation(ks)
    l1_iq, _ = synthesize_constellation(
        sats, rx, 21618.0, 13.0, GLO_FS, noise_sigma=0.25, iono=params,
    )
    l2_iq, _ = synthesize_constellation(
        sats, rx, 21618.0, 13.0, GLO_FS, noise_sigma=0.25, iono=params,
        glonass_band="l2",
    )
    dual = DualBandReceiver(
        None,
        ArraySampleSource(l1_iq, GLO_FS),
        glonass_l2_source=ArraySampleSource(l2_iq, GLO_FS),
    )
    writer = RinexObsWriter(dual.glonass)
    dual.glonass.add_block_listener(writer.on_block)
    dual.run()
    assert writer.epochs, "no exportable epochs (time bases never formed)"
    text = render_obs_merged([writer], approx_ecef=rx)
    assert "R: GLONASS" in text
    assert "GLONASS SLOT / FRQ #" in text

    parsed = parse_obs(text)
    # Demo slots are 1..len(ks) in ks order.
    assert parsed.slot_to_freq == {i + 1: k for i, k in enumerate(ks)}
    assert parsed.obs_types_by_sys["R"] == ("C1C", "D1C", "S1C", "C2C")
    _, rows = parsed.epochs[-1]
    want_ids = {208 + k for k in ks}
    assert want_ids <= set(rows), f"missing rows: {want_ids - set(rows)}"
    for prn in want_ids:
        vals = rows[prn]
        assert 15e6 < vals["C1C"] < 30e6
        assert "D1C" in vals and "S1C" in vals
        assert "C2C" in vals, "L2 band delay never exported"
        d = vals["C2C"] - vals["C1C"]
        assert 1.0 < d < 30.0, f"inter-band divergence {d:.2f} m implausible"
        # The file's own divergence must equal the receiver's measured
        # iono observable (I_L1 = d * 49/32 for GLONASS's exact 7/9 ratio).
        rec = dual.world._sats[prn]
        i1 = dual.world.measured_iono_l1_s(
            prn, rec.smoothed_delay_s, now=rec.l2_updated_at
        )
        assert i1 is not None
        assert abs(d * 49.0 / 32.0 - i1 * C) < 1.0


def test_glonass_nav_duplicate_frequency_number_warns(caplog):
    """Advisor-found (round 4): real IGS nav files carry ANTIPODAL
    satellites sharing one frequency number; the 208+k channel-id keying
    can hold only one of the pair, so the overwrite must be loud, not
    silent. (Round-trip of this framework's own files never collides —
    its channel-id model is one SV per frequency.)"""
    import dataclasses
    import logging

    from gypsum_tpu.obs.rinex import parse_nav_glonass, render_nav_glonass
    from gypsum_tpu.signal.scenarios import demo_glonass_constellation

    sats = demo_glonass_constellation([-2, 0])
    eph = {s.prn: s.ephemeris for s in sats}
    # Forge an antipodal pair: give the second record the FIRST record's
    # frequency number but a different orbital slot.
    (k0, e0), (k1, e1) = sorted(eph.items())
    eph[k1] = dataclasses.replace(
        e1, frequency_number=e0.frequency_number, slot=e0.slot + 8
    )
    text = render_nav_glonass(eph)
    with caplog.at_level(logging.WARNING, logger="gypsum_tpu.obs.rinex"):
        out = parse_nav_glonass(text)
    # Exactly one channel id survives (the later record wins)...
    assert sorted(out) == [208 + e0.frequency_number]
    assert out[208 + e0.frequency_number].slot == e0.slot + 8
    # ...and the drop was reported, naming both slots.
    assert any(
        "share frequency" in r.message for r in caplog.records
    ), caplog.records

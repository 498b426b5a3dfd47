"""NMEA 0183 output (obs/nmea.py): checksums against a published example,
coordinate-format round trips, sentence field semantics, UTC/leap-second
time base, GSV chunking, and the streaming block-listener writer.

The full-receiver integration check (real fixes -> parsed sentences vs the
synthesized truth) rides the completed_receiver fixture in
tests/test_end_to_end.py at zero added runtime.
"""

from __future__ import annotations

import dataclasses
import datetime as dt

import numpy as np
import pytest

from gypsum_tpu.obs.nmea import (
    GPS_EPOCH,
    NmeaWriter,
    checksum,
    gga,
    gsa,
    gsv,
    make_sentence,
    parse_gga,
    parse_rmc,
    rmc,
    sentences_for_fix,
    utc_of_fix,
    vtg,
)
from gypsum_tpu.solve.geodesy import lla_to_ecef
from gypsum_tpu.solve.world import ReceiverSolution


def _fix(lat=51.5, lon=-0.1, alt=80.0, ts=20.0, sats=(25, 28, 31, 32),
         vel=None, kind="lsq", sbas=(), dop=None):
    return ReceiverSolution(
        clock_bias_s=0.0,
        ecef=lla_to_ecef(lat, lon, alt),
        lat_deg=lat, lon_deg=lon, alt_m=alt,
        satellites_used=tuple(sats),
        receiver_timestamp=ts,
        velocity_ecef_mps=None if vel is None else np.asarray(vel, float),
        dop=dop, kind=kind, sbas_corrected=tuple(sbas),
    )


class _FakeEph:
    week_number = 250


class _FakeRec:
    def __init__(self, eph=None, cn0=None):
        self.ephemeris = eph
        self.cn0_dbhz = cn0


class _FakeCfg:
    gps_epoch_base_week_number = 2048


class _FakeIonoUtc:
    def __init__(self, leap):
        self.delta_t_ls = leap


class _FakeWorld:
    def __init__(self, slide=1000.0, leap=None):
        self.receiver_clock_slide = slide
        self.iono_utc = None if leap is None else _FakeIonoUtc(leap)
        self.config = _FakeCfg()
        self._sats = {25: _FakeRec(_FakeEph())}


WHEN = dt.datetime(2024, 1, 15, 12, 34, 56, 780000)


def test_checksum_matches_published_example():
    """The canonical GGA example from the NMEA spec carries checksum 47."""
    body = "GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,"
    assert checksum(body) == "47"
    assert make_sentence(body) == "$" + body + "*47"


@pytest.mark.parametrize("lat,lon", [
    (51.5074, -0.1278), (-33.8688, 151.2093), (0.0, 0.0),
    (89.9999, -179.9999), (-0.00009, 0.00011),
])
def test_coordinate_format_round_trip(lat, lon):
    """ddmm.mmmmm at 5 decimal minutes resolves ~2 cm; the round trip must
    agree to the format's quantization."""
    g = parse_gga(gga(_fix(lat=lat, lon=lon), WHEN))
    assert abs(g.lat_deg - lat) < 1e-5 / 60.0 * 10
    assert abs(g.lon_deg - lon) < 1e-5 / 60.0 * 10


def test_gga_fields_and_quality_codes():
    d = {"pdop": 2.5, "hdop": 1.25, "vdop": 2.2, "gdop": 3.0, "tdop": 1.0}
    g = parse_gga(gga(_fix(alt=123.4, dop=d), WHEN))
    assert g.n_satellites == 4
    assert g.hdop == pytest.approx(1.25)
    assert g.alt_m == pytest.approx(123.4)
    assert g.quality == 1
    assert g.utc_seconds == pytest.approx(12 * 3600 + 34 * 60 + 56.78)
    assert parse_gga(gga(_fix(sbas=(25,)), WHEN)).quality == 2
    assert parse_gga(gga(_fix(kind="ekf"), WHEN)).quality == 6


def test_rmc_speed_course_and_date():
    """At (0, 0) the ECEF y-axis is geodetic east: a +y velocity must read
    course 090 at the right speed, in knots on the wire and m/s parsed."""
    f = _fix(lat=0.0, lon=0.0, vel=(0.0, 10.0, 0.0))
    r = parse_rmc(rmc(f, WHEN))
    assert r.speed_mps == pytest.approx(10.0, abs=0.01)
    assert r.course_deg == pytest.approx(90.0, abs=0.1)
    assert r.when.date() == WHEN.date()
    assert (r.when - WHEN).total_seconds() == pytest.approx(0.0, abs=0.011)
    assert r.status == "A" and r.mode == "A"
    # EKF coast: void status, estimated mode (a consumer must not treat a
    # dead-reckoned position as a full fix).
    r2 = parse_rmc(rmc(_fix(kind="ekf", vel=(0, 0, 0)), WHEN))
    assert r2.status == "V" and r2.mode == "E"


def test_vtg_and_gsa_checksums_and_fields():
    f = _fix(vel=(0.0, 10.0, 0.0), lat=0.0, lon=0.0,
             dop={"pdop": 2.0, "hdop": 1.0, "vdop": 1.7})
    v = vtg(f)
    body, cs = v[1:].rsplit("*", 1)
    assert checksum(body) == cs
    fields = body.split(",")
    assert fields[0] == "GPVTG"
    assert float(fields[7]) == pytest.approx(36.0, abs=0.02)  # km/h
    a = gsa(f)
    body, cs = a[1:].rsplit("*", 1)
    assert checksum(body) == cs
    fields = body.split(",")
    assert fields[3:7] == ["25", "28", "31", "32"]
    assert fields[15:] == ["2.00", "1.00", "1.70"]


def test_utc_of_fix_leap_seconds_and_rollover():
    # GPS time = slide + receiver_timestamp anchored at week 250+2048.
    w = _FakeWorld(slide=21600.0)
    f = _fix(ts=0.0)
    expect = GPS_EPOCH + dt.timedelta(weeks=2298, seconds=21600.0 - 18.0)
    assert utc_of_fix(w, f) == expect
    # Broadcast leap-second count (subframe 4 page 18) wins over the default.
    w19 = _FakeWorld(slide=21600.0, leap=19)
    assert utc_of_fix(w19, f) == expect - dt.timedelta(seconds=1)
    # A start-of-week capture that crosses the rollover lands in week+1.
    w2 = _FakeWorld(slide=604800.0 - 5.0)
    got = utc_of_fix(w2, _fix(ts=10.0))
    assert got == GPS_EPOCH + dt.timedelta(weeks=2299, seconds=5.0 - 18.0)
    # No time base yet -> no sentences rather than wrong ones.
    assert utc_of_fix(_FakeWorld(slide=None), f) is None


class _Sky:
    def __init__(self, el, az):
        self.elevation_deg = el
        self.azimuth_deg = az


def test_gsv_chunking_and_visibility_filter():
    sky = {p: _Sky(10.0 + p, 30.0 * p) for p in (1, 2, 3, 7, 9, 11)}
    sky[5] = _Sky(-4.0, 100.0)      # below horizon: excluded
    sky[120] = _Sky(35.0, 200.0)    # SBAS GEO: outside the GP talker's ids
    out = gsv(sky, cn0_dbhz={1: 44.2, 7: 39.7})
    assert len(out) == 2
    f0 = out[0][1:].rsplit("*", 1)[0].split(",")
    assert f0[1:4] == ["2", "1", "06"]
    assert f0[4:8] == ["01", "11", "030", "44"]   # prn, elev, az, C/N0
    f1 = out[1][1:].rsplit("*", 1)[0].split(",")
    assert f1[1:4] == ["2", "2", "06"]
    assert len(f1) == 4 + 2 * 4                    # 2 sats in the tail msg
    for s in out:
        body, cs = s[1:].rsplit("*", 1)
        assert checksum(body) == cs


class _FakeReport:
    def __init__(self, fix):
        self.fix = fix


class _FakeRecv:
    def __init__(self, world):
        self.world = world


def test_writer_streams_per_fix(tmp_path):
    path = tmp_path / "out.nmea"
    w = NmeaWriter(path=str(path), include_gsv=False)
    recv = _FakeRecv(_FakeWorld(slide=21600.0))
    w.on_block(recv, _FakeReport(None))         # fix-less block: no output
    assert w.n_fixes == 0 and path.read_text() == ""
    w.on_block(recv, _FakeReport(_fix(ts=1.0)))
    w.on_block(recv, _FakeReport(_fix(ts=2.0)))
    assert w.n_fixes == 2
    raw = path.read_bytes()                      # incremental, pre-close
    lines = raw.decode().splitlines()
    assert len(lines) == len(w.lines) == 2 * 5   # GGA,GSA,RMC,VTG,ZDA per fix
    assert raw.count(b"\r\n") == len(lines)      # NMEA line endings
    for line in lines:
        body, cs = line[1:].rsplit("*", 1)
        assert checksum(body) == cs
    # utc-less world (no subframe yet): burst suppressed, not garbage.
    w2 = NmeaWriter(include_gsv=False)
    w2.on_block(_FakeRecv(_FakeWorld(slide=None)), _FakeReport(_fix()))
    assert w2.lines == [] and w2.n_fixes == 0
    w.close()


def test_sentences_for_fix_order(monkeypatch):
    world = _FakeWorld(slide=21600.0)
    world.predicted_sky = lambda ts, ecef: {25: _Sky(45.0, 120.0)}
    burst = sentences_for_fix(world, _fix())
    kinds = [s[3:6] for s in burst]
    assert kinds == ["GGA", "GSA", "RMC", "VTG", "GSV", "ZDA"]


def test_raim_failed_fix_demoted_to_estimated():
    """An lsq fix whose RAIM chi-square test failed must not present as an
    autonomous (quality 1) fix: GGA reports 6 / GSA-RMC mode 'E', matching
    the residual-scaled protection levels it carries."""
    from gypsum_tpu.obs.nmea import _mode_letter, _quality

    good = _fix()
    bad = dataclasses.replace(good, raim={"ok": False, "sigma_scale": 40.0})
    assert _quality(good) == 1 and _mode_letter(good) == "A"
    assert _quality(bad) == 6 and _mode_letter(bad) == "E"


def test_multiconstellation_burst_gn_talker_dual_gsa_and_glgsv():
    """A fix using GLONASS satellites follows NMEA 4.10: GN talker on the
    position sentences, one GSA per system (system id 1/2; GLONASS ids are
    slot+64 from the decoded string 4), GPGSV + GLGSV pairs. A GLONASS
    channel whose slot is still unknown has no NMEA number and is skipped."""

    class _FakeGlo:
        slot = 5

    world = _FakeWorld(slide=21600.0)
    rec = _FakeRec(cn0=41.0)
    rec.glonass = _FakeGlo()
    world._sats[210] = rec
    world._sats[208] = _FakeRec()  # tracked, but string 4 not decoded yet
    world.predicted_sky = lambda ts, ecef: {
        25: _Sky(45.0, 120.0), 210: _Sky(30.0, 200.0),
    }
    fix = _fix(sats=(25, 28, 31, 32, 210, 208))
    burst = sentences_for_fix(world, fix)
    kinds = [s[1:6] for s in burst]
    assert kinds[0] == "GNGGA"
    gsas = [s for s in burst if "GSA" in s]
    assert len(gsas) == 2
    assert all(s.startswith("$GNGSA") for s in gsas)
    # Trailing system id before the checksum.
    assert gsas[0].split("*")[0].endswith(",1")
    assert gsas[1].split("*")[0].endswith(",2")
    assert ",25," in gsas[0] and ",69," in gsas[1]  # slot 5 -> 69
    # Slotless 208 is absent from every sentence.
    assert not any(",72," in s for s in gsas)
    gsvs = [s for s in burst if "GSV" in s]
    assert any(s.startswith("$GPGSV") for s in gsvs)
    glgsv = [s for s in gsvs if s.startswith("$GLGSV")]
    assert len(glgsv) == 1 and ",69," in glgsv[0]
    assert burst[-1].startswith("$GNZDA")
    # Checksums stay valid on every sentence.
    from gypsum_tpu.obs.nmea import checksum as _ck

    for s in burst:
        body, ck = s[1:].split("*")
        assert _ck(body) == ck

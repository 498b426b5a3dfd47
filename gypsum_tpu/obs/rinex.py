"""RINEX 3.04 export (observation + navigation) and a matching reader.

Interoperability with the wider GNSS ecosystem (RTKLIB, gLAB, teqc-era
toolchains): the receiver's raw observables — pseudorange, accumulated
carrier phase, Doppler, C/N0 — stream into a standard OBS file, and decoded
broadcast ephemerides into a NAV file. The reference receiver has no export
of any kind (observables die inside its world model).

Conventions
-----------
- Epochs are GPS time (stream time + the receiver clock slide), one epoch
  per tracking block. No leap-second handling is needed: RINEX GPS-time
  files are tagged in GPS time.
- C1C: the solver's full pseudorange, c * (slide + arrival - sv_tow) —
  RAW in the RINEX sense (no atmospheric or SBAS corrections applied).
- L1C: accumulated carrier in cycles with the RINEX sign (grows with
  range), i.e. MINUS the tracker's NCO cycles (solve/rtk.py reconstructs
  those exactly); arbitrary integer offset per arc, loss-of-lock flagged
  via a new arc.
- D1C: tracker Doppler (positive while approaching — already the RINEX
  convention).
- S1C: the per-block M2M4 C/N0 estimate (obs/cn0.py).

The writer emits structurally strict RINEX (60-character content field +
20-character header labels, 16-character observation cells); the reader
round-trips everything the writer produces and is deliberately limited to
that subset.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

import numpy as np

from gypsum_tpu.core.constants import SPEED_OF_LIGHT_M_PER_S as C

#: GPS time zero.
GPS_EPOCH = _dt.datetime(1980, 1, 6, 0, 0, 0)

OBS_TYPES = ("C1C", "L1C", "D1C", "S1C")


def _gps_datetime(week: int, sow: float) -> _dt.datetime:
    return GPS_EPOCH + _dt.timedelta(weeks=week, seconds=float(sow))


def _hline(content: str, label: str) -> str:
    return f"{content:<60.60s}{label:<20.20s}".rstrip() + "\n"


def _sys_of(prn: int) -> tuple[str, int]:
    """RINEX system letter + in-system number: GPS G01-G32, SBAS S20-S38
    (SBAS PRN 120-138 -> S(prn-100))."""
    if 1 <= prn <= 32:
        return "G", prn
    if 120 <= prn <= 138:
        return "S", prn - 100
    raise ValueError(f"PRN {prn} not representable in RINEX")


# --------------------------------------------------------------------------
# Observation writer
# --------------------------------------------------------------------------


@dataclass
class _EpochRow:
    prn: int
    c1c: float | None
    l1c: float | None
    d1c: float | None
    s1c: float | None
    new_arc: bool


class RinexObsWriter:
    """Collects per-epoch observables; ``write()`` renders the file.

    Attach to a receiver with ``receiver.add_block_listener(writer.on_block)``
    — it reconstructs carrier phase with a CarrierPhaseLog and pulls
    pseudoranges from the world model's tick state at each processed block's
    end.
    """

    def __init__(self, receiver, marker: str = "GYPSUM") -> None:
        from gypsum_tpu.solve.rtk import CarrierPhaseLog

        self._recv = receiver
        self.marker = marker
        self._phase = CarrierPhaseLog(
            receiver.sample_rate, receiver.samples_per_prn,
            receiver.config.tracking,
        )
        self._arc_count: dict[int, int] = {}
        self.epochs: list[tuple[float, list[_EpochRow]]] = []  # (sow, rows)
        self.week: int | None = None

    # ------------------------------------------------------------ ingest

    def on_block(self, recv, report) -> None:
        world = recv.world
        if world.receiver_clock_slide is None or not report.observations:
            return
        rows: list[_EpochRow] = []
        sow = None
        for obs in report.observations:
            self._phase.ingest(obs)
            rec = world._sats.get(obs.prn)
            # Pseudoranges need the tick time base AND the SV clock model
            # (ephemeris / MT9), so export starts once the orbit is decoded
            # (~18 s into a cold start, immediately on a warm one).
            if (rec is None or not rec.counting
                    or rec.tow_at_last_subframe is None or not rec.has_orbit):
                continue
            t_end = float(obs.start_times[0]) - float(obs.code_phases[0]) / recv.sample_rate
            t_end += obs.start_times.shape[0] * 1e-3
            sow = world.receiver_clock_slide + t_end
            delay = rec.smoothed_delay_s if rec.smoothed_delay_s is not None else (
                ((rec.code_phase_delay_s + 0.5e-3) % 1e-3) - 0.5e-3
            )
            pr = C * ((world.receiver_clock_slide + t_end + delay)
                      - world.observed_sv_time_of_week(obs.prn))
            arcs = self._phase.arcs.get(obs.prn, [])
            new_arc = len(arcs) != self._arc_count.get(obs.prn)
            self._arc_count[obs.prn] = len(arcs)
            l1c = None
            if arcs:
                # Propagate the last-ms phase to the block END (the
                # pseudorange epoch) along its own Doppler; RINEX sign:
                # phase grows with range.
                l1c = -(arcs[-1].phase_cycles[-1]
                        + float(obs.dopplers[-1]) * 1e-3)
            rows.append(_EpochRow(
                prn=obs.prn, c1c=pr, l1c=l1c,
                d1c=float(obs.dopplers[-1]),
                s1c=rec.cn0_dbhz, new_arc=new_arc,
            ))
        if rows and sow is not None:
            if self.week is None:
                self.week = self._week_from_world(world)
            self.epochs.append((sow, rows))

    @staticmethod
    def _week_from_world(world) -> int | None:
        for rec in world._sats.values():
            if rec.ephemeris is not None:
                return int(rec.ephemeris.week_number) + int(
                    world.config.gps_epoch_base_week_number
                )
        return None

    # ------------------------------------------------------------- render

    def render(self, approx_ecef: np.ndarray | None = None) -> str:
        if not self.epochs:
            raise ValueError("no epochs recorded")
        week = self.week if self.week is not None else 2298
        systems = sorted({_sys_of(r.prn)[0] for _, rows in self.epochs for r in rows})
        first = _gps_datetime(week, self.epochs[0][0])
        now = first.strftime("%Y%m%d %H%M%S GPS")

        out = []
        sys_desc = {"G": "G: GPS", "S": "S: SBAS payload"}
        desc = "M: MIXED" if len(systems) > 1 else sys_desc[systems[0]]
        out.append(_hline(f"{3.04:9.2f}{'':11s}{'OBSERVATION DATA':<20s}{desc}",
                          "RINEX VERSION / TYPE"))
        out.append(_hline(f"{'gypsum-tpu':<20s}{'':20s}{now:<20s}", "PGM / RUN BY / DATE"))
        out.append(_hline(f"{self.marker:<60s}", "MARKER NAME"))
        out.append(_hline(f"{'gypsum':<20s}{'gypsum-tpu':<40s}", "OBSERVER / AGENCY"))
        out.append(_hline(f"{'0':<20s}{'SDR':<20s}{'1':<20s}", "REC # / TYPE / VERS"))
        out.append(_hline(f"{'0':<20s}{'NONE':<20s}", "ANT # / TYPE"))
        pos = np.zeros(3) if approx_ecef is None else np.asarray(approx_ecef)
        out.append(_hline(f"{pos[0]:14.4f}{pos[1]:14.4f}{pos[2]:14.4f}",
                          "APPROX POSITION XYZ"))
        out.append(_hline(f"{0.0:14.4f}{0.0:14.4f}{0.0:14.4f}", "ANTENNA: DELTA H/E/N"))
        for sys_l in systems:
            types = "".join(f" {t}" for t in OBS_TYPES)
            out.append(_hline(f"{sys_l}  {len(OBS_TYPES):3d}{types}", "SYS / # / OBS TYPES"))
        out.append(_hline(
            f"{first.year:6d}{first.month:6d}{first.day:6d}{first.hour:6d}"
            f"{first.minute:6d}{first.second + first.microsecond / 1e6:13.7f}"
            f"{'':5s}{'GPS':<3s}", "TIME OF FIRST OBS"))
        out.append(_hline("", "END OF HEADER"))

        for sow, rows in self.epochs:
            # Round to the written precision FIRST so the calendar fields and
            # the seconds cell cannot disagree at a minute boundary.
            sow = round(sow * 1e7) / 1e7
            dt = _gps_datetime(week, sow)
            sec = sow % 60.0
            out.append(f"> {dt.year:4d} {dt.month:02d} {dt.day:02d} "
                       f"{dt.hour:02d} {dt.minute:02d}{sec:11.7f}  0"
                       f"{len(rows):3d}\n")
            for r in sorted(rows, key=lambda r: _sys_of(r.prn)):
                sys_l, num = _sys_of(r.prn)
                cells = []
                for v, lli in ((r.c1c, " "), (r.l1c, "1" if r.new_arc else " "),
                               (r.d1c, " "), (r.s1c, " ")):
                    if v is None:
                        cells.append(" " * 16)
                    else:
                        cells.append(f"{v:14.3f}{lli}" + " ")
                out.append(f"{sys_l}{num:02d}" + "".join(cells).rstrip() + "\n")
        return "".join(out)

    def write(self, path: str, approx_ecef: np.ndarray | None = None) -> None:
        with open(path, "w") as f:
            f.write(self.render(approx_ecef))


# --------------------------------------------------------------------------
# Navigation writer
# --------------------------------------------------------------------------

_NAV_FIELDS = (
    # line 1 (after the epoch/clock line prefix): handled separately
    ("iode", "crs", "delta_n", "m0"),
    ("cuc", "eccentricity", "cus", "sqrt_a"),
    ("t_oe", "cic", "omega0", "cis"),
    ("i0", "crc", "omega", "omega_dot"),
    ("idot", "l2_codes", "week_eff", "l2p_flag"),
    ("sv_accuracy", "sv_health", "t_gd", "iodc"),
    ("transmit_time", "fit_interval", "spare1", "spare2"),
)


def render_nav(ephemerides: dict[int, "object"], base_week: int = 2048) -> str:
    """RINEX 3.04 GPS navigation file from decoded ephemerides."""
    out = [
        _hline(f"{3.04:9.2f}{'':11s}{'N: GNSS NAV DATA':<20s}{'G: GPS':<20s}",
               "RINEX VERSION / TYPE"),
        _hline(f"{'gypsum-tpu':<20s}{'':20s}{'':20s}", "PGM / RUN BY / DATE"),
        _hline("", "END OF HEADER"),
    ]

    def num(v: float) -> str:
        return f"{v:19.12E}"

    for prn in sorted(ephemerides):
        eph = ephemerides[prn]
        week = int(eph.week_number) + base_week
        toc = _gps_datetime(week, eph.t_oc)
        out.append(
            f"G{prn:02d} {toc.year:4d} {toc.month:02d} {toc.day:02d} "
            f"{toc.hour:02d} {toc.minute:02d} {toc.second:02d}"
            + num(eph.a_f0) + num(eph.a_f1) + num(eph.a_f2) + "\n"
        )
        vals = {
            "iode": 0.0, "crs": eph.crs, "delta_n": eph.delta_n, "m0": eph.m0,
            "cuc": eph.cuc, "eccentricity": eph.eccentricity, "cus": eph.cus,
            "sqrt_a": eph.sqrt_a,
            "t_oe": eph.t_oe, "cic": eph.cic, "omega0": eph.omega0, "cis": eph.cis,
            "i0": eph.i0, "crc": eph.crc, "omega": eph.omega,
            "omega_dot": eph.omega_dot,
            "idot": eph.idot, "l2_codes": 0.0, "week_eff": float(week),
            "l2p_flag": 0.0,
            "sv_accuracy": 2.0, "sv_health": 0.0, "t_gd": eph.t_gd, "iodc": 0.0,
            "transmit_time": eph.t_oe, "fit_interval": 4.0,
            "spare1": 0.0, "spare2": 0.0,
        }
        for line_fields in _NAV_FIELDS:
            out.append("    " + "".join(num(vals[f]) for f in line_fields) + "\n")
    return "".join(out)


# --------------------------------------------------------------------------
# Readers (round-trip the writer's subset)
# --------------------------------------------------------------------------


@dataclass
class RinexObs:
    week: int | None
    obs_types: tuple[str, ...]
    epochs: list[tuple[_dt.datetime, dict[int, dict[str, float]]]] = field(
        default_factory=list
    )


def parse_obs(text: str) -> RinexObs:
    lines = text.splitlines()
    i = 0
    obs_types: tuple[str, ...] = ()
    while i < len(lines):
        line = lines[i]
        label = line[60:].strip()
        if label == "SYS / # / OBS TYPES":
            obs_types = tuple(line[7:60].split())
        if label == "END OF HEADER":
            i += 1
            break
        i += 1
    result = RinexObs(week=None, obs_types=obs_types)
    while i < len(lines):
        line = lines[i]
        i += 1
        if not line.startswith("> "):
            continue
        y, mo, d, h, mi = (int(line[2:6]), int(line[7:9]), int(line[10:12]),
                           int(line[13:15]), int(line[16:18]))
        sec = float(line[18:30])
        n = int(line[32:36])
        when = _dt.datetime(y, mo, d, h, mi) + _dt.timedelta(seconds=sec)
        rows: dict[int, dict[str, float]] = {}
        for _ in range(n):
            rec = lines[i]
            i += 1
            sys_l, num = rec[0], int(rec[1:3])
            prn = num if sys_l == "G" else num + 100
            vals = {}
            for k, t in enumerate(obs_types):
                cell = rec[3 + 16 * k : 3 + 16 * (k + 1)]
                if cell[:14].strip():
                    vals[t] = float(cell[:14])
                    if t == "L1C" and len(cell) > 14 and cell[14] == "1":
                        vals["L1C_slip"] = 1.0
            rows[prn] = vals
        result.epochs.append((when, rows))
    return result


def parse_nav(text: str) -> dict[int, "object"]:
    from gypsum_tpu.solve.ephemeris import Ephemeris

    lines = text.splitlines()
    i = 0
    while i < len(lines) and lines[i][60:].strip() != "END OF HEADER":
        i += 1
    i += 1
    out: dict[int, Ephemeris] = {}
    while i < len(lines):
        head = lines[i]
        if not head.startswith("G") or i + 8 > len(lines):
            i += 1
            continue
        prn = int(head[1:3])
        toc = _dt.datetime(int(head[4:8]), int(head[9:11]), int(head[12:14]),
                           int(head[15:17]), int(head[18:20]), int(head[21:23]))
        a_f0, a_f1, a_f2 = (float(head[23 + 19 * k : 23 + 19 * (k + 1)])
                            for k in range(3))
        vals = []
        for j in range(7):
            body = lines[i + 1 + j][4:]
            vals.extend(float(body[19 * k : 19 * (k + 1)]) for k in range(4))
        i += 8
        names = [f for line_fields in _NAV_FIELDS for f in line_fields]
        v = dict(zip(names, vals))
        week_eff = int(v["week_eff"])
        gps_dt = toc - GPS_EPOCH
        t_oc = gps_dt.total_seconds() - week_eff * 7 * 86400.0
        out[prn] = Ephemeris(
            sqrt_a=v["sqrt_a"], eccentricity=v["eccentricity"], i0=v["i0"],
            omega0=v["omega0"], omega=v["omega"], m0=v["m0"],
            delta_n=v["delta_n"], idot=v["idot"], omega_dot=v["omega_dot"],
            cuc=v["cuc"], cus=v["cus"], crc=v["crc"], crs=v["crs"],
            cic=v["cic"], cis=v["cis"], t_oe=v["t_oe"],
            a_f0=a_f0, a_f1=a_f1, a_f2=a_f2, t_oc=t_oc, t_gd=v["t_gd"],
            week_number=week_eff,
        )
    return out

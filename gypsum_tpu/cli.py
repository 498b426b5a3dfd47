"""Command-line interface: replay / acquire / synth / bench.

Reference parity: gypsum-cli.py (replay loop with --file_name /
--only_acquire_satellite_ids / UI flags), extended with subcommands the
reference lacks: one-shot acquisition reports, synthetic capture generation
(replacing the dependence on vendored recordings), and the benchmark.

Usage:
    python -m gypsum_tpu replay --file capture.iq [--prns 25 28] [--web-ui]
    python -m gypsum_tpu acquire --file capture.iq
    python -m gypsum_tpu synth --out capture.iq --duration 40
    python -m gypsum_tpu bench
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np

_logger = logging.getLogger("gypsum_tpu")


def _add_file_source_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--file", default=None, help="capture path (with .json sidecar) or .npy IQ")
    p.add_argument("--rtlsdr", action="store_true",
                   help="read live from an RTL-SDR dongle (needs pyrtlsdr; "
                   "tunes L1, streams via the async USB callback)")
    p.add_argument("--sample-rate", type=float, default=None,
                   help="override sample rate (else from sidecar; 2.046e6 for .npy)")
    p.add_argument("--format", default=None,
                   help="named capture format (gnu_radio_2x/8x/16x, rtl_sdr, hackrf) "
                   "instead of a sidecar (reference: radio_input.py INPUT_SOURCES)")
    p.add_argument("--notch", action="store_true",
                   help="excise narrowband interference (CW jammers, "
                        "harmonics) from each block with the STFT spectral "
                        "mask before processing (ops/interference.py)")
    p.add_argument("--beamform", action="store_true",
                   help="input is an [elements, samples] .npy antenna-array "
                        "capture (synth --array-out): null jammers — "
                        "including BROADBAND ones --notch cannot touch — "
                        "with the blind power-inversion CRPA beamformer "
                        "(ops/beamform.py), then process the single "
                        "beamformed stream normally")


PROCESSING_RATE = 2.046e6  # all signal processing runs at 2x the chip rate
# GLONASS L1OF band processing rate: 4092 samples per 1 ms code period keeps
# FDMA channels out to k = +/-2 inside Nyquist (signal/scenarios.py).
GLONASS_PROCESSING_RATE = 4.092e6


def _open_glonass_source(path: str, sample_rate: float | None):
    """The GLONASS band front end: .npy (or sidecar-described raw) capture
    at the GLONASS processing rate (decimated down to it if higher)."""
    import pathlib

    from gypsum_tpu.io.sources import (
        ArraySampleSource,
        DecimatingSampleSource,
        FileSampleSource,
        RecordingInfo,
    )

    if path.endswith(".npy"):
        rate = sample_rate
        if rate is None:
            sidecar = pathlib.Path(path + ".json")
            rate = (
                float(json.loads(sidecar.read_text())["sample_rate"])
                if sidecar.exists()
                else GLONASS_PROCESSING_RATE
            )
        source = ArraySampleSource(np.load(path), rate)
    else:
        info = (
            RecordingInfo(path=pathlib.Path(path), sample_rate=sample_rate)
            if sample_rate
            else RecordingInfo.from_sidecar(path)
        )
        source = FileSampleSource(info)
    if abs(source.attributes.sample_rate - GLONASS_PROCESSING_RATE) > 1e-6:
        _logger.info(
            "decimating %.0f Hz GLONASS capture to %.0f Hz",
            source.attributes.sample_rate, GLONASS_PROCESSING_RATE,
        )
        source = DecimatingSampleSource(source, GLONASS_PROCESSING_RATE)
    return source


def _open_source(args):
    import pathlib

    from gypsum_tpu.io.sources import (
        ArraySampleSource,
        DecimatingSampleSource,
        FileSampleSource,
        RecordingInfo,
    )

    if getattr(args, "rtlsdr", False):
        from gypsum_tpu.io.sources import RtlSdrSampleSource

        return RtlSdrSampleSource(sample_rate=args.sample_rate or 2.046e6)
    if not args.file:
        raise SystemExit("provide --file CAPTURE or --rtlsdr")
    if args.file.endswith(".npy"):
        if getattr(args, "format", None):
            raise SystemExit(
                "--format describes raw interleaved captures; .npy files carry "
                "their own dtype (use --sample-rate or a .json sidecar for the rate)"
            )
        iq = np.load(args.file)
        rate = args.sample_rate
        if rate is None:
            sidecar = pathlib.Path(args.file + ".json")
            if sidecar.exists():
                rate = float(json.loads(sidecar.read_text())["sample_rate"])
            else:
                rate = PROCESSING_RATE
        if iq.ndim == 2:
            # [N_elements, T] antenna-array capture (synth --array-out).
            if not getattr(args, "beamform", False):
                raise SystemExit(
                    f"{args.file} is an {iq.shape[0]}-element array capture; "
                    "process it with --beamform (blind power-inversion CRPA, "
                    "ops/beamform.py) or index one element out yourself"
                )
            from gypsum_tpu.ops.beamform import (
                estimate_doa,
                null_jammers,
                spatial_covariance,
            )

            raw = iq
            iq, w, supp = null_jammers(raw)
            _logger.info(
                "beamform: power-inversion weights over %d elements, "
                "%.1f dB interference suppression (|w| = %s)",
                len(w), supp, np.round(np.abs(w), 3).tolist(),
            )
            sidecar = pathlib.Path(args.file + ".json")
            if supp > 3.0 and sidecar.exists():
                meta = json.loads(sidecar.read_text())
                if "elements_enu" in meta:
                    # Locate what we just nulled (MUSIC over the unloaded
                    # covariance): alerts with a BEARING.
                    r = spatial_covariance(raw[:, :65536], diagonal_loading=0.0)
                    for az, el, p_db in estimate_doa(
                        r, np.asarray(meta["elements_enu"])
                    ):
                        _logger.warning(
                            "interference bearing: azimuth %.0f deg, "
                            "elevation %.0f deg (MUSIC peak %.0f dB)",
                            az, el, p_db,
                        )
        elif getattr(args, "beamform", False):
            raise SystemExit("--beamform needs a 2-D [elements, samples] .npy capture")
        source = ArraySampleSource(iq, rate)
    else:
        if getattr(args, "format", None):
            from gypsum_tpu.io.sources import recording_info_for

            info = recording_info_for(args.format, args.file)
            if args.sample_rate:
                import dataclasses

                info = dataclasses.replace(info, sample_rate=args.sample_rate)
        elif args.sample_rate:
            info = RecordingInfo(path=pathlib.Path(args.file), sample_rate=args.sample_rate)
        else:
            info = RecordingInfo.from_sidecar(args.file)
        source = FileSampleSource(info)
    # Bring non-native rates down to the processing rate through the
    # polyphase front end (the reference cannot do this at all: it rejects
    # anything but integer multiples of the chip rate and never decimates,
    # gypsum/antenna_sample_provider.py:27,134-135).
    if abs(source.attributes.sample_rate - PROCESSING_RATE) > 1e-6:
        _logger.info(
            "decimating %.0f Hz capture to %.0f Hz", source.attributes.sample_rate, PROCESSING_RATE
        )
        source = DecimatingSampleSource(source, PROCESSING_RATE)
    if getattr(args, "notch", False):
        from gypsum_tpu.io.sources import NotchingSampleSource

        source = NotchingSampleSource(source)
    return source


def cmd_replay(args) -> int:
    import pathlib

    from gypsum_tpu.core.config import DEFAULT_CONFIG
    from gypsum_tpu.runtime.receiver import Receiver

    glonass_file = getattr(args, "glonass_file", None)
    if not args.file and not getattr(args, "rtlsdr", False) and glonass_file:
        source = None  # GLONASS-only replay
    else:
        source = _open_source(args)
    config = DEFAULT_CONFIG
    if args.block_ms:
        config = config.replace(tracking=config.tracking.__class__(block_size_ms=args.block_ms))
    if getattr(args, "hrc", False):
        import dataclasses

        config = config.replace(
            tracking=dataclasses.replace(
                config.tracking, code_phase_measurement="hrc"
            )
        )
    prns = [int(p) for p in args.prns] if args.prns else None
    if args.sbas:
        from gypsum_tpu.signal.prn import ALL_PRN_IDS, SBAS_PRN_IDS

        prns = sorted(set(prns or ALL_PRN_IDS) | set(SBAS_PRN_IDS))
    dual = None
    l2_file = getattr(args, "glonass_l2_file", None)
    if l2_file and not glonass_file:
        raise SystemExit("--glonass-l2-file requires --glonass-file (the L2 "
                         "band only contributes the iono difference against "
                         "tracked L1 channels)")
    l2_source = (
        _open_glonass_source(l2_file, getattr(args, "glonass_rate", None))
        if l2_file
        else None
    )
    if glonass_file and source is not None:
        from gypsum_tpu.runtime.receiver import DualBandReceiver

        dual = DualBandReceiver(
            source,
            _open_glonass_source(glonass_file, getattr(args, "glonass_rate", None)),
            config,
            eligible_prns=prns,
            glonass_l2_source=l2_source,
        )
        receiver = dual.gps  # listeners/narration ride the fix-owning band
        _logger.info(
            "dual-band replay: GPS %s + GLONASS %s%s", args.file, glonass_file,
            f" + L2 {l2_file}" if l2_file else "",
        )
    elif glonass_file and l2_source is not None:
        from gypsum_tpu.runtime.receiver import DualBandReceiver

        # GLONASS-only dual-frequency: L1OF owns the fix, L2OF contributes
        # the measured-iono difference (no Klobuchar broadcast to fall
        # back on — the measurement IS the iono correction here).
        dual = DualBandReceiver(
            None,
            _open_glonass_source(glonass_file, getattr(args, "glonass_rate", None)),
            config,
            glonass_l2_source=l2_source,
        )
        receiver = dual.glonass
        source = receiver.source
        _logger.info(
            "GLONASS dual-frequency replay: L1 %s + L2 %s", glonass_file, l2_file
        )
    elif glonass_file:
        receiver = Receiver(
            _open_glonass_source(glonass_file, getattr(args, "glonass_rate", None)),
            config, band="glonass",
        )
        source = receiver.source
        _logger.info("GLONASS-only replay: %s", glonass_file)
    else:
        receiver = Receiver(source, config, eligible_prns=prns)

    if getattr(args, "assist_nav", None):
        # Assisted start: broadcast ephemerides from a RINEX NAV file (ours
        # or any IGS/receiver product). Orbits are known before any decode,
        # so the first fix needs only the first handover word
        # (solve/world.py:_assisted_bootstrap).
        from gypsum_tpu.obs.rinex import parse_nav, parse_nav_glonass

        with open(args.assist_nav) as f:
            nav_text = f.read()
        n = receiver.world.assist_ephemerides(parse_nav(nav_text))
        n_glo = receiver.world.assist_glonass_ephemerides(
            parse_nav_glonass(nav_text)
        )
        _logger.info("assist-nav %s: %d GPS + %d GLONASS ephemerides loaded",
                     args.assist_nav, n, n_glo)
    if getattr(args, "assist_time", None) is not None:
        # Coarse time (network-time grade, ~minute accuracy is enough):
        # with assist-nav this publishes coarse snapshot fixes before any
        # nav bit is decoded (solve/world.py:_coarse_time_snapshot).
        receiver.world.assist_time(args.assist_time)
        _logger.info("assist-time: stream t=0 is SOW %.1f (coarse)", args.assist_time)

    if args.checkpoint and pathlib.Path(args.checkpoint).exists():
        from gypsum_tpu.runtime.checkpoint import (
            fast_forward,
            load_checkpoint,
            load_dual_checkpoint,
        )

        if dual is not None:
            per_band = load_dual_checkpoint(dual, args.checkpoint)
            for name, secs in per_band.items():
                fast_forward(getattr(dual, name).source, secs)
            stream_s = per_band["gps" if dual.gps is not None else "glonass"]
        else:
            stream_s = load_checkpoint(receiver, args.checkpoint)
            fast_forward(source, stream_s)
        _logger.info("resumed from %s at stream t=%.1fs", args.checkpoint, stream_s)

    visualizer = None
    if args.render_figures or args.show_tracker:
        from gypsum_tpu.obs.visualizer import TrackerVisualizer

        visualizer = TrackerVisualizer(live_window=args.show_tracker)
    if args.web_ui:
        from gypsum_tpu.obs.dashboard_client import DashboardClient

        receiver.add_block_listener(DashboardClient(config.obs, visualizer=visualizer).on_block)
    elif visualizer is not None:  # no dashboard: save PNGs locally
        # No dashboard: drive the renderer directly and save PNGs locally.
        import base64
        import pathlib

        figure_dir = pathlib.Path("tracker_figures")
        figure_dir.mkdir(exist_ok=True)

        def save_figures(recv, report):
            visualizer.on_block(recv, report)
            for prn, png in visualizer.rendered_png_base64.items():
                (figure_dir / f"prn{prn:02d}.png").write_bytes(base64.b64decode(png))

        receiver.add_block_listener(save_figures)
        _logger.info("writing tracker figures to %s/", figure_dir)

    rinex_writers = []
    if args.rinex_obs or args.rinex_nav:
        from gypsum_tpu.obs.rinex import RinexObsWriter

        if args.rinex_obs:
            rinex_writers = [RinexObsWriter(receiver)]
            receiver.add_block_listener(rinex_writers[0].on_block)
            if dual is not None and dual.glonass is not receiver:
                # Dual-band replay: the GLONASS band exports its own rows
                # (R<slot>, incl. C2C when an L2 band rides along); bands
                # merge by epoch at write time. The L2 band itself never
                # gets a writer — its delay surfaces as the L1 rows' C2C.
                w2 = RinexObsWriter(dual.glonass)
                dual.glonass.add_block_listener(w2.on_block)
                rinex_writers.append(w2)

    nmea_writer = None
    if getattr(args, "nmea_out", None):
        from gypsum_tpu.obs.nmea import NmeaWriter

        nmea_writer = NmeaWriter(path=args.nmea_out)
        receiver.add_block_listener(nmea_writer.on_block)

    def narrate(recv, report):
        for hit in report.newly_acquired:
            print(f"[{report.block_start:8.1f}s] acquired PRN {hit.prn}: "
                  f"doppler {hit.doppler_hz:+.1f} Hz, code phase {hit.code_phase_samples}, "
                  f"strength {hit.strength:.1f}")
        for prn in report.dropped_prns:
            print(f"[{report.block_start:8.1f}s] dropped PRN {prn} (lost lock)")
        for prn in report.coasting_prns:
            if prn in report.deep_measured_prns:
                print(f"[{report.block_start:8.1f}s] PRN {prn} deep-integration "
                      f"ranging (signal below loop threshold; measured by "
                      f"block-coherent correlation)")
            else:
                print(f"[{report.block_start:8.1f}s] PRN {prn} coasting open-loop "
                      f"(signal lost; NCOs held by predicted geometry)")
        for prn in report.coast_recovered_prns:
            print(f"[{report.block_start:8.1f}s] PRN {prn} signal returned: "
                  f"ranging resumed in place (vector coast)")
        for prn, ev in report.subframes:
            how = ev.decoded.handover
            print(f"[{report.block_start:8.1f}s] PRN {prn} subframe "
                  f"{how.subframe_id.value} TOW {how.time_of_week_seconds:.0f}s")
        for prn, blk in report.sbas_blocks:
            if blk.message_type == 9:  # GEO navigation (1-line/s otherwise)
                print(f"[{report.block_start:8.1f}s] SBAS PRN {prn} MT9 "
                      f"GEO navigation @ {blk.leading_edge_timestamp:.3f}s")
        for prn, ev in report.glonass_strings:
            if ev.string.m <= 4:  # the ephemeris strings (2 s cadence otherwise)
                print(f"[{report.block_start:8.1f}s] GLONASS k={prn - 208:+d} "
                      f"string {ev.string.m} @ "
                      f"{ev.trailing_edge_receiver_timestamp:.3f}s")
        if report.fix is not None:
            f = report.fix
            vel = ""
            if f.velocity_ecef_mps is not None:
                speed = float(np.linalg.norm(f.velocity_ecef_mps))
                vel = f" |v|={speed:.2f}m/s drift={f.clock_drift_s_per_s * 1e9:.2f}ns/s"
            # EKF coast fixes (< 4 satellites, solve/world.py:_ekf_coast)
            # are labeled so logs distinguish them from least-squares fixes.
            tag = {"lsq": "FIX", "ekf": "COAST", "snapshot": "SNAPSHOT"}.get(
                f.kind, f.kind.upper()
            )
            pl = ""
            if f.protection is not None:
                pl = (f" hpl={f.protection['hpl_m']:.0f}m"
                      f" vpl={f.protection['vpl_m']:.0f}m")
            dgps = f" sbas-corrected={list(f.sbas_corrected)}" if f.sbas_corrected else ""
            dfi = ""
            if f.iono_measured_m:
                vals = list(f.iono_measured_m.values())
                dfi = (f" iono-measured={np.mean(vals):.1f}m"
                       f"@{len(vals)}sv")
            isb = (
                f" isb={f.inter_system_bias_s * 1e9:+.1f}ns"
                if f.inter_system_bias_s is not None
                else ""
            )
            print(f"[{report.block_end:8.1f}s] {tag} lat={f.lat_deg:.6f} lon={f.lon_deg:.6f} "
                  f"alt={f.alt_m:.0f}m bias={f.clock_bias_s * 1e6:.2f}us{vel}{pl}{isb} "
                  f"sats={f.satellites_used}{dgps}{dfi}")

    receiver.add_block_listener(narrate)
    if dual is not None and dual.glonass is not receiver:
        dual.glonass.add_block_listener(narrate)
    try:
        (dual or receiver).run(max_seconds=args.duration, until_fix=args.until_fix)
    finally:
        if args.checkpoint:
            from gypsum_tpu.runtime.checkpoint import (
                save_checkpoint,
                save_dual_checkpoint,
            )

            if dual is not None:
                save_dual_checkpoint(dual, args.checkpoint)
            else:
                save_checkpoint(receiver, args.checkpoint)
            _logger.info("checkpointed to %s at stream t=%.1fs",
                         args.checkpoint, source.seconds_consumed)
    if args.rinex_obs and any(w.epochs for w in rinex_writers):
        from gypsum_tpu.obs.rinex import write_obs_merged

        approx = (receiver.world.position_fixes[-1].ecef
                  if receiver.world.position_fixes else None)
        n_epochs = write_obs_merged(
            args.rinex_obs, [w for w in rinex_writers if w.epochs],
            approx_ecef=approx,
        )
        print(f"wrote RINEX observations: {args.rinex_obs} "
              f"({n_epochs} epochs)")
    if args.rinex_nav:
        from gypsum_tpu.obs.rinex import render_nav

        eph = {p: r.ephemeris for p, r in receiver.world._sats.items()
               if r.ephemeris is not None}
        glo = {p: r.glonass for p, r in receiver.world._sats.items()
               if r.glonass is not None and r.glonass.slot >= 1}
        if eph or glo:
            with open(args.rinex_nav, "w") as f:
                f.write(render_nav(
                    eph, base_week=config.solver.gps_epoch_base_week_number,
                    glonass=glo or None))
            print(f"wrote RINEX navigation: {args.rinex_nav} "
                  f"({len(eph)} GPS + {len(glo)} GLONASS ephemerides)")
    if nmea_writer is not None:
        nmea_writer.close()
        print(f"wrote NMEA log: {args.nmea_out} "
              f"({nmea_writer.n_fixes} fixes, {len(nmea_writer.lines)} sentences)")
    print(f"processed {source.seconds_consumed:.1f}s; "
          f"{receiver.subframe_count} subframes; "
          f"{len(receiver.world.position_fixes)} fixes")
    if receiver.spoofing is not None and receiver.spoofing.alerts:
        kinds = {}
        for a in receiver.spoofing.alerts:
            kinds[a.kind] = kinds.get(a.kind, 0) + 1
        print(f"SPOOFING ALERTS: {len(receiver.spoofing.alerts)} "
              f"({', '.join(f'{k}: {v}' for k, v in sorted(kinds.items()))}) "
              f"— first at t={receiver.spoofing.alerts[0].t:.1f}s")
    # Predicted sky view from everything learned this run (decoded
    # ephemerides + almanac pages relayed off the air, solve/almanac.py).
    sky = receiver.world.predicted_sky(source.seconds_consumed)
    if sky:
        print("predicted sky (el/az/doppler; a=almanac-grade orbit):")
        for prn in sorted(sky, key=lambda p: -sky[p].elevation_deg):
            s = sky[prn]
            vis = "up  " if s.visible else "DOWN"
            print(f"  PRN {prn:2d} {vis} el {s.elevation_deg:6.1f}  "
                  f"az {s.azimuth_deg:5.1f}  doppler {s.doppler_hz:+7.1f} Hz"
                  f"{'  a' if s.from_almanac else ''}")
    return 0


def cmd_acquire(args) -> int:
    glo_file = getattr(args, "glonass_file", None)
    source = (
        _open_glonass_source(glo_file, getattr(args, "glonass_rate", None))
        if glo_file
        else _open_source(args)
    )
    attrs = source.attributes
    if args.deep:
        # High-sensitivity mode (acquire/deep.py): grouped coherent x
        # non-coherent integration over --deep-ms of signal, ~7-10 dB below
        # the 10 ms engine's floor.
        from gypsum_tpu.acquire.deep import DeepAcquisitionEngine
        from gypsum_tpu.core.config import DeepAcquisitionConfig

        cfg = DeepAcquisitionConfig(total_ms=args.deep_ms)
        if glo_file:
            # FDMA family: per-channel f64 pre-rotation over one shared
            # single-code engine (acquire/deep.py:deep_acquire_glonass).
            from gypsum_tpu.acquire.deep import deep_acquire_glonass

            class _GloDeep:
                detection_threshold = 1.0 + cfg.detection_k / np.sqrt(
                    cfg.total_ms // cfg.coherent_ms
                )

                @staticmethod
                def acquire_all(block):
                    return deep_acquire_glonass(
                        block, attrs.sample_rate, attrs.samples_per_prn, cfg
                    )

            engine = _GloDeep()
        else:
            engine = DeepAcquisitionEngine(
                attrs.sample_rate, attrs.samples_per_prn, cfg
            )
        n_ms = cfg.total_ms
    else:
        from gypsum_tpu.acquire.engine import shared_acquisition_engine

        if glo_file:
            from gypsum_tpu.core.constants import (
                GLONASS_L1_CHANNEL_SPACING_HZ,
            )
            from gypsum_tpu.signal.prn import (
                GLONASS_PRN_IDS,
                glonass_frequency_number,
            )

            engine = shared_acquisition_engine(
                attrs.sample_rate, attrs.samples_per_prn,
                prns=GLONASS_PRN_IDS,
                center_offsets_hz=tuple(
                    glonass_frequency_number(p) * GLONASS_L1_CHANNEL_SPACING_HZ
                    for p in GLONASS_PRN_IDS
                ),
            )
        else:
            engine = shared_acquisition_engine(
                attrs.sample_rate, attrs.samples_per_prn
            )
        n_ms = engine.config.integration_period_ms
    _, block = source.read_block(n_ms)
    threshold = getattr(engine, "detection_threshold", None)
    if threshold is None:
        threshold = engine.config.detection_threshold
    hits = []
    for r in engine.acquire_all(block):
        detected = r.strength > threshold
        if detected:
            hits.append(r)
        marker = "*" if detected else " "
        print(f"{marker} PRN {r.prn:2d}: strength {r.strength:6.2f}  "
              f"doppler {r.doppler_hz:+8.1f} Hz  code phase {r.code_phase_samples:4d}")

    # Snapshot (coarse-time) fix from this single acquisition: orbits from a
    # previous session's checkpoint, coarse priors from flags
    # (solve/snapshot.py; the reference must decode for ~18-30 s first).
    if args.snapshot:
        if not args.checkpoint:
            raise SystemExit("--snapshot needs --checkpoint for the orbits")
        from gypsum_tpu.core.config import DEFAULT_CONFIG
        from gypsum_tpu.runtime.receiver import Receiver
        from gypsum_tpu.solve.geodesy import ecef_to_lla, lla_to_ecef
        from gypsum_tpu.solve.snapshot import (
            SnapshotMeasurement,
            orbit_fn_from_records,
            snapshot_fix,
        )

        try:
            lat, lon, alt = (float(x) for x in args.assume_lla.split(","))
        except (AttributeError, ValueError):
            raise SystemExit('--snapshot needs --assume-lla "lat,lon,alt"')
        if args.assume_tow is None:
            raise SystemExit("--snapshot needs --assume-tow (seconds of week)")
        import gzip
        import pickle

        from gypsum_tpu.runtime.checkpoint import CHECKPOINT_VERSION

        with gzip.open(args.checkpoint, "rb") as f:
            blob = pickle.load(f)
        if blob["version"] != CHECKPOINT_VERSION:
            raise SystemExit(
                f"checkpoint version {blob['version']} != {CHECKPOINT_VERSION}"
            )
        sats = {
            p: rec for p, rec in blob["world"]._sats.items() if rec.has_orbit
        }
        meas = [
            SnapshotMeasurement(
                prn=h.prn,
                code_phase_fraction_s=h.code_phase_samples / attrs.sample_rate,
                doppler_hz=h.doppler_hz,
            )
            for h in hits
            if h.prn in sats
        ]
        print(f"snapshot: {len(meas)} usable satellites "
              f"({len(hits) - len(meas)} acquired without stored orbit)")
        sol = snapshot_fix(
            meas, orbit_fn_from_records(sats), args.assume_tow,
            lla_to_ecef(lat, lon, alt),
        )
        if sol is None:
            print("snapshot fix FAILED (need >= 5 usable satellites in basin)")
            return 1
        slat, slon, salt = ecef_to_lla(sol.ecef)
        print(f"SNAPSHOT FIX lat={slat:.6f} lon={slon:.6f} alt={salt:.0f}m "
              f"time_correction={sol.time_correction_s:+.3f}s "
              f"residual={sol.residual_rms_m:.1f}m sats={sol.prns}")
    return 0


def cmd_synth(args) -> int:
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        demo_constellation,
    )
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    prns = [int(p) for p in args.prns] if args.prns else None
    rx = lla_to_ecef(args.lat, args.lon, args.alt)
    velocity = None
    if args.vel:
        try:
            velocity = np.array([float(x) for x in args.vel.split(",")])
            if velocity.shape != (3,):
                raise ValueError
        except ValueError:
            raise SystemExit(f'--vel expects "vx,vy,vz" in m/s, got {args.vel!r}')
    impairments = None
    if (args.bandwidth or args.phase_noise or args.multipath or args.adc_bits
            or args.cw):
        from gypsum_tpu.signal.constellation import RfImpairments

        impairments = RfImpairments(
            frontend_bandwidth_hz=args.bandwidth,
            phase_noise_rad_per_sqrt_s=args.phase_noise or 0.0,
            multipath_delay_s=args.multipath,
            adc_bits=args.adc_bits,
            cw_amplitude=args.cw,
            cw_freq_hz=args.cw_freq,
            cw_chirp_hz_per_s=args.cw_chirp,
        )
    start_sow = args.start_sow if args.start_sow is not None else DEMO_GPS_START_SOW
    if args.glonass_out and args.start_sow is None:
        # A GLONASS frame boundary at t=0 (strings 1-4 in the first 8 s):
        # GPS SOW 21618 maps to GLONASS day time 32400, a 30 s multiple.
        start_sow = 21618.0
    sats = demo_constellation(prns)
    if args.sbas:
        from gypsum_tpu.signal.scenarios import demo_sbas_geo

        sats.append(demo_sbas_geo(args.sbas))
    iono_params = None
    if getattr(args, "iono", False):
        import dataclasses

        from gypsum_tpu.signal.scenarios import demo_iono_page18
        from gypsum_tpu.solve.iono import IonoUtcParams

        page = demo_iono_page18()
        iono_params = IonoUtcParams.from_page(page)
        # GPS satellites broadcast the page so a GPS receiver can decode
        # the model correction; GLONASS has no Klobuchar broadcast — its
        # correction must be MEASURED (synth --glonass-l2-out + replay
        # --glonass-l2-file) or inherited from a GPS band.
        sats = [
            s if not hasattr(s, "sf4") else dataclasses.replace(s, sf4=page)
            for s in sats
        ]
    iq, truth = synthesize_constellation(
        sats, rx, start_sow, args.duration,
        args.rate, noise_sigma=args.noise, receiver_velocity_ecef=velocity,
        tropo=not args.no_tropo, impairments=impairments, iono=iono_params,
    )

    def _write(path, samples):
        if path.endswith(".npy"):
            np.save(path, samples)
        else:
            # Interleaved float32 IQ + JSON sidecar (GNU-Radio-compatible
            # layout, reference: gypsum/radio_input.py:40-43).
            inter = np.empty(2 * len(samples), dtype=np.float32)
            inter[0::2] = samples.real
            inter[1::2] = samples.imag
            inter.tofile(path)
        with open(path + ".json", "w") as f:
            json.dump({"sample_rate": args.rate, "dtype": "float32"}, f)

    _write(args.out, iq)
    if args.rover_out:
        # Second receiver of the SAME scene, offset by --rover-enu: the
        # input pair for the `rtk` subcommand (solve/rtk.py).
        from gypsum_tpu.solve.geodesy import enu_basis

        try:
            de, dn, du = (float(x) for x in args.rover_enu.split(","))
        except (AttributeError, ValueError):
            raise SystemExit('--rover-out needs --rover-enu "east,north,up" (m)')
        east, north, up = enu_basis(rx)
        iq2, _ = synthesize_constellation(
            sats, rx + de * east + dn * north + du * up,
            start_sow + args.rover_clock_offset,
            args.duration, args.rate, noise_sigma=args.noise,
            receiver_velocity_ecef=velocity, tropo=not args.no_tropo,
            impairments=impairments,
            receiver_clock_drift=args.rover_clock_drift,
        )
        _write(args.rover_out, iq2)
        clk = ""
        if args.rover_clock_offset or args.rover_clock_drift:
            clk = (f", independent clock (start {args.rover_clock_offset*1e3:+.3f} ms,"
                   f" drift {args.rover_clock_drift:g})")
        print(f"wrote rover capture {args.rover_out} at ENU offset "
              f"({de}, {dn}, {du}) m{clk}")
    if args.array_out:
        # [N_elements, T] CRPA capture of the same scene, optionally with an
        # arrayed (direction-bearing) jammer (signal/array.py).
        from gypsum_tpu.signal.array import (
            ArrayJammer,
            square_array_enu,
            synthesize_array,
        )

        if args.sbas:
            raise SystemExit("--array-out models the GPS constellation only "
                             "(GEO direction synthesis not wired); drop --sbas")
        jam = None
        if args.jam:
            try:
                az, el = (float(x) for x in args.jam_azel.split(","))
            except ValueError:
                raise SystemExit(f'--jam-azel expects "az,el" deg, got {args.jam_azel!r}')
            jam = ArrayJammer(azimuth_deg=az, elevation_deg=el,
                              amplitude=args.jam, kind=args.jam_kind)
        elements = square_array_enu(
            *( [args.array_spacing] if args.array_spacing else [] )
        )
        arr, _ = synthesize_array(
            sats, rx, start_sow, args.duration, args.rate,
            elements_enu=elements, noise_sigma=args.noise, jammer=jam,
            tropo=not args.no_tropo,
        )
        if not args.array_out.endswith(".npy"):
            raise SystemExit("--array-out must be a .npy path (2-D capture)")
        np.save(args.array_out, arr)
        with open(args.array_out + ".json", "w") as f:
            json.dump({"sample_rate": args.rate, "dtype": "complex64",
                       "elements": len(elements),
                       "elements_enu": elements.tolist()}, f)
        jam_note = (f", {args.jam_kind} jammer amp {args.jam} from "
                    f"({args.jam_azel}) deg" if jam else "")
        print(f"wrote {len(elements)}-element array capture {args.array_out}"
              f"{jam_note}")

    if args.glonass_out:
        # The same scene's GLONASS L1OF band (a second front end at
        # 1602 MHz): FDMA channels from the demo look set, plus a residual
        # inter-system time offset the receiver must SOLVE (the dual-band
        # fix's isb output).
        from gypsum_tpu.signal.scenarios import demo_glonass_constellation

        ks = (
            [int(k) for k in args.glonass_ks]
            if args.glonass_ks
            else [-2, -1, 0, 1, 2]
        )
        glo_sats = demo_glonass_constellation(ks)
        glo_iq, glo_truth = synthesize_constellation(
            glo_sats, rx, start_sow, args.duration,
            args.glonass_rate, noise_sigma=args.noise,
            receiver_velocity_ecef=velocity, tropo=not args.no_tropo,
            glonass_time_offset_s=args.glonass_time_offset, iono=iono_params,
        )
        if args.glonass_out.endswith(".npy"):
            np.save(args.glonass_out, glo_iq)
        else:
            inter = np.empty(2 * len(glo_iq), dtype=np.float32)
            inter[0::2] = glo_iq.real
            inter[1::2] = glo_iq.imag
            inter.tofile(args.glonass_out)
        with open(args.glonass_out + ".json", "w") as f:
            json.dump({"sample_rate": args.glonass_rate, "dtype": "float32"}, f)
        print(f"wrote GLONASS band {args.glonass_out}: {args.duration}s @ "
              f"{args.glonass_rate:.0f} Hz, channels k={ks}, inter-system "
              f"offset {args.glonass_time_offset * 1e9:.0f} ns")
        if getattr(args, "glonass_l2_out", None):
            # The SAME scene's L2OF band (1246 MHz front end): identical
            # geometry/clocks, iono group delay scaled by (f_l1/f_l2)^2 —
            # the coherent capture pair the dual-frequency measured-iono
            # path (replay --glonass-l2-file) differences.
            l2_iq, _ = synthesize_constellation(
                glo_sats, rx, start_sow, args.duration,
                args.glonass_rate, noise_sigma=args.noise,
                receiver_velocity_ecef=velocity, tropo=not args.no_tropo,
                glonass_time_offset_s=args.glonass_time_offset,
                iono=iono_params, glonass_band="l2",
            )
            np.save(args.glonass_l2_out, l2_iq)
            with open(args.glonass_l2_out + ".json", "w") as f:
                json.dump(
                    {"sample_rate": args.glonass_rate, "dtype": "complex64"}, f
                )
            print(f"wrote GLONASS L2 band {args.glonass_l2_out}: "
                  f"{args.duration}s @ {args.glonass_rate:.0f} Hz")
    print(f"wrote {args.out}: {args.duration}s @ {args.rate:.0f} Hz, "
          f"PRNs {[s for s in truth.doppler_hz]}")
    for prn in truth.doppler_hz:
        print(f"  PRN {prn}: doppler {truth.doppler_hz[prn]:+.1f} Hz, "
              f"code phase {truth.code_phase_samples[prn]:.1f}, "
              f"transit {truth.transit_time_s[prn] * 1e3:.3f} ms")
    return 0


def cmd_rtk(args) -> int:
    """Dual-receiver carrier-phase baseline (RTK, solve/rtk.py): run the full
    receiver over the base and rover captures, double-difference the carrier,
    fix the integer ambiguities, print the centimeter-level baseline."""
    import argparse as _ap

    from gypsum_tpu.core.config import DEFAULT_CONFIG
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.solve.geodesy import enu_basis, lla_to_ecef
    from gypsum_tpu.solve.rtk import (
        CarrierPhaseLog,
        dd_from_rinex,
        form_double_differences,
        solve_baseline,
        solve_kinematic,
        sv_position_fn_from_ephemerides,
    )

    prns = [int(p) for p in args.prns] if args.prns else None
    if args.attitude is not None and args.kinematic:
        # Silent preemption confused users: --attitude IS a per-epoch
        # (kinematic) solve of the antenna axis, so the flags are exclusive.
        raise SystemExit("--attitude and --kinematic are exclusive modes "
                         "(attitude already solves per-epoch); drop one")

    def print_attitude(dd, sv_fn, base_ecef) -> int:
        """--attitude: per-epoch heading/pitch of the base->rover antenna
        axis, the known separation validating/arbitrating the fix."""
        from gypsum_tpu.solve.attitude import solve_attitude

        sol = solve_attitude(dd, sv_fn, base_ecef, separation_m=args.attitude,
                             ratio_threshold=args.ratio)
        for t, h, pch, ln in zip(sol.epochs_s, sol.heading_deg,
                                 sol.pitch_deg, sol.length_m):
            print(f"[{t:8.2f}s] heading {h:7.3f} deg  pitch {pch:+7.3f} deg"
                  f"  |b| {ln:.3f} m")
        print(f"attitude {'FIXED' if sol.fixed else 'FLOAT'}"
              f" (by {sol.fixed_by}, ratio {sol.ratio:.1f}, "
              f"length RMS {sol.length_rms_m*1e3:.1f} mm vs "
              f"{args.attitude:.3f} m separation, "
              f"{sol.n_length_consistent} length-consistent candidate(s), "
              f"ref PRN {sol.ref_prn})")
        print(f"attitude formal sigma (per-epoch mean): heading "
              f"{np.mean(sol.sigma_heading_deg):.3f} deg, pitch "
              f"{np.mean(sol.sigma_pitch_deg):.3f} deg, length "
              f"{sol.sigma_length_m*1e3:.1f} mm")
        if sol.mount_alarm:
            print("attitude MOUNT ALARM: phases fixed decisively but the "
                  "implied baseline length contradicts the claimed "
                  "separation — check --attitude SEP_M and mount rigidity")
        return 0 if sol.fixed else 3

    if args.base_rinex or args.rover_rinex:
        # Interop path: standard RINEX observation files (any receiver that
        # logs C1C+L1C) + a RINEX NAV for the orbits.
        if not (args.base_rinex and args.rover_rinex and args.nav):
            raise SystemExit("RINEX mode needs --base-rinex, --rover-rinex "
                             "and --nav together")
        from gypsum_tpu.obs.rinex import parse_nav

        with open(args.nav) as f:
            eph = parse_nav(f.read())
        sv_fn = sv_position_fn_from_ephemerides(eph, 0.0)  # epochs are SOW
        with open(args.base_rinex) as fb, open(args.rover_rinex) as fr:
            dd = dd_from_rinex(fb.read(), fr.read(), prns=prns)
        base_ecef = lla_to_ecef(*args.base_lla)
        if args.attitude is not None:
            return print_attitude(dd, sv_fn, base_ecef)
        east, north, up = enu_basis(base_ecef)
        sol = solve_baseline(dd, sv_fn, base_ecef, ratio_threshold=args.ratio)
        for label, b in (("float", sol.baseline_float_m),
                         ("fixed", sol.baseline_fixed_m)):
            if b is None:
                continue
            print(f"{label} baseline ENU: ({b @ east:+.3f}, {b @ north:+.3f}, "
                  f"{b @ up:+.3f}) m  |b| = {np.linalg.norm(b):.3f} m")
        print(f"ambiguities {'FIXED' if sol.fixed else 'FLOAT'} "
              f"(ratio {sol.ratio:.1f}, bootstrap {sol.bootstrap_success:.4f}, "
              f"{sol.n_epochs} epochs, ref PRN {sol.ref_prn})")
        return 0 if sol.fixed else 3

    if not (args.base_file and args.rover_file):
        raise SystemExit("provide --base-file/--rover-file captures, or the "
                         "RINEX trio --base-rinex/--rover-rinex/--nav")
    logs, receivers = [], []
    for name, path in (("base", args.base_file), ("rover", args.rover_file)):
        ns = _ap.Namespace(file=path, format=args.format,
                           sample_rate=args.sample_rate, rtlsdr=False)
        source = _open_source(ns)
        recv = Receiver(source, DEFAULT_CONFIG, eligible_prns=prns)
        log = CarrierPhaseLog(recv.sample_rate, recv.samples_per_prn,
                              recv.config.tracking)
        recv.add_block_listener(log.listener())
        _logger.info("processing %s capture %s ...", name, path)
        recv.run(max_seconds=args.duration)
        logs.append(log)
        receivers.append(recv)

    # Satellite positions from the base receiver's decoded ephemerides; its
    # clock slide maps stream time to GPS seconds-of-week.
    world = receivers[0].world
    eph = {p: r.ephemeris for p, r in world._sats.items() if r.ephemeris is not None}
    if world.receiver_clock_slide is None or len(eph) < 4:
        raise SystemExit(
            f"base capture decoded {len(eph)} ephemerides and "
            f"{'no' if world.receiver_clock_slide is None else 'a'} time base; "
            "need >=4 ephemerides (longer capture?)"
        )
    sv_fn = sv_position_fn_from_ephemerides(eph, world.receiver_clock_slide)
    base_ecef = lla_to_ecef(*args.base_lla)

    alignment = None
    if args.independent_clocks:
        # Whole-ms part of the stream offset from each receiver's own decoded
        # time base (GPS = stream + slide  =>  r_b = r_v + slide_v - slide_b);
        # the estimator refines the sub-ms offset and the relative drift from
        # the observables. The rover's own code fix (meter-level) removes the
        # SD geometry term, keeping long baselines unbiased.
        from gypsum_tpu.solve.rtk import estimate_stream_alignment

        world_v = receivers[1].world
        if world_v.receiver_clock_slide is None:
            raise SystemExit("--independent-clocks needs the rover to decode "
                             "a time base too (longer capture?)")
        coarse = world_v.receiver_clock_slide - world.receiver_clock_slide
        sd_range_fn = None
        if world_v.position_fixes:
            rover_hint = np.asarray(world_v.position_fixes[-1].ecef)

            def sd_range_fn(p, t):
                sv = sv_fn(p, t)
                return float(np.linalg.norm(sv - rover_hint)
                             - np.linalg.norm(sv - base_ecef))

        alignment = estimate_stream_alignment(
            logs[0], logs[1], prns=sorted(eph), coarse_offset_s=coarse,
            sd_range_fn=sd_range_fn,
        )
        print(f"stream alignment: rover starts {alignment.offset_s*1e3:+.4f} ms "
              f"into the base stream, relative drift {alignment.drift:+.3g} "
              f"(sigma {alignment.sigma_offset_s*1e9:.0f} ns, "
              f"{alignment.n_satellites} SVs)")

    dd = form_double_differences(
        logs[0], logs[1], prns=sorted(eph),
        epoch_every_ms=args.epoch_every_ms,
        alignment=alignment,
    )
    if args.attitude is not None:
        return print_attitude(dd, sv_fn, base_ecef)
    east, north, up = enu_basis(base_ecef)
    if args.kinematic:
        sol = solve_kinematic(dd, sv_fn, base_ecef, ratio_threshold=args.ratio)
        for t, b in zip(sol.epochs_s, sol.baselines_fixed_m):
            print(f"[{t:8.2f}s] baseline ENU ({b @ east:+.3f}, "
                  f"{b @ north:+.3f}, {b @ up:+.3f}) m")
        print(f"ambiguities {'FIXED' if sol.fixed else 'FLOAT'} "
              f"(ratio {sol.ratio:.1f}, {len(sol.epochs_s)} epochs, "
              f"ref PRN {sol.ref_prn}, DD PRNs {sol.prns})")
        return 0 if sol.fixed else 3

    sol = solve_baseline(dd, sv_fn, base_ecef, ratio_threshold=args.ratio)
    for label, b in (("float", sol.baseline_float_m), ("fixed", sol.baseline_fixed_m)):
        if b is None:
            continue
        enu = (float(b @ east), float(b @ north), float(b @ up))
        print(f"{label} baseline ENU: ({enu[0]:+.3f}, {enu[1]:+.3f}, "
              f"{enu[2]:+.3f}) m  |b| = {np.linalg.norm(b):.3f} m")
    print(f"ambiguities {'FIXED' if sol.fixed else 'FLOAT'} "
          f"(ratio {sol.ratio:.1f}, {sol.n_epochs} epochs, "
          f"ref PRN {sol.ref_prn}, DD PRNs {sol.prns}, "
          f"phase RMS {sol.phase_rms_half_cycles:.3f} half-cycles)")
    return 0 if sol.fixed else 3


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname).1s %(name)s: %(message)s")
    parser = argparse.ArgumentParser(prog="gypsum_tpu")
    parser.add_argument(
        "--platform",
        choices=["cpu", "tpu"],
        default=None,
        help="force the JAX backend (this environment's TPU plugin ignores "
        "the JAX_PLATFORMS environment variable, so use this flag)",
    )
    parser.add_argument(
        "--profile-dir",
        default=None,
        help="capture a jax.profiler trace of the run into this directory "
        "(open with TensorBoard / Perfetto)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("replay", help="run the full receiver over a capture")
    _add_file_source_args(p)
    p.add_argument("--prns", nargs="*", help="restrict acquisition to these PRNs "
                   "(reference: --only_acquire_satellite_ids)")
    p.add_argument("--sbas", action="store_true",
                   help="also search the SBAS GEO family (PRNs 120-138)")
    p.add_argument("--duration", type=float, default=None, help="seconds of signal to process")
    p.add_argument("--until-fix", action="store_true", help="stop at the first position fix")
    p.add_argument("--block-ms", type=int, default=None, help="tracking block size")
    p.add_argument("--hrc", action="store_true",
                   help="multipath-resistant pseudoranges: double-delta (HRC) "
                        "code-phase measurement instead of triangle vertex "
                        "interpolation. Needs >= 4 samples/chip (>= ~4.1 Msps "
                        "GPS) to help; see TrackingConfig.code_phase_measurement")
    p.add_argument("--assist-nav", default=None, metavar="PATH",
                   help="assisted start: load broadcast ephemerides from a "
                        "RINEX 3 NAV file (e.g. a previous run's --rinex-nav "
                        "export) — first fix right after the first handover "
                        "word instead of after full subframe 1-3 decode")
    p.add_argument("--assist-time", type=float, default=None, metavar="SOW",
                   help="coarse GPS seconds-of-week of the stream start "
                        "(±1 min is fine): with --assist-nav, snapshot fixes "
                        "are published before any nav bit is decoded")
    p.add_argument("--web-ui", action="store_true", help="push state to the web dashboard")
    p.add_argument("--render-figures", action="store_true",
                   help="render the 20-panel per-satellite tracker figures (pushed to the "
                   "web dashboard with --web-ui, else saved to tracker_figures/)")
    p.add_argument("--show-tracker", action="store_true",
                   help="live matplotlib tracker window per satellite "
                   "(reference: --present_matplotlib_sat_tracker)")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint file: resumed from if it exists, written on exit "
                   "(the reference always cold-starts, SURVEY.md §5)")
    p.add_argument("--rinex-obs", default=None, metavar="PATH",
                   help="export observables (C1C/L1C/D1C/S1C) as RINEX 3.04")
    p.add_argument("--glonass-file", default=None, metavar="PATH",
                   help="GLONASS L1OF band capture (second front end at "
                   "1602 MHz): with --file, a dual-constellation replay "
                   "whose fix solves the GPS-GLONASS inter-system bias; "
                   "alone, a GLONASS-only replay")
    p.add_argument("--glonass-rate", type=float, default=None,
                   help="GLONASS capture sample rate (else sidecar; 4.092e6 for .npy)")
    p.add_argument("--glonass-l2-file", default=None, metavar="PATH",
                   help="GLONASS L2OF band capture (third front end at "
                   "1246 MHz, same 511-chip code): tracked but never "
                   "decoded — the per-SV L2-L1 code-delay difference is the "
                   "MEASURED ionospheric correction (requires "
                   "--glonass-file)")
    p.add_argument("--nmea-out", default=None, metavar="PATH",
                   help="stream NMEA 0183 sentences (GGA/GSA/RMC/VTG/GSV/ZDA"
                        " per fix) to PATH, line-buffered (obs/nmea.py)")
    p.add_argument("--rinex-nav", default=None, metavar="PATH",
                   help="export decoded broadcast ephemerides as RINEX 3.04 NAV")
    p.set_defaults(fn=cmd_replay)

    p = sub.add_parser("acquire", help="one-shot acquisition report over 10 ms")
    p.add_argument("--glonass-file", default=None, metavar="PATH",
                   help="acquire over a GLONASS L1OF band capture instead "
                   "(FDMA sub-band sweep; with --deep, the per-channel "
                   "f64-rotated deep search)")
    p.add_argument("--glonass-rate", type=float, default=None,
                   help="GLONASS capture sample rate (else sidecar; 4.092e6 for .npy)")
    p.add_argument("--deep", action="store_true",
                   help="high-sensitivity search: grouped coherent x "
                        "non-coherent integration over --deep-ms (~7-10 dB "
                        "below the 10 ms engine; pairs well with --snapshot)")
    p.add_argument("--deep-ms", type=int, default=200,
                   help="milliseconds integrated in --deep mode")
    p.add_argument("--snapshot", action="store_true",
                   help="coarse-time fix from this acquisition alone "
                        "(orbits from --checkpoint, priors from --assume-*)")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint file holding decoded orbits (for --snapshot)")
    p.add_argument("--assume-lla", default=None, metavar="LAT,LON,ALT",
                   help="coarse position prior, ~100 km basin")
    p.add_argument("--assume-tow", type=float, default=None,
                   help="coarse GPS time prior (seconds of week, ~1 min basin)")
    _add_file_source_args(p)
    p.set_defaults(fn=cmd_acquire)

    p = sub.add_parser("synth", help="generate a synthetic multi-SV capture")
    p.add_argument("--out", required=True, help=".npy or raw interleaved f32 (+.json sidecar)")
    p.add_argument("--duration", type=float, default=40.0)
    p.add_argument("--rate", type=float, default=2.046e6)
    p.add_argument("--noise", type=float, default=0.35)
    p.add_argument("--prns", nargs="*")
    p.add_argument("--lat", type=float, default=51.5)
    p.add_argument("--lon", type=float, default=-0.1)
    p.add_argument("--alt", type=float, default=80.0)
    p.add_argument("--vel", default=None,
                   help='receiver ECEF velocity "vx,vy,vz" in m/s (default static)')
    p.add_argument("--no-tropo", action="store_true",
                   help="omit the (default) Saastamoinen tropospheric delay")
    p.add_argument("--bandwidth", type=float, default=None,
                   help="front-end low-pass cutoff in Hz (RF impairment)")
    p.add_argument("--phase-noise", type=float, default=None,
                   help="TCXO phase-noise random walk in rad/sqrt(s)")
    p.add_argument("--multipath", type=float, default=None,
                   help="one multipath ray at this excess delay (seconds)")
    p.add_argument("--adc-bits", type=int, default=None,
                   help="quantize the capture to this many ADC bits per component")
    p.add_argument("--cw", type=float, default=None, metavar="AMPLITUDE",
                   help="inject a CW jammer of this amplitude (satellites are "
                        "~1, noise sigma ~0.3; try 10-30 — then replay with "
                        "--notch)")
    p.add_argument("--cw-freq", type=float, default=257e3,
                   help="jammer baseband offset in Hz")
    p.add_argument("--cw-chirp", type=float, default=0.0,
                   help="jammer sweep rate in Hz/s (swept interference)")
    p.add_argument("--sbas", type=int, nargs="?", const=120, default=None,
                   metavar="PRN",
                   help="add an SBAS GEO (PRN 120-138; replay it with "
                        "--prns <gps...> <PRN> to widen the search family)")
    p.add_argument("--rover-out", default=None,
                   help="also write a second capture of the same scene from "
                        "an offset receiver (the `rtk` subcommand's input)")
    p.add_argument("--rover-enu", default=None, metavar="E,N,U",
                   help='rover offset from the base in meters, e.g. "12,-5,0"')
    p.add_argument("--rover-clock-offset", type=float, default=0.0,
                   help="rover sampling starts this many seconds later in GPS "
                        "time (independent clock; pair with `rtk "
                        "--independent-clocks`)")
    p.add_argument("--start-sow", type=float, default=None,
                   help="GPS seconds-of-week of the scene start (default "
                   "21600; --glonass-out defaults to 21618 so a GLONASS "
                   "frame boundary lands at t=0)")
    p.add_argument("--array-out", default=None, metavar="PATH",
                   help="also write an [elements, samples] .npy antenna-array "
                        "capture of the scene (signal/array.py) — the input "
                        "for `acquire/replay --beamform` CRPA jammer nulling")
    p.add_argument("--array-spacing", type=float, default=None, metavar="M",
                   help="array element spacing in meters (default L1 "
                        "half-wavelength, ~0.095 m; 4-element square)")
    p.add_argument("--jam", type=float, default=None, metavar="AMPLITUDE",
                   help="arrayed interferer amplitude entering --array-out "
                        "(kind/direction below); unlike --cw this one has a "
                        "DIRECTION, so the CRPA can null it")
    p.add_argument("--jam-kind", default="noise", choices=("noise", "cw"),
                   help="arrayed interferer kind: broadband noise (the kind "
                        "--notch cannot excise) or a CW tone")
    p.add_argument("--jam-azel", default="135,5", metavar="AZ,EL",
                   help="arrayed interferer direction (deg az clockwise from "
                        "north, deg elevation; default a terrestrial 135,5)")
    p.add_argument("--glonass-out", default=None, metavar="PATH",
                   help="also write the scene's GLONASS L1OF band (a second "
                   "front end at 1602 MHz) to this path")
    p.add_argument("--glonass-ks", nargs="*", default=None,
                   help="GLONASS FDMA frequency numbers to put on air "
                   "(default -2 -1 0 1 2)")
    p.add_argument("--glonass-rate", type=float, default=4.092e6)
    p.add_argument("--glonass-l2-out", default=None, metavar="PATH",
                   help="also write the GLONASS scene's L2OF band (1246 MHz "
                   "front end, .npy) — the dual-frequency capture pair for "
                   "replay --glonass-l2-file (requires --glonass-out)")
    p.add_argument("--iono", action="store_true",
                   help="inject a daytime Klobuchar ionosphere into every "
                   "band (GPS satellites broadcast the page-18 parameters; "
                   "GLONASS bands carry the (f_l1/f)^2-scaled group delay)")
    p.add_argument("--glonass-time-offset", type=float, default=8e-7,
                   help="residual GPS->GLONASS time offset (s) the dual-band "
                   "receiver must solve (default 800 ns)")
    p.add_argument("--rover-clock-drift", type=float, default=0.0,
                   help="rover fractional oscillator frequency error "
                        "(e.g. 2e-8)")
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser(
        "rtk",
        help="centimeter-level baseline between two simultaneous captures "
             "(double-differenced carrier phase, integer ambiguity fixing)",
    )
    p.add_argument("--base-file", default=None, help="base receiver capture")
    p.add_argument("--rover-file", default=None, help="rover receiver capture")
    p.add_argument("--base-rinex", default=None,
                   help="base RINEX 3 observation file (instead of a capture)")
    p.add_argument("--rover-rinex", default=None,
                   help="rover RINEX 3 observation file")
    p.add_argument("--nav", default=None,
                   help="RINEX 3 navigation file for the orbits (RINEX mode)")
    p.add_argument("--base-lla", type=float, nargs=3, required=True,
                   metavar=("LAT", "LON", "ALT"),
                   help="known base position (deg, deg, m)")
    p.add_argument("--format", default=None,
                   help="named capture format for both files (see replay)")
    p.add_argument("--sample-rate", type=float, default=None)
    p.add_argument("--prns", nargs="*", default=None)
    p.add_argument("--duration", type=float, default=None,
                   help="process at most this many seconds of each capture")
    p.add_argument("--epoch-every-ms", type=int, default=250)
    p.add_argument("--ratio", type=float, default=2.0,
                   help="integer-fix acceptance ratio (2nd-best/best cost)")
    p.add_argument("--kinematic", action="store_true",
                   help="moving rover: per-epoch baselines (shared ambiguities)")
    p.add_argument("--attitude", type=float, default=None, metavar="SEP_M",
                   help="dual-antenna attitude: known antenna separation in "
                        "meters; prints per-epoch heading/pitch of the "
                        "base->rover axis (solve/attitude.py)")
    p.add_argument("--independent-clocks", action="store_true",
                   help="receivers sample on their own oscillators: estimate "
                        "the stream offset/drift from the observables and "
                        "interpolate the rover onto the base epochs")
    p.set_defaults(fn=cmd_rtk)

    p = sub.add_parser("bench", help="run the tracked-throughput benchmark")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    # Persistent compilation cache: later runs deserialize compiled programs
    # instead of recompiling (multi-minute TPU cold starts -> seconds).
    # Skipped for synth: it is numpy-only, and enable_persistent_cache's
    # backend query would initialize the TPU plugin — on this environment
    # that blocks for the full tunnel warmup (minutes) before a single
    # sample is synthesized.
    if args.command != "synth":
        from gypsum_tpu.core.compile_cache import enable_persistent_cache

        enable_persistent_cache()
    if args.profile_dir:
        import jax

        with jax.profiler.trace(args.profile_dir):
            return args.fn(args)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

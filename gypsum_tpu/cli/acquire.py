"""``acquire`` subcommand: one-shot acquisition report over 10 ms."""

from __future__ import annotations

import numpy as np

from gypsum_tpu.cli.sources import _open_glonass_source, _open_source

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



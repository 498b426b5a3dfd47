"""Shared CLI source-opening helpers (file formats, GLONASS sources).

Split out of the monolithic cli.py in round 5; every ``cmd_*`` module and
the parser builder import from here.
"""

from __future__ import annotations

import argparse
import json
import logging

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



"""Argument parser and entry point for the gypsum-tpu CLI.

Reference parity: gypsum-cli.py (replay loop with --file_name /
--only_acquire_satellite_ids / UI flags), extended with subcommands the
reference lacks: one-shot acquisition reports, synthetic capture generation,
RTK, and the benchmark. Split into a package in round 5 (the monolith hit
1,261 lines); ``gypsum_tpu.cli`` remains the public import path.

Usage:
    python -m gypsum_tpu replay --file capture.iq [--prns 25 28] [--web-ui]
    python -m gypsum_tpu acquire --file capture.iq
    python -m gypsum_tpu synth --out capture.iq --duration 40
    python -m gypsum_tpu bench
"""

from __future__ import annotations

import argparse
import logging
import sys

from gypsum_tpu.cli.acquire import cmd_acquire
from gypsum_tpu.cli.replay import cmd_replay
from gypsum_tpu.cli.rtk import cmd_rtk
from gypsum_tpu.cli.sources import _add_file_source_args
from gypsum_tpu.cli.synth import cmd_synth

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

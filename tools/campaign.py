"""Randomized end-to-end campaign: synthesize many receiver scenarios with
known ground truth and verify the full chain (acquire -> track -> decode ->
fix) lands on it.

This is the harness that exposed the integer-millisecond pseudorange slip
(see WorldModel._repair_millisecond_ambiguities): single hand-picked e2e
scenes pass for years while a 1-in-30 bit-phase outcome silently moves the
fix 300 km. Each trial randomizes the constellation size, receiver
position/velocity, oscillator drift, noise level, and block size, then
asserts the first fix (position and, when present, velocity) against the
synthesized truth. Failures dump the full scenario parameters so they can be
replayed verbatim as a regression test (tests/test_end_to_end.py shows the
pattern).

The reference has no analogue — its only end-to-end check is a replay of one
vendored recording (reference: README.md:23-35, gypsum/radio_input.py:101-105).

Usage:
    python tools/campaign.py --trials 30 --jobs 4 --out /tmp/campaign.jsonl
    python tools/campaign.py --replay-seed 1234   # re-run one trial verbosely
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import os
import sys
import time
from dataclasses import asdict, dataclass

# Campaigns are CPU-only: trials fork worker processes, and the TPU tunnel
# (single real chip, minutes-long warmup) must never be touched from them.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tightened 75 -> 15 m after the drift-projected median pseudoranges +
# atmospheric corrections (round 2): typical scenario error is now
# sub-meter to a few meters, so 15 m still catches any systematic while
# leaving margin for hard 4-SV geometries.
POSITION_TOLERANCE_M = 15.0
VELOCITY_TOLERANCE_MPS = 2.0


@dataclass(frozen=True)
class Scenario:
    """Everything needed to reproduce one trial bit-for-bit."""

    seed: int
    prns: tuple[int, ...]
    lat_deg: float
    lon_deg: float
    alt_m: float
    velocity_ecef: tuple[float, float, float]
    clock_drift: float  # s/s
    noise_sigma: float
    duration_s: float
    block_size_ms: int
    impairment: str = "none"  # key into IMPAIRMENT_LEVELS
    # Optionally add an SBAS GEO (PRN 120-138) broadcasting MT9: exercises
    # the family-widened acquisition/tracking, the DO-229 decode stack, and
    # GEO ranging across random geometry.
    sbas_prn: int | None = None
    # SBAS fast-correction fault injection: ((gps_prn, bias_m), ...) —
    # each listed SV's signal carries an unmodeled clock error the GEO's
    # MT1+MT2 broadcast corrects (solve/sbas_corrections.py). Only set when
    # sbas_prn is present.
    sbas_fast_bias_m: tuple[tuple[int, float], ...] = ()


def _impairment_levels():
    """RF-impairment gauntlet levels (VERDICT round-1 item 6). Each level is
    an RfImpairments the trial's synthesis runs through; 'full' stacks a
    realistic rtl-sdr front end: +/-700 kHz filter, TCXO phase noise, one
    120 m multipath ray at half amplitude, 8-bit ADC."""
    from gypsum_tpu.signal.constellation import RfImpairments

    return {
        "none": None,
        "bandlimit": RfImpairments(frontend_bandwidth_hz=700e3),
        "phase_noise": RfImpairments(phase_noise_rad_per_sqrt_s=0.5),
        "multipath": RfImpairments(
            multipath_delay_s=0.4e-6, multipath_amplitude=0.5
        ),
        "adc2": RfImpairments(adc_bits=2),
        "full": RfImpairments(
            frontend_bandwidth_hz=700e3,
            phase_noise_rad_per_sqrt_s=0.3,
            multipath_delay_s=0.4e-6,
            multipath_amplitude=0.4,
            adc_bits=8,
        ),
        # CW / swept jammers (ops/interference.py): trials at these levels
        # run through the excision front end (NotchingSampleSource) — the
        # pass criterion is unchanged: fix to tolerance THROUGH the jammer.
        "cw": RfImpairments(cw_amplitude=10.0, cw_freq_hz=-151e3),
        "cw_swept": RfImpairments(
            cw_amplitude=8.0, cw_freq_hz=120e3, cw_chirp_hz_per_s=500.0
        ),
    }


IMPAIRMENT_LEVELS = tuple(
    ["none", "bandlimit", "phase_noise", "multipath", "adc2", "full",
     "cw", "cw_swept"]
)


def make_scenario(seed: int, impairment: str = "none") -> Scenario:
    """Deterministically derive a random-but-plausible scenario from a seed.

    Bounds: receiver within ~3 deg of the demo site (keeps all eight
    ephemeris slots above the horizon — signal/scenarios.py slots 0-7),
    pedestrian-to-highway speeds, oscillator drift to 0.2 ppm (a mediocre
    TCXO), noise spanning comfortable to weak-signal margins.
    """
    rng = np.random.default_rng(seed)
    n_sats = int(rng.integers(4, 9))  # 4..8
    prns = tuple(int(p) for p in rng.choice(np.arange(1, 33), size=n_sats, replace=False))
    lat = 51.5 + float(rng.uniform(-3.0, 3.0))
    lon = -0.1 + float(rng.uniform(-3.0, 3.0))
    alt = float(rng.uniform(0.0, 500.0))
    if rng.random() < 0.5:
        speed = float(rng.uniform(0.0, 40.0))
        direction = rng.normal(size=3)
        direction /= np.linalg.norm(direction)
        vel = tuple(float(v) for v in speed * direction)
    else:
        vel = (0.0, 0.0, 0.0)
    drift = float(rng.uniform(-2e-7, 2e-7)) if rng.random() < 0.5 else 0.0
    noise = float(rng.uniform(0.25, 0.45))
    duration = float(rng.uniform(26.0, 32.0))
    block_ms = int(rng.choice([200, 500]))
    sbas_prn = int(rng.integers(120, 139)) if rng.random() < 0.33 else None
    fast_bias: tuple[tuple[int, float], ...] = ()
    if sbas_prn is not None and rng.random() < 0.7:
        k = min(2, len(prns))
        biased = rng.choice(np.array(prns), size=k, replace=False)
        fast_bias = tuple(
            (int(p), float(rng.uniform(5.0, 15.0) * rng.choice([-1.0, 1.0])))
            for p in biased
        )
    return Scenario(
        seed, prns, lat, lon, alt, vel, drift, noise, duration, block_ms,
        impairment=impairment, sbas_prn=sbas_prn, sbas_fast_bias_m=fast_bias,
    )


# Set by --no-resync-cutoff (inherited by forked pool workers): disables the
# reference's 40 s bit-phase-resync band-aid
# (NavConfig.bit_phase_resync_cutoff_s; reference:
# gypsum/navigation_bit_intergrator.py:281-282) so the campaign can measure
# whether the root-cause fixes in nav/bits.py made it redundant.
NO_RESYNC_CUTOFF = False


def run_trial(seed: int, impairment: str = "none") -> dict:
    """Synthesize the scenario, run the receiver to first fix, judge it."""
    from gypsum_tpu.core.config import NavConfig, ReceiverConfig, TrackingConfig
    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    sc = make_scenario(seed, impairment)
    result: dict = {"scenario": asdict(sc)}
    t0 = time.monotonic()
    try:
        rx = lla_to_ecef(sc.lat_deg, sc.lon_deg, sc.alt_m)
        vel = np.array(sc.velocity_ecef)
        sats = demo_constellation(list(sc.prns))
        eligible = None
        if sc.sbas_prn is not None:
            import dataclasses

            from gypsum_tpu.signal.prn import ALL_PRN_IDS
            from gypsum_tpu.signal.scenarios import demo_sbas_geo

            geo = demo_sbas_geo(sc.sbas_prn)
            if sc.sbas_fast_bias_m:
                biases = dict(sc.sbas_fast_bias_m)
                sats = [
                    dataclasses.replace(
                        s, unmodeled_clock_error_m=biases.get(s.prn, 0.0)
                    )
                    for s in sats
                ]
                geo = dataclasses.replace(geo, fast_corrections=biases)
            sats.append(geo)
            eligible = list(ALL_PRN_IDS) + [sc.sbas_prn]
        iq, _truth = synthesize_constellation(
            sats,
            rx,
            DEMO_GPS_START_SOW,
            sc.duration_s,
            2.046e6,
            noise_sigma=sc.noise_sigma,
            seed=sc.seed,
            receiver_velocity_ecef=vel if np.any(vel) else None,
            receiver_clock_drift=sc.clock_drift,
            impairments=_impairment_levels()[sc.impairment],
        )
        cfg = ReceiverConfig(tracking=TrackingConfig(block_size_ms=sc.block_size_ms))
        if NO_RESYNC_CUTOFF:
            cfg = ReceiverConfig(
                tracking=cfg.tracking,
                nav=NavConfig(bit_phase_resync_cutoff_s=float("inf")),
            )
        source = ArraySampleSource(iq, 2.046e6)
        if sc.impairment.startswith("cw"):
            from gypsum_tpu.io.sources import NotchingSampleSource

            source = NotchingSampleSource(source)
        recv = Receiver(source, cfg, eligible_prns=eligible)
        recv.run(until_fix=True)
        fixes = recv.world.position_fixes
        if not fixes:
            result.update(status="no_fix", elapsed_s=time.monotonic() - t0)
            return result
        fix = fixes[-1]
        expected = rx + vel * fix.receiver_timestamp
        pos_err = float(np.linalg.norm(fix.ecef - expected))
        vel_err = (
            float(np.linalg.norm(fix.velocity_ecef_mps - vel))
            if fix.velocity_ecef_mps is not None
            else None
        )
        ok = pos_err < POSITION_TOLERANCE_M and (
            vel_err is None or vel_err < VELOCITY_TOLERANCE_MPS
        )
        status = "pass" if ok else "bad_fix"
        # The certified bound must hold whenever a fix is published —
        # REGARDLESS of whether it passes the accuracy tolerance: a large
        # error inside its protection level is merely unavailable, a large
        # error OUTSIDE it is hazardously misleading information, the worst
        # finding a campaign can produce. Horizontal error checks against
        # HPL and vertical against VPL separately (DO-229 semantics).
        hpl = fix.protection["hpl_m"] if fix.protection else None
        if hpl is not None:
            up = expected / np.linalg.norm(expected)
            err_vec = fix.ecef - expected
            v_err = abs(float(err_vec @ up))
            h_err = float(np.linalg.norm(err_vec - (err_vec @ up) * up))
            if h_err > hpl or v_err > fix.protection["vpl_m"]:
                status = "integrity_violation"
        result.update(
            status=status,
            hpl_m=hpl,
            sbas_used=(
                sc.sbas_prn in fix.satellites_used
                if sc.sbas_prn is not None
                else None
            ),
            fix_time_s=float(fix.receiver_timestamp),
            position_error_m=pos_err,
            velocity_error_mps=vel_err,
            satellites_used=list(fix.satellites_used),
            gdop=fix.dop["gdop"] if fix.dop else None,
            elapsed_s=time.monotonic() - t0,
        )
    except Exception as exc:  # a crash is a campaign finding, not an abort
        result.update(
            status="error",
            error=f"{type(exc).__name__}: {exc}",
            elapsed_s=time.monotonic() - t0,
        )
    return result


def run_glonass_df_trial(seed: int, _impairment: str = "none") -> dict:
    """Randomized GLONASS-only dual-frequency (L1OF+L2OF) trial: random
    FDMA channel subset, geometry, motion, noise, and IONOSPHERE STRENGTH
    (the Klobuchar amplitude scaled 0.4-2x of the demo daytime set — the
    measured inter-band correction must hold across the range, not at one
    tuned operating point). Judged like the GPS trials: position within
    tolerance, error within the published protection levels, and the
    dual-frequency correction actually applied on most channels."""
    import dataclasses

    from gypsum_tpu.io.sources import ArraySampleSource
    from gypsum_tpu.runtime.receiver import DualBandReceiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GLONASS_SAMPLE_RATE as GLO_FS,
        demo_glonass_constellation,
        demo_iono_page18,
    )
    from gypsum_tpu.solve.geodesy import lla_to_ecef
    from gypsum_tpu.solve.iono import IonoUtcParams

    rng = np.random.default_rng(seed + 7_000_000)
    n_ch = int(rng.integers(4, 7))
    ks = sorted(int(k) for k in rng.choice(np.arange(-7, 7), size=n_ch, replace=False))
    lat = 51.5 + float(rng.uniform(-3.0, 3.0))
    lon = -0.1 + float(rng.uniform(-3.0, 3.0))
    alt = float(rng.uniform(0.0, 500.0))
    noise = float(rng.uniform(0.25, 0.4))
    duration = float(rng.uniform(14.0, 18.0))
    iono_scale = float(rng.uniform(0.4, 2.0))
    result: dict = {
        "kind": "glonass_df", "seed": seed, "ks": ks, "lat": lat, "lon": lon,
        "alt": alt, "noise": noise, "duration_s": duration,
        "iono_scale": iono_scale,
    }
    t0 = time.monotonic()
    try:
        page = demo_iono_page18()
        page = dataclasses.replace(
            page,
            alpha0=page.alpha0 * iono_scale, alpha1=page.alpha1 * iono_scale,
            alpha2=page.alpha2 * iono_scale, alpha3=page.alpha3 * iono_scale,
        )
        params = IonoUtcParams.from_page(page)
        rx = lla_to_ecef(lat, lon, alt)
        sats = demo_glonass_constellation(ks)
        l1_iq, _ = synthesize_constellation(
            sats, rx, 21618.0, duration, GLO_FS, noise_sigma=noise,
            seed=seed, iono=params,
        )
        l2_iq, _ = synthesize_constellation(
            sats, rx, 21618.0, duration, GLO_FS, noise_sigma=noise,
            seed=seed + 1, iono=params, glonass_band="l2",
        )
        dual = DualBandReceiver(
            None,
            ArraySampleSource(l1_iq, GLO_FS),
            glonass_l2_source=ArraySampleSource(l2_iq, GLO_FS),
        )
        dual.run()
        fixes = dual.world.position_fixes
        if not fixes:
            result.update(status="no_fix", elapsed_s=time.monotonic() - t0)
            return result
        fix = fixes[-1]
        pos_err = float(np.linalg.norm(fix.ecef - rx))
        status = "pass" if pos_err < POSITION_TOLERANCE_M else "bad_fix"
        hpl = fix.protection["hpl_m"] if fix.protection else None
        if hpl is not None:
            up = rx / np.linalg.norm(rx)
            err_vec = fix.ecef - rx
            v_err = abs(float(err_vec @ up))
            h_err = float(np.linalg.norm(err_vec - (err_vec @ up) * up))
            if h_err > hpl or v_err > fix.protection["vpl_m"]:
                status = "integrity_violation"
            elif status == "bad_fix" and (fix.dop or {}).get("gdop", 0.0) > 15.0:
                # DO-229 availability semantics: an extreme-DOP geometry
                # (random 4-subsets of FDMA looks can exceed GDOP 30) whose
                # error sits INSIDE its published protection level is the
                # system being honest about degradation — unavailability,
                # not silent wrongness. Distinct status so the campaign
                # reports it without calling it a failure.
                status = "degraded_honest"
        n_df = len(fix.iono_measured_m or {})
        if status == "pass" and n_df < max(2, n_ch - 1):
            status = "df_not_applied"
        result.update(
            status=status,
            position_error_m=pos_err,
            hpl_m=hpl,
            fix_time_s=float(fix.receiver_timestamp),
            df_corrected=n_df,
            satellites_used=list(fix.satellites_used),
            elapsed_s=time.monotonic() - t0,
        )
    except Exception as exc:
        result.update(
            status="error",
            error=f"{type(exc).__name__}: {exc}",
            elapsed_s=time.monotonic() - t0,
        )
    return result


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0, help="first trial seed")
    ap.add_argument("--jobs", type=int, default=max(1, (os.cpu_count() or 2) // 2))
    ap.add_argument("--out", default=None, help="JSONL results path (appended)")
    ap.add_argument("--replay-seed", type=int, default=None,
                    help="run exactly one trial with this seed and full logs")
    ap.add_argument("--impairment", default="none", choices=IMPAIRMENT_LEVELS,
                    help="RF-impairment level applied to every trial")
    ap.add_argument("--gauntlet", action="store_true",
                    help="run --trials seeds at EVERY impairment level and "
                    "report the pass fraction per level")
    ap.add_argument("--no-resync-cutoff", action="store_true",
                    help="disable the 40 s bit-phase resync cutoff "
                    "(band-aid inherited from the reference) for every trial")
    ap.add_argument("--glonass-df", action="store_true",
                    help="run GLONASS-only dual-frequency (L1OF+L2OF) "
                    "trials instead of GPS ones: random FDMA subsets and "
                    "iono strengths, measured-iono correction judged")
    args = ap.parse_args()
    global NO_RESYNC_CUTOFF
    NO_RESYNC_CUTOFF = args.no_resync_cutoff

    trial_fn = run_glonass_df_trial if args.glonass_df else run_trial

    if args.replay_seed is not None:
        import logging

        logging.basicConfig(level=logging.INFO)
        res = trial_fn(args.replay_seed, args.impairment)
        print(json.dumps(res, indent=2))
        return 0 if res["status"] == "pass" else 1

    if args.gauntlet:
        out_f = open(args.out, "a") if args.out else None
        summary = {}
        seeds = list(range(args.seed, args.seed + args.trials))
        with concurrent.futures.ProcessPoolExecutor(max_workers=args.jobs) as pool:
            for level in IMPAIRMENT_LEVELS:
                results = list(pool.map(run_trial, seeds, [level] * len(seeds)))
                n_pass = sum(r["status"] == "pass" for r in results)
                errs = [r.get("position_error_m") for r in results
                        if r.get("position_error_m") is not None]
                summary[level] = {
                    "passed": n_pass,
                    "trials": len(seeds),
                    "median_pos_err_m": float(np.median(errs)) if errs else None,
                }
                print(f"{level:12s}: {n_pass}/{len(seeds)} passed, "
                      f"median err "
                      f"{summary[level]['median_pos_err_m'] or float('nan'):.1f} m",
                      flush=True)
                if out_f:
                    for r in results:
                        out_f.write(json.dumps(r) + "\n")
        if out_f:
            out_f.close()
        print(json.dumps(summary, indent=2))
        return 0 if all(s["passed"] == s["trials"] for s in summary.values()) else 1

    seeds = list(range(args.seed, args.seed + args.trials))
    out_f = open(args.out, "a") if args.out else None
    failures: list[dict] = []
    n_done = 0
    with concurrent.futures.ProcessPoolExecutor(max_workers=args.jobs) as pool:
        for res in pool.map(trial_fn, seeds, [args.impairment] * len(seeds)):
            n_done += 1
            if "scenario" in res:
                sc = res["scenario"]
                line = (
                    f"[{n_done}/{len(seeds)}] seed={sc['seed']} {res['status']:7s} "
                    f"sats={len(sc['prns'])} noise={sc['noise_sigma']:.2f} "
                    f"block={sc['block_size_ms']}ms"
                )
            else:  # glonass dual-frequency trial
                line = (
                    f"[{n_done}/{len(seeds)}] seed={res['seed']} {res['status']:7s} "
                    f"ks={res['ks']} noise={res['noise']:.2f} "
                    f"iono×{res['iono_scale']:.2f}"
                )
            if res["status"] in ("pass", "bad_fix"):
                line += (
                    f" err={res['position_error_m']:.1f}m"
                    f" fix@{res['fix_time_s']:.0f}s"
                )
                if res.get("velocity_error_mps") is not None:
                    line += f" verr={res['velocity_error_mps']:.2f}m/s"
                if res.get("df_corrected") is not None:
                    line += f" df={res['df_corrected']}sv"
            elif res["status"] == "error":
                line += f" {res['error']}"
            print(line, flush=True)
            if res["status"] not in ("pass", "degraded_honest"):
                failures.append(res)
            if out_f:
                out_f.write(json.dumps(res) + "\n")
                out_f.flush()
    if out_f:
        out_f.close()
    print(f"\n{len(seeds) - len(failures)}/{len(seeds)} passed")
    for res in failures:
        print("FAILED:", json.dumps(res))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

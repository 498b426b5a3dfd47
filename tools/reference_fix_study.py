"""Find (and pin) a configuration where the REFERENCE receiver fixes.

Round-4 VERDICT item 2: the fix-level oracle criterion in
tools/compare_vs_reference.py had never actually evaluated — the reference
produced 0 fixes on 40 s and 70 s synthetic captures (it decoded about half
the subframes and never held four complete orbit sets simultaneously), so
the harness printed "not evaluable" and exited 0. This tool runs ONLY the
reference (gypsum/receiver.py) over a capture and reports everything its
fix gate depends on (gypsum/world_model.py:567-589): per-SV subframe
streams, satellites with complete orbital parameters over time, lock-loss
drops, and every published fix.

Usage:
    python tools/reference_fix_study.py CAPTURE SECONDS SCALE
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.compare_vs_reference import run_reference  # noqa: E402  (stubs web_dashboard)


def run_reference_with_measurement_spy(capture, seconds, prns):
    """run_reference + a spy on the reference's Newton solve
    (gypsum/world_model.py:_solve_position_via_newtons_method) recording
    its (sat_time, sat_ecef) inputs: with exactly 4 SVs the squared-range
    system has TWO exact roots, and which one Newton publishes depends
    only on the initial guess — the recorded sets let the caller solve
    for BOTH roots offline and test whether the true position is the
    other root of the reference's own measurements."""
    sys.path.insert(0, "/root/reference")
    import gypsum.world_model as wm_mod

    recorded = []
    orig = wm_mod.GpsWorldModel._solve_position_via_newtons_method

    def spy(self, clock_and_ecef, guess):
        if len(recorded) < 200:
            recorded.append(
                [(float(t), (p.x, p.y, p.z)) for t, p in clock_and_ecef]
            )
        return orig(self, clock_and_ecef, guess)

    wm_mod.GpsWorldModel._solve_position_via_newtons_method = spy
    try:
        decoded, fixes = run_reference(capture, seconds, prns)
    finally:
        wm_mod.GpsWorldModel._solve_position_via_newtons_method = orig
    return decoded, fixes, recorded


def measurement_consistency(meas: list, truth: np.ndarray) -> dict:
    """Why the reference's fixes land ~100-220 km from truth on synthetic
    captures (measured on its OWN recorded measurement sets):

    Its per-SV 'time the signal left the satellite' values carry NO
    per-satellite sub-millisecond code phase — inter-SV differentials come
    out as EXACT integer milliseconds plus a single common fractional
    offset (the sub-ms cancels out of its tick/slide arithmetic, the
    structural quirk documented in SURVEY.md §7 hard-parts and
    gypsum_tpu/solve/world_measurements.py's docstring; this framework
    carries the measured sub-sample delay instead). True differentials are
    arbitrary sub-ms values, so each SV's pseudorange is off by up to
    +/-0.5 ms = +/-150 km, and the exact-4 solve maps that straight into
    the position. With SV clock offsets on the scene, the clock correction
    (the only per-SV sub-ms term surviving) rides on top."""
    sats = np.array([p for _, p in meas])
    ts = np.array([t for t, _ in meas])
    d_true = np.linalg.norm(sats - truth[None, :], axis=1) / 299792458.0
    resid = ts - d_true
    resid -= resid.mean()
    dt = ts - ts[0]
    ms_offsets = dt * 1e3 - np.round(dt * 1e3)
    return {
        "differential_residual_us": (resid * 1e6).round(2).tolist(),
        "differentials_ms": (dt * 1e3).round(4).tolist(),
        "differentials_are_integer_ms": bool(np.max(np.abs(ms_offsets)) < 1e-3),
        "max_subms_deviation_us": float(np.max(np.abs(ms_offsets)) * 1e3),
    }


def make_capture(path: str, duration: float, noise: float,
                 zero_svclock: bool = False) -> None:
    """Synthesize the standard 4-SV scene as raw interleaved f32 at
    2.046 Msps. ``zero_svclock`` zeroes a_f0/a_f1 on every SV — the
    controlled experiment isolating the reference's SV-clock application
    (its pseudoranges carry ~ -2 x a_f0 per-SV errors on captures with
    realistic clock offsets; with the terms zeroed those errors must
    vanish if that diagnosis is right)."""
    import dataclasses

    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import (
        DEMO_GPS_START_SOW,
        demo_constellation,
    )
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    sats = demo_constellation()
    if zero_svclock:
        sats = [
            dataclasses.replace(
                s, ephemeris=dataclasses.replace(s.ephemeris, a_f0=0.0, a_f1=0.0)
            )
            for s in sats
        ]
    rx = lla_to_ecef(51.5, -0.1, 80.0)
    iq, _ = synthesize_constellation(
        sats, rx, DEMO_GPS_START_SOW, duration, 2.046e6, noise_sigma=noise,
    )
    inter = np.empty(2 * iq.size, dtype=np.float32)
    inter[0::2] = iq.real
    inter[1::2] = iq.imag
    inter.tofile(path)
    print(f"wrote {path}: {duration:.0f}s, noise {noise}, "
          f"zero_svclock={zero_svclock}")


def main():
    import logging

    import numpy as np

    if sys.argv[1] == "--make-capture":
        make_capture(
            sys.argv[2], float(sys.argv[3]), float(sys.argv[4]),
            zero_svclock="--zero-svclock" in sys.argv,
        )
        return

    # The reference narrates every lock loss and resync at INFO
    # (satellite_signal_processing_pipeline.py:104-147) — that narration is
    # the diagnosis this tool exists to capture.
    logging.basicConfig(
        level=logging.INFO, format="%(levelname).1s %(name)s: %(message)s"
    )

    capture = Path(sys.argv[1])
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 90.0
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0 / 32.0
    prns = [int(p) for p in sys.argv[4:]] or [25, 28, 31, 32]

    scaled = capture.with_suffix(f".s{scale:g}.bin")
    (np.fromfile(capture, dtype=np.float32) * scale).astype(np.float32).tofile(scaled)

    t0 = time.perf_counter()
    decoded, fixes, meas_sets = run_reference_with_measurement_spy(
        scaled, seconds, prns
    )
    wall = time.perf_counter() - t0

    per_sv: dict[int, list[tuple[int, float]]] = {}
    for prn, ev in decoded:
        per_sv.setdefault(prn, []).append(
            (ev.subframe.subframe_id.value, ev.handover_word.time_of_week_in_seconds)
        )
    print(f"\n=== reference over {capture.name} scale {scale:g} "
          f"({seconds:.0f}s signal, {wall:.0f}s wall) ===")
    for prn in sorted(per_sv):
        ids = [i for i, _ in per_sv[prn]]
        print(f"  PRN {prn}: {len(ids)} subframes, ids {ids}")
    print(f"  total subframes: {len(decoded)}; fixes: {len(fixes)}")
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    truth = np.asarray(lla_to_ecef(51.5, -0.1, 80.0))
    for t, p in fixes[:8]:
        print(f"  FIX t={t:.1f}s err={np.linalg.norm(np.asarray(p) - truth):.1f} m")
    if fixes:
        errs = [float(np.linalg.norm(np.asarray(p) - truth)) for _, p in fixes]
        print(f"  {len(fixes)} fixes, first t={fixes[0][0]:.1f}s, "
              f"median err {np.median(errs):.1f} m")
    import json

    with open("/tmp/ref_meas_sets.json", "w") as f:
        json.dump(meas_sets[:3], f)
    print(f"  recorded {len(meas_sets)} measurement sets "
          f"(first 3 -> /tmp/ref_meas_sets.json)")
    if meas_sets:
        meas = [(t, tuple(p)) for t, p in meas_sets[0]]
        r = measurement_consistency(meas, truth)
        print("  measurement consistency of the reference's first 4-SV set:")
        print(f"    inter-SV differentials (ms): {r['differentials_ms']}")
        print(f"    integer-ms quantized: {r['differentials_are_integer_ms']} "
              f"(max sub-ms deviation {r['max_subms_deviation_us']:.2f} us)")
        print(f"    residuals vs truth geometry (us): "
              f"{r['differential_residual_us']}")
    scaled.unlink(missing_ok=True)


if __name__ == "__main__":
    main()

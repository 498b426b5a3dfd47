"""Bit-exactness check against the actual reference receiver.

Runs codyd51/gypsum (mounted read-only at /root/reference — imported as an
oracle, never copied) and this framework over the SAME synthetic capture and
compares every decoded navigation subframe field-by-field: the BASELINE.json
north star ("bit-exact nav-message decode vs. gypsum") evaluated directly.

Usage:
    python -m gypsum_tpu synth --out /tmp/cmp_cap.bin --duration 40
    python tools/compare_vs_reference.py /tmp/cmp_cap.bin [seconds] [scale]

The capture must be raw interleaved float32 at 2.046 Msps (the reference's
GNU-Radio format). Both receivers consume the SAME scaled copy; ``scale``
defaults to 1/32 because the reference's unnormalized loop discriminators
(error = I*Q, (E^2-L^2)/2 — gypsum/tracker.py:249,297) assume its
RTL-SDR recordings' sample levels and lose lock at unit-amplitude synthesis
(this framework's normalized discriminators track at any level). The
reference is pure numpy at well under realtime, so expect several minutes.

FIX-LEVEL CRITERION (round 5): "reference produced no fix" now exits
NON-ZERO unless --allow-no-ref-fix is passed. The configuration where the
reference demonstrably fixes (found by tools/reference_fix_study.py, full
derivation in docs/DESIGN_NOTES.md "Round 5"):

    python -m gypsum_tpu synth --out CAP.bin --duration 120 --noise 0.05
    python tools/compare_vs_reference.py CAP.bin 120 0.015625

It needs >= ~90 s (clean decode only starts after its 40 s bit-resync
cutoff), low noise (fixed absolute lock thresholds), and scale ~1/64
(unnormalized loop gains). Expect its first fix near t=54 s; on captures
with realistic SV clock offsets its fixes sit ~100+ km from truth (its
pseudoranges carry per-SV errors matching -2 x a_f0; on an a_f0=0 capture
its fixes are accurate) — the fix-vs-fix criterion compares medians, which
evaluates either way.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))

# Numeric ephemeris/clock fields comparable across both parsers
# (identical IS-GPS-200 bit fields -> equality is exact when the bits match).
# (reference attr, our attr) per subframe id; scalar floats/ints only (the
# reference keeps some fields as raw bit lists, which are skipped).
FIELD_PAIRS_BY_ID = {
    1: [
        ("week_num_mod_1024_bits", "week_number_mod_1024"),
        ("estimated_group_delay_differential", "t_gd"),
        ("t_oc", "t_oc"), ("a_f2", "a_f2"), ("a_f1", "a_f1"), ("a_f0", "a_f0"),
    ],
    2: [
        ("mean_anomaly_at_reference_time", "m0"),
        ("eccentricity", "eccentricity"),
        ("sqrt_semi_major_axis", "sqrt_a"),
        ("correction_to_orbital_radius_sin", "crs"),
        ("mean_motion_difference_from_computed_value", "delta_n"),
        ("correction_to_latitude_sin", "cus"),
        ("correction_to_latitude_cos", "cuc"),
        ("reference_time_ephemeris", "t_oe"),
    ],
    3: [
        ("inclination_angle", "i0"),
        ("longitude_of_ascending_node", "omega0"),
        ("argument_of_perigee", "omega"),
        ("rate_of_right_ascension", "omega_dot"),
        ("rate_of_inclination_angle", "idot"),
        ("correction_to_inclination_angle_sin", "cis"),
        ("correction_to_inclination_angle_cos", "cic"),
        ("correction_to_orbital_radius_cos", "crc"),
    ],
}


def run_reference(capture: Path, seconds: float, prns: list[int]):
    sys.path.insert(0, str(REFERENCE))
    import numpy as np  # noqa: F401
    # The reference's receiver module imports its web dashboard's pydantic
    # wire schema, whose package needs falcon/gunicorn (not installed here).
    # Stub just the two message classes — the receiver only uses them to POST
    # state, which never happens with no dashboard running.
    import types

    pkg = types.ModuleType("web_dashboard")
    msgs = types.ModuleType("web_dashboard.messages")

    class _Stub:
        def __init__(self, **kwargs):
            self.__dict__.update(kwargs)

        def json(self):
            return "{}"

    msgs.GpsReceiverState = _Stub
    msgs.SetCurrentReceiverStateRequest = _Stub
    pkg.messages = msgs
    sys.modules.setdefault("web_dashboard", pkg)
    sys.modules.setdefault("web_dashboard.messages", msgs)

    from gypsum.antenna_sample_provider import AntennaSampleProviderBackedByFile
    from gypsum.gps_ca_prn_codes import GpsSatelliteId
    from gypsum.radio_input import InputFileInfo
    from gypsum.receiver import GpsReceiver
    from gypsum.tracker_visualizer import GpsSatelliteTrackerVisualizer

    # Guard a reference bug: dropping a satellite with the visualizer
    # disabled crashes on a missing attribute (tracker_visualizer.py:422).
    _orig_drop = GpsSatelliteTrackerVisualizer.handle_satellite_dropped

    def _safe_drop(self):
        if hasattr(self, "visualizer_figure"):
            _orig_drop(self)

    GpsSatelliteTrackerVisualizer.handle_satellite_dropped = _safe_drop

    info = InputFileInfo.gnu_radio_recording_2x(path=capture)
    provider = AntennaSampleProviderBackedByFile(info)
    receiver = GpsReceiver(
        provider,
        only_acquire_satellite_ids=[GpsSatelliteId(id=p) for p in prns],
        present_matplotlib_satellite_tracker=False,
        present_web_ui=False,
    )

    decoded = []
    original = receiver._handle_subframe_emitted_event

    def spy(satellite_id, event):
        decoded.append((satellite_id.id, event))
        return original(satellite_id, event)

    receiver._handle_subframe_emitted_event = spy

    # Spy on the reference's position solve too (world_model.py:567-633):
    # the BASELINE contract is decode AND fix, so record every non-None
    # solution it publishes for the fix-vs-fix-vs-truth comparison.
    fixes = []
    wm = receiver.world_model
    orig_fix = wm.attempt_position_fix

    def fix_spy(receiver_timestamp, trackers):
        sol = orig_fix(receiver_timestamp, trackers)
        if sol is not None:
            p = sol.receiver_pos
            fixes.append((float(receiver_timestamp), (p.x, p.y, p.z)))
        return sol

    wm.attempt_position_fix = fix_spy

    from gypsum.antenna_sample_provider import NoMoreSamplesError

    steps = int(seconds * 1000)
    t0 = time.perf_counter()
    for i in range(steps):
        try:
            receiver.step()
        except NoMoreSamplesError:
            break
        if i % 5000 == 4999:
            print(f"  reference: {i / 1000 + 0.001:.0f}s of signal "
                  f"({time.perf_counter() - t0:.0f}s wall, {len(decoded)} subframes, "
                  f"{len(fixes)} fixes)",
                  flush=True)
    return decoded, fixes


def run_ours(capture: Path, seconds: float, prns: list[int]):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gypsum_tpu.io.sources import FileSampleSource, RecordingInfo
    from gypsum_tpu.runtime.receiver import Receiver

    source = FileSampleSource(RecordingInfo(path=capture, sample_rate=2.046e6))
    receiver = Receiver(source, eligible_prns=prns)
    reports = receiver.run(max_seconds=seconds)
    out = []
    for report in reports:
        for prn, ev in report.subframes:
            out.append((prn, ev))
    fixes = [
        (f.receiver_timestamp, tuple(f.ecef))
        for f in receiver.world.position_fixes
        if f.kind == "lsq"
    ]
    return out, fixes


def key_of(prn, sf_id, tow):
    return (prn, int(sf_id), float(tow))


def main():
    import numpy as np

    allow_no_ref_fix = "--allow-no-ref-fix" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    capture = Path(args[0])
    seconds = float(args[1]) if len(args) > 1 else 40.0
    scale = float(args[2]) if len(args) > 2 else 1.0 / 32.0
    prns = [25, 28, 31, 32]

    scaled = capture.with_suffix(".scaled.bin")
    (np.fromfile(capture, dtype=np.float32) * scale).astype(np.float32).tofile(scaled)
    capture = scaled

    print(f"running THIS framework over {capture} ({seconds:.0f}s, scale {scale:g})...", flush=True)
    ours, our_fixes = run_ours(capture, seconds, prns)
    print(f"  -> {len(ours)} subframes, {len(our_fixes)} lsq fixes", flush=True)

    print("running the REFERENCE receiver (pure numpy; this takes a while)...", flush=True)
    ref, ref_fixes = run_reference(capture, seconds, prns)
    print(f"  -> {len(ref)} subframes, {len(ref_fixes)} fixes", flush=True)

    # ---- fix-vs-fix-vs-truth (BASELINE: decode AND "fix within its
    # bounds"; reference solve: gypsum/world_model.py:567-633). The capture
    # was synthesized at the known receiver position (gypsum_tpu synth
    # defaults), so both solvers are judged against the same truth.
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    truth_rx = np.asarray(lla_to_ecef(51.5, -0.1, 80.0))

    def errs(fixes):
        return np.array(
            [np.linalg.norm(np.asarray(p) - truth_rx) for _, p in fixes]
        )

    print("\nFIX COMPARISON (vs synthesis truth):")
    if not ref_fixes:
        # Round-5 gate: a run where the reference never fixes does NOT
        # evaluate the BASELINE fix criterion — that is a FAILURE of the
        # harness run unless explicitly waived (use the documented
        # 120 s / noise 0.05 / scale 1/64 configuration, module docstring).
        print("  reference produced NO position fix within the capture; "
              "fix-level criterion NOT EVALUATED")
        if our_fixes:
            e = errs(our_fixes)
            print(f"  ours: {len(our_fixes)} fixes, median {np.median(e):.1f} m, "
                  f"last {e[-1]:.1f} m")
        if not allow_no_ref_fix:
            print("  -> FAILURE (pass --allow-no-ref-fix to waive, e.g. for "
                  "short decode-only captures)")
            sys.exit(1)
        fix_ok = bool(our_fixes)
    else:
        re_, oe = errs(ref_fixes), errs(our_fixes) if our_fixes else np.array([])
        print(f"  reference: {len(ref_fixes)} fixes, median error "
              f"{np.median(re_):.1f} m, last {re_[-1]:.1f} m "
              f"(first fix at t={ref_fixes[0][0]:.1f}s)")
        if our_fixes:
            print(f"  ours:      {len(our_fixes)} fixes, median error "
                  f"{np.median(oe):.1f} m, last {oe[-1]:.1f} m "
                  f"(first fix at t={our_fixes[0][0]:.1f}s)")
        # "Within its bounds": our typical error must not exceed the
        # reference's own scatter on the same samples (floor 15 m so a
        # hyper-accurate reference run can't fail us on noise).
        fix_ok = bool(our_fixes) and float(np.median(oe)) <= max(
            15.0, float(np.median(re_))
        )
        print(f"  -> OUR FIX {'WITHIN' if fix_ok else 'OUTSIDE'} the "
              f"reference's bounds")

    ours_by_key = {}
    for prn, ev in ours:
        d = ev.decoded
        ours_by_key[key_of(prn, d.subframe.subframe_id.value, d.handover.time_of_week_seconds)] = d

    matched = 0
    fields_compared = 0
    mismatches = []
    missing = []
    for prn, ev in ref:
        sf = ev.subframe
        sf_id = sf.subframe_id.value
        tow = ev.handover_word.time_of_week_in_seconds
        k = key_of(prn, sf_id, tow)
        if k not in ours_by_key:
            missing.append(k)
            continue
        d = ours_by_key[k]
        for rf, of in FIELD_PAIRS_BY_ID.get(sf_id, []):
            rv = getattr(sf, rf, None)
            ov = getattr(d.subframe, of, None)
            if rv is None or ov is None:
                mismatches.append((k, rf, rv, of, ov))
                continue
            fields_compared += 1
            if float(rv) != float(ov):
                mismatches.append((k, rf, rv, of, ov))
        matched += 1

    print(f"\nreference subframes: {len(ref)}; ours: {len(ours)}; matched by "
          f"(prn, id, TOW): {matched}; missing from ours: {len(missing)}")
    for k in missing[:10]:
        print(f"  missing: {k}")
    if matched == 0 or fields_compared == 0:
        print(f"NO OVERLAP — {matched} subframes matched but "
              f"{fields_compared} comparable fields")
        sys.exit(1)
    if not mismatches:
        print(f"ALL {fields_compared} MATCHED FIELDS BIT-EXACT")
        if not fix_ok:
            sys.exit(1)
        return

    # Disagreements get adjudicated against the synthesis ground truth: the
    # capture was generated from known ephemerides, so whichever decoder
    # matches the truth decoded the bits correctly. (Observed in practice:
    # occasional bit errors in the REFERENCE's stream corrupt one of its
    # subframes — its parity check logs but never rejects,
    # gypsum/navigation_message_parser.py:384-391.)
    from gypsum_tpu.signal.scenarios import demo_constellation

    truth = {s.prn: s.ephemeris for s in demo_constellation(prns)}
    # Subframe attr -> Ephemeris truth attr where the names differ.
    truth_attr = {"week_number_mod_1024": "week_number"}
    ours_right = ref_right = unknown = 0
    print(f"FIELD DISAGREEMENTS: {len(mismatches)} (adjudicating vs synthesis truth)")
    for k, rf, rv, of, ov in mismatches:
        tv = getattr(truth.get(k[0]), truth_attr.get(of, of), None)
        if of == "week_number_mod_1024" and tv is not None:
            tv = float(tv) % 1024
        if tv is None or rv is None or ov is None:
            unknown += 1
            verdict = "UNADJUDICABLE (missing field or truth)"
        else:
            # Compare against the ICD-quantized truth (both decoders return
            # quantized values, so a correct decode is within one LSB).
            ours_err = abs(float(ov) - float(tv))
            ref_err = abs(float(rv) - float(tv))
            if ours_err < ref_err:
                ours_right += 1
                verdict = "OURS matches truth"
            elif ref_err < ours_err:
                ref_right += 1
                verdict = "REFERENCE matches truth"
            else:
                unknown += 1
                verdict = "TIE (both equidistant from truth)"
        print(f"  {k}: reference.{rf}={rv!r} vs ours.{of}={ov!r} "
              f"(truth={tv!r}) -> {verdict}")
    print(f"adjudication: ours correct {ours_right}, reference correct {ref_right}, "
          f"unadjudicable {unknown}")
    if ref_right or unknown:
        sys.exit(1)
    print("ALL DISAGREEMENTS WERE REFERENCE DECODE ERRORS; OUR DECODE IS "
          "BIT-EXACT TO TRUTH")
    if not fix_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

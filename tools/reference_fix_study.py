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

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.compare_vs_reference import run_reference  # noqa: E402  (stubs web_dashboard)


def main():
    import logging

    import numpy as np

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
    decoded, fixes = run_reference(scaled, seconds, prns)
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
    scaled.unlink(missing_ok=True)


if __name__ == "__main__":
    main()

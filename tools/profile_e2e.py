"""Profile the end-to-end pipelined replay (the bench.py e2e scene).

Answers "where do the wall-clock milliseconds go per block?" with two views:

1. coarse per-stage timers wrapped around the receiver's hot methods
   (source read, device dispatch [upload + jit call], collect [device fetch],
   host nav decode), printed as ms/block;
2. an optional cProfile dump (--cprofile) of the replay loop, top-40 by
   cumulative time.

Run on the TPU backend (default) or --platform cpu. Keep the box otherwise
idle: the axon tunnel and the single host core both skew under load.
"""

from __future__ import annotations

import argparse
import cProfile
import io
import pstats
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="cpu to force the CPU backend")
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--noise", type=float, default=0.3)
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("--f32", action="store_true", help="profile the float32 ArraySampleSource path")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from gypsum_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import tempfile

    from gypsum_tpu.core.config import ReceiverConfig, TrackingConfig
    from gypsum_tpu.io.sources import ArraySampleSource, FileSampleSource, recording_info_for
    from gypsum_tpu.runtime.receiver import Receiver
    from gypsum_tpu.signal.constellation import synthesize_constellation
    from gypsum_tpu.signal.scenarios import DEMO_GPS_START_SOW, demo_constellation
    from gypsum_tpu.solve.geodesy import lla_to_ecef

    FS = 2.046e6
    rx = lla_to_ecef(51.5, -0.1, 80.0)
    iq, _ = synthesize_constellation(
        demo_constellation([25, 28, 31, 32]), rx, DEMO_GPS_START_SOW, args.seconds, FS,
        noise_sigma=args.noise,
    )
    cfg = ReceiverConfig(tracking=TrackingConfig(pipeline_tracking=True))

    tmp = None
    if args.f32:
        def make_source():
            return ArraySampleSource(iq, FS)
    else:
        scale = 46.0
        inter = np.empty(2 * iq.size, dtype=np.uint8)
        inter[0::2] = np.clip(np.round(iq.real * scale + 127.5), 0, 255).astype(np.uint8)
        inter[1::2] = np.clip(np.round(iq.imag * scale + 127.5), 0, 255).astype(np.uint8)
        tmp = tempfile.NamedTemporaryFile(suffix=".rtl", delete=False)
        inter.tofile(tmp.name)

        def make_source():
            return FileSampleSource(recording_info_for("rtl_sdr", tmp.name))

    # Warm run: compiles + tunnel warmup, untimed.
    t0 = time.perf_counter()
    Receiver(make_source(), cfg).run()
    print(f"warm run: {time.perf_counter() - t0:.2f}s", flush=True)

    # ---- instrumented run ----------------------------------------------
    stage_totals: dict[str, float] = defaultdict(float)
    stage_counts: dict[str, int] = defaultdict(int)

    def timed(obj, name, label):
        orig = getattr(obj, name)

        def wrapper(*a, **k):
            t = time.perf_counter()
            out = orig(*a, **k)
            stage_totals[label] += time.perf_counter() - t
            stage_counts[label] += 1
            return out

        setattr(obj, name, wrapper)

    recv = Receiver(make_source(), cfg)
    timed(recv.source, "read_block_quantized", "source.read_quantized")
    if hasattr(recv.source, "read_block"):
        timed(recv.source, "read_block", "source.read_block")
    timed(recv.bank, "dispatch_block", "bank.dispatch (upload+jit call)")
    timed(recv.bank, "collect_block", "bank.collect (device fetch)")
    timed(recv, "_process_channel", "nav decode per channel")
    timed(recv, "_acquire", "acquisition scan")
    timed(recv.world, "attempt_position_fix", "position fix")

    t0 = time.perf_counter()
    if args.cprofile:
        pr = cProfile.Profile()
        pr.enable()
        recv.run()
        pr.disable()
    else:
        recv.run()
    wall = time.perf_counter() - t0

    n_blocks = len(recv.block_reports)
    print(f"\nreplay: {args.seconds:.1f}s signal in {wall:.2f}s wall "
          f"({args.seconds / wall:.2f}x realtime), {n_blocks} blocks")
    print(f"{'stage':<34}{'total s':>9}{'ms/block':>10}{'calls':>7}")
    accounted = 0.0
    for label, tot in sorted(stage_totals.items(), key=lambda kv: -kv[1]):
        print(f"{label:<34}{tot:>9.3f}{tot / n_blocks * 1e3:>10.1f}{stage_counts[label]:>7}")
        accounted += tot
    print(f"{'(unaccounted)':<34}{wall - accounted:>9.3f}"
          f"{(wall - accounted) / n_blocks * 1e3:>10.1f}")

    if args.cprofile:
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(40)
        print(s.getvalue())

    if tmp is not None:
        import os

        os.unlink(tmp.name)


if __name__ == "__main__":
    main()

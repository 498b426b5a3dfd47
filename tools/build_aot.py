"""Build the in-repo AOT-serialized TPU executables (gypsum_tpu/core/aot.py).

Run ON the target TPU generation (the artifact is keyed to backend, device
kind, and jax version; a mismatch at runtime silently falls back to jit):

    python tools/build_aot.py

Exports ONLY the full-constellation acquisition sweep at the standard
10 ms geometry (BASELINE's <1 s cold-acquisition target; the sweep compile
was 2.3 s of the 2.33 s cold figure in BENCH_r03). Round 5 briefly shipped
track-block and circulant-build executables too, then measured that a
deserialize_and_load'ed executable's FIRST run sporadically stalls for
minutes on this environment's tunnel and blocks the whole device queue
(docs/DESIGN_NOTES.md "Round 5: the tunnel stall study") — every other
cold-chain program now ships as persistent-cache seeds instead
(tools/build_cache_seed.py), which load in 0.08-0.5 s and never stalled.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax

    if jax.default_backend() != "tpu":
        raise SystemExit(
            f"build_aot must run on the TPU backend (got {jax.default_backend()})"
        )
    import numpy as np

    from gypsum_tpu.acquire.engine import AcquisitionEngine
    from gypsum_tpu.core.aot import runtime_meta, save_compiled

    fs, length = 2.046e6, 2046
    eng = AcquisitionEngine(fs, length)
    path = eng.export_aot()
    print(f"saved {path} for {runtime_meta()}")


if __name__ == "__main__":
    main()

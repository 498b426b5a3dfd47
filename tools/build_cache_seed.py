"""Build the in-repo XLA persistent-cache seed (gypsum_tpu/_aot/xla_seed/).

Run ON the target TPU generation. Compiles the standard cold-chain
programs into a staging cache directory, then copies the entries (plus a
runtime_meta() sidecar) into the repo; at runtime,
core/compile_cache.py:enable_persistent_cache seeds a recycled machine's
empty ~/.cache from them.

Why seeds and not more serialize_executable artifacts: measured r05
(docs/DESIGN_NOTES.md "Round 5: the tunnel stall study"), both a cold jit
compile and a deserialize_and_load'ed executable's first run sporadically
stall for MINUTES on this environment's TPU tunnel, and a stalled call
blocks every concurrent program on the device queue. Persistent-cache
hits (0.08-0.5 s per program) never exhibited the stall across the whole
session. The acquisition sweep keeps its jaxexec artifact on top of the
seed (tools/build_aot.py) for the <1 s cold-acquisition target.

Program set (everything a driver bench + CLI replay compiles cold):
  - circulant table build + acquisition sweep (10 ms standard geometry)
  - track_block at the Receiver's max_channels for f32 AND u8 ingest,
    and at the 32-channel headline-bench geometry ([S, 1] column carry —
    the one rank after track/loop.py:_with_state_cols)
  - the farm geometries bench.py sweeps (8/16/32/64 x 8, 16x16, 8x32)
  - the output pack lambda and the tiny upload helpers, via one real
    2-block replay (f32 and u8)

Usage:  python tools/build_cache_seed.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

SEED_DIR = _REPO / "gypsum_tpu" / "_aot" / "xla_seed"


# The workloads are the DRIVER BENCH'S OWN worker processes, invoked
# exactly as bench.main() invokes them. Three lessons from building this
# tool the wrong way first: (a) jit.lower().compile() and a real call of
# the same program produce DIFFERENT cache keys; (b) a later identical
# call in the same process reuses the in-memory executable and never
# writes its call-style key at all; (c) even the same call sequence
# produces different keys when OTHER sections ran earlier in the same
# process (measured: bench.e2e_replay_details alone reproduces the
# worker's keys, the same call after the acquisition/headline/farm
# sections does not). Only running the consumer's literal process images
# yields the keys the consumer will look up.
_WORKER_CMDS = (
    ["bench.py", "--worker", "default"],
    ["bench.py", "--e2e-worker", "default"],
    ["bench.py", "--e2e-async-worker", "default"],
)


def main() -> None:
    import jax

    if jax.default_backend() != "tpu":
        raise SystemExit(
            f"build_cache_seed must run on the TPU backend "
            f"(got {jax.default_backend()})"
        )
    from gypsum_tpu.core.aot import runtime_meta

    staging = Path(tempfile.mkdtemp(prefix="gypsum_seed_"))
    env = {
        **os.environ,
        # Force everything through jit so every program lands in the cache
        # (the acquisition jaxexec would otherwise satisfy the sweep).
        "GYPSUM_AOT": "0",
        "GYPSUM_SEED": "0",
        "GYPSUM_TPU_CACHE_DIR": str(staging),
        "PYTHONPATH": str(_REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    for cmd in _WORKER_CMDS:
        proc = subprocess.run(
            [sys.executable, str(_REPO / cmd[0]), *cmd[1:]], env=env,
            cwd=_REPO, capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0 or "BENCH_RESULT" not in proc.stdout:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"seed workload {' '.join(cmd)} failed")
        print(f"{' '.join(cmd)} done "
              f"({len(list(staging.iterdir()))} entries staged)", flush=True)

    entries = sorted(p for p in staging.iterdir() if p.is_file())
    if not entries:
        raise SystemExit(f"workload produced no cache entries in {staging}")
    if SEED_DIR.exists():
        shutil.rmtree(SEED_DIR)
    SEED_DIR.mkdir(parents=True)
    total = 0
    for p in entries:
        shutil.copy2(p, SEED_DIR / p.name)
        total += p.stat().st_size
    (SEED_DIR / "meta.json").write_text(json.dumps(runtime_meta(), indent=1))
    print(
        f"seeded {len(entries)} entries ({total / 1e6:.1f} MB) into {SEED_DIR} "
        f"for {runtime_meta()}"
    )
    shutil.rmtree(staging)


if __name__ == "__main__":
    main()

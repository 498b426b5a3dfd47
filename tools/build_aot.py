"""Build the in-repo AOT-serialized TPU executables (gypsum_tpu/core/aot.py).

Run ON the target TPU generation (the artifact is keyed to backend, device
kind, and jax version; a mismatch at runtime silently falls back to jit):

    python tools/build_aot.py

Currently exports the cold-start-critical program: the full-constellation
acquisition sweep at the standard 10 ms geometry (BASELINE's <1 s
cold-acquisition target; the sweep compile was 2.3 s of the 2.33 s cold
figure in BENCH_r03).
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

    # The standard 32-channel 1 s track block (matmul tracker + Pallas
    # fixup): the other half of the recycled-machine cold start (11-25 s
    # of compile in the bench's tracking_warmup_s).
    import jax.numpy as jnp

    from gypsum_tpu.core.config import TrackingConfig
    from gypsum_tpu.signal.prn import replica_table
    from gypsum_tpu.track.loop import fresh_state, make_track_block_fn

    cfg = TrackingConfig()
    n_channels, block_ms = 32, cfg.block_size_ms
    k = cfg.lag_window_half_width
    reps = replica_table(length)
    wide = np.concatenate([reps, reps, reps[:, : 2 * k]], axis=1).astype(np.float32)
    replicas = jnp.asarray(np.tile(wide[0][None, :], (n_channels, 1)))
    state = fresh_state(n_channels)

    # Two ingest variants: float32 planes (synthetic/f32 recordings,
    # input_offset 0) and raw rtl_sdr uint8 words dequantized in-graph
    # (input_offset 127.5 — io/sources.py rtl_sdr format). Each is its own
    # program AND its own artifact tag; round 4 shipped only the f32 one,
    # so the production-realistic u8 replay still paid a cold compile.
    for dtype, offset in ((jnp.float32, 0.0), (jnp.uint8, 127.5)):
        fn = make_track_block_fn(cfg, length, fs, n_channels, input_offset=offset)
        jit_fn = getattr(fn, "_jit_fn", fn)
        tag = fn._aot_tag
        planes = jnp.zeros((block_ms, length, 2), dtype)
        compiled = jax.jit(jit_fn).lower(state, planes, replicas).compile()
        path = save_compiled(tag, compiled)
        print(f"saved {path} ({np.dtype(dtype).name} ingest) for {runtime_meta()}")


if __name__ == "__main__":
    main()

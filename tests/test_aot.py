"""In-repo AOT executable store (core/aot.py).

The real consumers are TPU-only (the acquisition engine only loads
artifacts on the tpu backend), but the store itself is platform-agnostic:
round-trip, compatibility gating, and corrupt-artifact fallback are pinned
here on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gypsum_tpu.core import aot


def _compiled():
    f = jax.jit(lambda x, y: (x @ y, x.sum()))
    x = jnp.ones((8, 8), jnp.float32)
    return f.lower(x, x).compile(), x


def test_save_load_roundtrip(tmp_path):
    """Round-trip in a SINGLE-device subprocess: the suite's forced
    8-device virtual mesh changes the device assignment between compile and
    reload (execute_sharded expects 8 shards), which never happens on the
    real single-chip TPU target."""
    import os
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(f"""
        import jax, jax.numpy as jnp, numpy as np
        from gypsum_tpu.core import aot
        from pathlib import Path
        aot.AOT_DIR = Path({str(tmp_path)!r})
        f = jax.jit(lambda x, y: (x @ y, x.sum()))
        x = jnp.ones((8, 8), jnp.float32)
        compiled = f.lower(x, x).compile()
        aot.save_compiled("unit", compiled)
        loaded = aot.load_compiled("unit")
        assert loaded is not None
        out, s = loaded(x, x)
        np.testing.assert_allclose(np.asarray(out), 8.0 * np.ones((8, 8)))
        assert float(s) == 64.0
        print("ROUNDTRIP_OK")
    """)
    repo = str(aot.AOT_DIR.parent.parent)
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
           "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=420, cwd=repo,
    )
    assert r.returncode == 0 and "ROUNDTRIP_OK" in r.stdout, r.stderr[-2000:]


def test_missing_artifact_returns_none(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "AOT_DIR", tmp_path)
    assert aot.load_compiled("nope") is None


def test_incompatible_meta_rejected(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "AOT_DIR", tmp_path)
    compiled, _ = _compiled()
    aot.save_compiled("unit", compiled)
    real = aot.runtime_meta()
    monkeypatch.setattr(
        aot, "runtime_meta", lambda: {**real, "device_kind": "TPU v9000"}
    )
    assert aot.load_compiled("unit") is None


def test_corrupt_artifact_falls_back(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "AOT_DIR", tmp_path)
    (tmp_path / "bad.jaxexec").write_bytes(b"not a pickle")
    assert aot.load_compiled("bad") is None


def test_track_fn_aot_gating_and_tag():
    """The track-block AOT wrapper is TPU-only (CPU callers get the raw
    jitted build) and its artifact tag is deterministic per geometry."""
    from gypsum_tpu.core.config import TrackingConfig
    from gypsum_tpu.track.loop import make_track_block_fn, track_aot_tag

    fn = make_track_block_fn(TrackingConfig(), 2046, 2.046e6, 8)
    assert not hasattr(fn, "_aot_tag")  # suite forces the CPU backend
    t32 = track_aot_tag(TrackingConfig(), 2046, 2.046e6, 32)
    assert t32 == track_aot_tag(TrackingConfig(), 2046, 2.046e6, 32)
    assert t32 != track_aot_tag(TrackingConfig(), 2046, 2.046e6, 16)
    assert t32 != track_aot_tag(
        TrackingConfig(block_size_ms=500), 2046, 2.046e6, 32
    )
    assert t32.startswith("track_")


def test_track_aot_wrapper_trace_aware():
    """Round-4 weakness: the AOT wrapper self-disabled permanently on ANY
    exception — including a call under an active trace (the sharded
    multi-chip path traces the SAME cached wrapper), which silently forfeited
    the artifact for every later direct call in the process. The wrapper must
    now (a) route traced calls to the jitted build without touching the
    artifact, and (b) survive one transient AOT failure before falling back
    permanently."""
    import time

    from gypsum_tpu.core.config import TrackingConfig
    from gypsum_tpu.track.loop import _with_track_aot

    calls = {"jit": 0}

    def jit_fn(state, samples, replicas):
        calls["jit"] += 1
        return state, samples

    wrapper = _with_track_aot(jit_fn, TrackingConfig(), 2046, 2.046e6, 8, 0.0)
    holder = wrapper._aot_holder
    for _ in range(500):  # join the loader thread (no artifact on CPU -> None)
        if "aot" in holder:
            break
        time.sleep(0.01)
    assert "aot" in holder

    aot_calls = []

    def fake_aot(state, samples, replicas):
        aot_calls.append(1)
        return state, samples

    holder["aot"] = fake_aot
    s = jnp.zeros((2,))
    x = jnp.ones((4,))
    r = jnp.ones((3,))

    # 1. Trace through the shared wrapper (what shard_map/jit of the cached
    # fn does): must go to the jitted build, artifact untouched, NOT disabled.
    jax.jit(wrapper)(s, x, r)
    assert not aot_calls
    assert holder["aot"] is fake_aot
    assert calls["jit"] >= 1

    # 2. A direct call afterwards still uses the artifact.
    wrapper(s, x, r)
    assert len(aot_calls) == 1

    # 3. Transient failure: the first strike keeps the artifact (retry next
    # call), the second disables it permanently.
    def boom(*a):
        raise RuntimeError("transient backend error")

    holder["aot"] = boom
    holder.pop("strikes", None)
    wrapper(s, x, r)
    assert holder["aot"] is boom  # strike 1: retained for a retry
    wrapper(s, x, r)
    assert holder["aot"] is None  # strike 2: permanent fallback


def test_track_aot_tag_ignores_host_only_fields():
    """pipeline_tracking / async_upload schedule host dispatches and never
    reach the lowered device program — they must not change the artifact
    key (round 4 shipped an artifact the bench's pipeline_tracking=True
    config silently never loaded)."""
    from gypsum_tpu.core.config import TrackingConfig
    from gypsum_tpu.track.loop import track_aot_tag

    base = track_aot_tag(TrackingConfig(), 2046, 2.046e6, 32)
    assert base == track_aot_tag(
        TrackingConfig(pipeline_tracking=True, async_upload=True),
        2046, 2.046e6, 32,
    )
    assert base != track_aot_tag(
        TrackingConfig(block_size_ms=500), 2046, 2.046e6, 32
    )

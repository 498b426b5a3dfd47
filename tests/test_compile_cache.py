"""Persistent-cache seeding (core/compile_cache.py) and the carry-rank
normalization that keeps one compiled track program per ingest dtype
(track/loop.py:_with_state_cols).

The seeds themselves are TPU entries built by tools/build_cache_seed.py;
what is pinned here on CPU is the seeding MECHANISM (meta gating, copy-if-
missing, opt-outs) and the host-side rank lift whose absence made the
first dispatch and the pipelined steady state two separate XLA compiles
(measured 2.8 s + 6.6 s per dtype in the r05 cold-chain study,
docs/DESIGN_NOTES.md).
"""

import json

import numpy as np
import pytest

from gypsum_tpu.core import aot, compile_cache
from gypsum_tpu.core.config import TrackingConfig
from gypsum_tpu.signal.prn import replica_table
from gypsum_tpu.track.loop import fresh_state, make_track_block_fn

FS = 2.046e6
L = 2046


@pytest.fixture
def seed_dir(tmp_path, monkeypatch):
    seed = tmp_path / "xla_seed"
    seed.mkdir()
    (seed / "jit_prog-aa11-cache").write_bytes(b"entry-a")
    (seed / "jit_prog-bb22-cache").write_bytes(b"entry-b")
    (seed / "meta.json").write_text(json.dumps(aot.runtime_meta()))
    monkeypatch.setattr(compile_cache, "_SEED_DIR", seed)
    return seed


def test_seed_cache_copies_missing_entries_only(seed_dir, tmp_path):
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "jit_prog-aa11-cache").write_bytes(b"already-here")
    assert compile_cache._seed_cache(cache) == 1
    # The existing entry is never overwritten; the missing one is copied.
    assert (cache / "jit_prog-aa11-cache").read_bytes() == b"already-here"
    assert (cache / "jit_prog-bb22-cache").read_bytes() == b"entry-b"
    # Idempotent: a second enable copies nothing.
    assert compile_cache._seed_cache(cache) == 0


def test_seed_cache_requires_exact_runtime_meta(seed_dir, tmp_path):
    (seed_dir / "meta.json").write_text(
        json.dumps({**aot.runtime_meta(), "device_kind": "TPU v9000"})
    )
    cache = tmp_path / "cache2"
    cache.mkdir()
    assert compile_cache._seed_cache(cache) == 0
    assert list(cache.iterdir()) == []


def test_seed_cache_env_opt_out(seed_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("GYPSUM_SEED", "0")
    cache = tmp_path / "cache3"
    cache.mkdir()
    assert compile_cache._seed_cache(cache) == 0


def test_aot_load_env_opt_out(monkeypatch):
    """GYPSUM_AOT=0 must short-circuit artifact loading entirely — the
    escape hatch for the tunnel-stall failure mode (DESIGN_NOTES r05)."""
    monkeypatch.setenv("GYPSUM_AOT", "0")
    calls = []
    monkeypatch.setattr(
        aot, "runtime_meta", lambda: calls.append(1) or {}
    )
    assert aot.load_compiled("anything") is None
    assert calls == []  # returned before touching the backend


def _call_args(n):
    cfg = TrackingConfig()
    fn = make_track_block_fn(cfg, L, FS, n)
    k = cfg.lag_window_half_width
    reps = replica_table(L)
    wide = np.concatenate([reps, reps, reps[:, : 2 * k]], axis=1).astype(np.float32)
    replicas = np.tile(wide[0][None, :], (n, 1))
    rng = np.random.default_rng(7)
    planes = rng.normal(size=(cfg.block_size_ms, L, 2)).astype(np.float32)
    return fn, planes, replicas


def test_state_cols_rank_lift_is_transparent():
    """The shared track fn accepts the rank-[S] host state of a first
    dispatch and the [S, 1] column carry of every later one, producing
    bit-identical outputs — and both enter the jit at the SAME [S, 1]
    avals (the host-side lift), so one compiled program serves both."""
    import jax

    fn, planes, replicas = _call_args(4)
    state_rows = fresh_state(4)
    state_cols = jax.tree_util.tree_map(lambda a: np.asarray(a)[:, None], state_rows)

    out_rows = fn(state_rows, planes, replicas)
    out_cols = fn(state_cols, planes, replicas)
    for a, b in zip(
        jax.tree_util.tree_leaves(out_rows), jax.tree_util.tree_leaves(out_cols)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Returned carry stays columns either way.
    new_state = out_rows[0]
    assert all(
        np.asarray(leaf).shape == (4, 1)
        for leaf in jax.tree_util.tree_leaves(new_state)
    )
    # Feeding the returned carry straight back works (the pipelined path).
    again = fn(new_state, planes, replicas)
    assert np.asarray(again[0].code_phase).shape == (4, 1)

"""Persistent XLA/Mosaic compilation cache.

Round-1 weakness #1 (VERDICT.md): every process paid a ~3 s acquisition
cold-compile and a multi-minute tracking warmup because nothing enabled
JAX's persistent compilation cache. This module turns it on once per
process; traced programs (including Mosaic kernels) are then deserialized
from disk on later runs instead of recompiled, cutting cold starts to the
irreducible trace + load + (on this environment) first-fetch tunnel cost.

The reference has no analogue (it is numpy-only), but documents the same
intent with its disabled correlation memo-cache
(reference: gypsum/acquisition.py:200-208).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

_logger = logging.getLogger(__name__)

_DEFAULT_DIR = "~/.cache/gypsum_tpu/xla"
_enabled: str | None = None

#: In-repo persistent-cache seed entries (tools/build_cache_seed.py): the
#: XLA cache files for the standard cold-chain programs, copied into the
#: cache directory on enable so a RECYCLED machine (empty ~/.cache) starts
#: warm. Measured r05: cache loads are 0.08-0.5 s per program and — unlike
#: both a cold jit compile and a serialize_executable deserialize, each of
#: which sporadically stalls for MINUTES on this environment's tunnel
#: (docs/DESIGN_NOTES.md "Round 5: the tunnel stall study") — have never
#: been observed to stall.
_SEED_DIR = Path(__file__).resolve().parent.parent / "_aot" / "xla_seed"


def _seed_cache(path: Path) -> int:
    """Copy missing in-repo seed entries into the live cache directory.
    Gated on an exact runtime_meta match (backend, device kind, jax
    version): entries from another runtime would simply never be looked up,
    so the gate only avoids shipping dead bytes into ~/.cache."""
    import json

    if os.environ.get("GYPSUM_SEED", "1") == "0":
        return 0  # tools/build_cache_seed.py: keep staging dirs pristine
    meta_file = _SEED_DIR / "meta.json"
    if not meta_file.exists():
        return 0
    try:
        from gypsum_tpu.core.aot import runtime_meta

        if json.loads(meta_file.read_text()) != runtime_meta():
            return 0
        n = 0
        for f in _SEED_DIR.iterdir():
            if f.name == "meta.json":
                continue
            dst = path / f.name
            if not dst.exists():
                dst.write_bytes(f.read_bytes())
                n += 1
        if n:
            _logger.info("seeded %d compile-cache entries from %s", n, _SEED_DIR)
        return n
    except Exception as exc:  # seeding is an optimization, never a failure
        _logger.warning("compile-cache seeding failed (%r)", exc)
        return 0


def enable_persistent_cache(cache_dir: str | os.PathLike | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    Returns the cache directory in use ("" when disabled). Honors
    ``GYPSUM_TPU_CACHE_DIR``; set it to ``0``/``off`` to disable entirely.

    Only enabled for non-CPU backends unless a directory is passed/forced:
    the XLA:CPU AOT deserializer warns (and can SIGILL) when the cache
    entry's machine features differ from the host, and CPU compiles are
    cheap anyway — the multi-minute win is TPU program + Mosaic reuse.
    """
    global _enabled
    env = os.environ.get("GYPSUM_TPU_CACHE_DIR")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return ""
    if _enabled is not None:
        return _enabled

    import jax

    if cache_dir is None and env is None and jax.default_backend() == "cpu":
        return ""
    path = Path(cache_dir or env or _DEFAULT_DIR).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    _seed_cache(path)

    jax.config.update("jax_compilation_cache_dir", str(path))
    # Cache every program: the default gates (>1 s compile, >1 MB entry)
    # would skip exactly the many small-but-numerous programs whose
    # aggregate retrace cost dominates the receiver's warmup.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        # NOT "all": that setting writes the cache DIRECTORY PATH into the
        # compile options, which are hashed into every cache key — two
        # processes pointed at different directories (or a seed staging dir
        # vs the runtime default) then compute different keys for identical
        # programs, which is exactly how the r05 seed entries initially
        # failed to hit (measured: identical track program, keys 7da921 vs
        # 5f3496 across dirs with "all"; identical 91f1e4 with "none"). The
        # serialized jit entry already embeds the compiled Mosaic kernels,
        # so the extra XLA-internal caches add nothing here.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # older jax without the knob
        pass
    _enabled = str(path)
    _logger.debug("persistent compilation cache at %s", path)
    return _enabled

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

    jax.config.update("jax_compilation_cache_dir", str(path))
    # Cache every program: the default gates (>1 s compile, >1 MB entry)
    # would skip exactly the many small-but-numerous programs whose
    # aggregate retrace cost dominates the receiver's warmup.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:  # older jax without the knob
        pass
    _enabled = str(path)
    _logger.debug("persistent compilation cache at %s", path)
    return _enabled

"""Ahead-of-time serialized TPU executables for cold-start-critical programs.

The persistent compilation cache (core/compile_cache.py) only helps a
machine that has ALREADY compiled: this environment's machines are recycled
with an empty ``~/.cache``, so every first run repays the full XLA/Mosaic
compile (~2.3 s for the acquisition sweep — BENCH_r03) and misses the
BASELINE <1 s cold-acquisition target. This module ships the compiled
executables IN-REPO: ``tools/build_aot.py`` lowers + compiles the standard-
shape programs on the target TPU and serializes them
(``jax.experimental.serialize_executable``) into ``gypsum_tpu/_aot/``;
at runtime the engine loads the artifact (~100 ms deserialize) instead of
compiling, when — and only when — the backend, device kind, and jax version
all match the build. Any mismatch silently falls back to ``jax.jit``.

The reference has no analogue (numpy has no compile step); the intent
matches its disabled correlation memo-cache
(reference: gypsum/acquisition.py:200-208).
"""

from __future__ import annotations

import logging
import pickle
from pathlib import Path

_logger = logging.getLogger(__name__)

#: In-repo artifact directory (committed; a few MB per executable).
AOT_DIR = Path(__file__).resolve().parent.parent / "_aot"

#: Artifact format version — bump when the payload layout changes.
_FORMAT = 1


def runtime_meta() -> dict:
    """The compatibility key an artifact must match to be loadable."""
    import jax

    d = jax.devices()[0]
    return {
        "format": _FORMAT,
        "jax": jax.__version__,
        "platform": d.platform,
        "device_kind": d.device_kind,
    }


def save_compiled(tag: str, compiled) -> Path:
    """Serialize a ``jax.stages.Compiled`` under ``_aot/<tag>.jaxexec``."""
    from jax.experimental import serialize_executable as se

    payload = se.serialize(compiled)  # (bytes, in_tree, out_tree)
    blob = pickle.dumps({"meta": runtime_meta(), "payload": payload})
    AOT_DIR.mkdir(parents=True, exist_ok=True)
    path = AOT_DIR / f"{tag}.jaxexec"
    path.write_bytes(blob)
    _logger.info("saved AOT executable %s (%.2f MB)", path, len(blob) / 1e6)
    return path


def load_compiled(tag: str):
    """Load a previously saved executable, or None when absent/incompatible.

    Pickle here only ever parses files committed to this repo (or written by
    ``save_compiled`` on this machine) — the directory is code, not input.
    """
    import os

    if os.environ.get("GYPSUM_AOT", "1") == "0":
        return None  # operational escape hatch (see docstring note below)
    path = AOT_DIR / f"{tag}.jaxexec"
    if not path.exists():
        return None
    try:
        blob = pickle.loads(path.read_bytes())
        if blob.get("meta") != runtime_meta():
            _logger.debug(
                "AOT %s incompatible: built for %s, runtime %s",
                tag, blob.get("meta"), runtime_meta(),
            )
            return None
        from jax.experimental import serialize_executable as se

        loaded = se.deserialize_and_load(*blob["payload"])
        _logger.info("loaded AOT executable %s", path)
        return loaded
    except Exception as exc:  # corrupt/stale artifact: compile instead
        _logger.warning("AOT %s failed to load (%r); falling back to jit", tag, exc)
        return None

"""Runtime/session configuration helpers."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax

_CACHE_ENABLED = False


def apply_device(device: str) -> None:
    """Pin the JAX platform from the config ``device`` key.

    ``device: cpu`` must hold even when a TPU plugin is discoverable —
    the env var ``JAX_PLATFORMS`` alone is overridden by plugin discovery
    in this environment, so we set the config flag programmatically (must
    run before the first JAX computation). ``auto``/``tpu`` leave JAX's
    default resolution alone (tpu when reachable, else cpu), because
    requesting ``tpu`` explicitly would hard-fail on CPU-only hosts where
    the reference's torch fallback (reference device.py:17-57) degrades
    gracefully instead.
    """
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")


def device_pull(x):
    """Fetch a device array to host as a numpy array — ALWAYS use this
    (never ``np.asarray``) for anything bigger than a few MB.

    On the tunneled TPU backend ``np.asarray(jax_array)`` routes through a
    chunked per-round-trip protocol that measured **0.2 MB/s** on a 58 MB
    incompressible int32 table (339 s), while ``jax.device_get`` on the
    same array moves ~30 MB/s (1.9 s) — a 177x gap. Checkpoint flushes,
    PQ code pulls, and corpus materialisation all sit on this path.
    Host-resident inputs (numpy arrays, lists) pass through unchanged.
    """
    import numpy as np

    if isinstance(x, jax.Array):
        return np.asarray(jax.device_get(x))
    return np.asarray(x)


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Enable the persistent XLA compilation cache.

    Graph kernels (bulk edge construction, beam search per ef config)
    compile once per shape; on remote/tunneled TPU backends a cold compile
    can cost minutes, so every entry point (bench, API server, graft entry)
    turns this on. Returns the cache directory.
    """
    global _CACHE_ENABLED
    # VDB_FORCE_PLATFORM=cpu lets any entry point (bench scripts
    # included) run off-TPU: the env var JAX_PLATFORMS alone is
    # overridden by the axon plugin, only the config flag holds
    forced = os.environ.get("VDB_FORCE_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
    cache_dir = path or os.environ.get(
        "VDB_TPU_COMPILE_CACHE",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    if not _CACHE_ENABLED:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED = True
    return cache_dir

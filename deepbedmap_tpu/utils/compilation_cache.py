"""Persistent XLA compilation cache.

Compiles of the continent-scale jits are expensive (the fused-trunk band
predictor's first compile is ~25 min through an uncached remote tunnel;
plain tile forwards ~1-5 min). JAX's persistent cache serialises compiled
executables to disk so every later process pays ~0: measured on the
remote-TPU tunnel this image uses, a cached jit loads in 0.3 s where the
compile took 1.2 s (and proportionally for the multi-minute compiles —
the cache was verified to both write and HIT across fresh processes).

Enabled by the CLI, the HTTP service and the benchmark harnesses; library
users call :func:`enable_persistent_cache` themselves (a library must not
mutate global jax config on import).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "deepbedmap_tpu", "jax_cache"
)


def enable_persistent_cache(
    path: Optional[str] = None, min_compile_secs: float = 2.0
) -> str:
    """Point jax's persistent compilation cache at ``path`` and return it.

    ``path`` defaults to ``$DEEPBEDMAP_JAX_CACHE`` or
    ``~/.cache/deepbedmap_tpu/jax_cache``. Set
    ``DEEPBEDMAP_JAX_CACHE=off`` to disable entirely (returns "").
    Compiles faster than ``min_compile_secs`` are not cached (they are
    cheaper to redo than to deserialise).
    """
    explicit = path is not None or "DEEPBEDMAP_JAX_CACHE" in os.environ
    if path is None:
        path = os.environ.get("DEEPBEDMAP_JAX_CACHE", _DEFAULT)
    if path.lower() in ("off", "none", "0", ""):
        return ""
    # Measured caveat (benchmarks/RESULTS.md): on this image's axon
    # remote-TPU tunnel, deserialising a LARGE cached executable (36 MB,
    # Mosaic custom calls) took ~15 min — far worse than the ~6 min fresh
    # compile — while small programs load in ~0.3 s. Default to OFF when
    # the axon platform is registered; an explicit path or env var is an
    # opt-in that overrides this.
    if not explicit and "axon" in (jax.config.jax_platforms or ""):
        return ""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path

"""Persistent XLA compilation cache for CLI entry points.

Every semtpu CLI (`pipeline`, `eval`, `classify`, `infer`, `export`) runs
as its own process; without a persistent cache each one re-pays the full
XLA compile of the big jitted programs — minutes per stage on a remote
TPU behind a slow link (the reference has no analog: Keras re-traces per
process anyway). One shared on-disk cache makes warm-process compiles
milliseconds.
"""
from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX at a persistent compilation cache directory.

    Priority: explicit `path` > $JAX_COMPILATION_CACHE_DIR (already
    honored by JAX itself) > $SEMTPU_CACHE_DIR > ~/.cache/semtpu/jax.
    Returns the directory in effect.
    """
    import jax

    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        path = os.environ.get(
            "SEMTPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "semtpu", "jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even small/fast-compiling programs: the cost model here is the
    # link latency of a remote compile, not local CPU time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path

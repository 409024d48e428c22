"""Persistent XLA compilation cache.

The remote-compile (axon) path costs 1-3 min per train-phase program;
the persistent cache makes every rerun of an identical program a disk
load instead (verified: bench.py second-run compile 98s -> <10s). Keyed
by HLO + compile options + backend version, so it is always
correctness-preserving.

Enabled by every CLI/bench entry point. Override the location with
IBL_NERF_CACHE_DIR; disable with IBL_NERF_CACHE_DIR=off.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    cache_dir = cache_dir or os.environ.get("IBL_NERF_CACHE_DIR",
                                            "/tmp/jax_cache")
    if cache_dir == "off":
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        # cache even when only a minority of compiles are long
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return cache_dir

"""Runtime setup helpers for entry points (bench, CLIs, tools)."""
from __future__ import annotations

import os


def setup_jax(cache_dir: str = "/root/.jax_cache"):
    """Enable the persistent compilation cache (compiles through the remote
    TPU tunnel are expensive; caching makes reruns start in seconds) and
    sane defaults. Call before first jax use."""
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax

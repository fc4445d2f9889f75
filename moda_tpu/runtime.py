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
    # Pin matmul precision so training and bench measure the same numerics:
    # 'default' = bf16 multiply / f32 accumulate on the MXU for f32 arrays
    # (the implicit JAX default; made explicit so bench.py can report it).
    jax.config.update("jax_default_matmul_precision", "default")
    return jax

"""Micro-benchmark: feat-match OT variants on the production shape.

Compares (a) dense fp32 sinkhorn vs (b) dense with bf16 K matvecs —
[2048 rays x 8000 grid], 20 iters. (A Pallas low-rank fused kernel was
measured and removed: the dense fp32 loop runs in 0.02 ms, ~0.03% of a
training step, so there is nothing for a kernel to win.)
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from moda_tpu.runtime import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    N, M = 2048, 8000
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(N, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    vol = rng.normal(size=(M, 16)).astype(np.float32)
    vol /= np.linalg.norm(vol, axis=-1, keepdims=True)
    f = jnp.asarray(feats)
    v = jnp.asarray(vol)

    @jax.jit
    def dense_fp32(f, v):
        K = jnp.exp(-(1.0 - f @ v.T) / 0.03)
        a = jnp.full((N, 1), 1.0 / N)

        def body(_, a):
            b = (1.0 / M) / (K.T @ a + 1e-8)
            return (1.0 / N) / (K @ b + 1e-8)

        a = jax.lax.fori_loop(0, 20, body, a)
        return a

    @jax.jit
    def dense_bf16(f, v):
        K = jnp.exp(-(1.0 - f @ v.T) / 0.03)
        Kb = K.astype(jnp.bfloat16)
        a = jnp.full((N, 1), 1.0 / N)

        def body(_, a):
            Ka = jax.lax.dot(Kb.T, a.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            b = (1.0 / M) / (Ka + 1e-8)
            Kb_ = jax.lax.dot(Kb, b.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            return (1.0 / N) / (Kb_ + 1e-8)

        return jax.lax.fori_loop(0, 20, body, a)

    for name, fn in [("dense_fp32", dense_fp32), ("dense_bf16", dense_bf16)]:
        try:
            out = fn(f, v)
            jax.block_until_ready(out)
            n = 50
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(f, v)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n
            print(f"{name:16s} {dt*1e3:7.3f} ms  a[0]={float(out[0,0]):.3e}", flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED: {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

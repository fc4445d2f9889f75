"""K-means (Lloyd iterations) in pure JAX — replaces kmeans_pytorch used
by bone re-initialization (geom_utils.py:857-903). Deterministic given the
key, so every data-parallel replica computes identical centers and the
reference's post-reinit broadcasts (train_utils.py:1136-1152) are
unnecessary.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(key: jax.Array, points: jnp.ndarray, k: int, iters: int = 100):
    """points [N,3] -> centers [k,3]. kmeans++-free: random init + Lloyd."""
    N = points.shape[0]
    init_idx = jax.random.choice(key, N, (k,), replace=False)
    centers = points[init_idx]

    def step(_, centers):
        d = (
            jnp.sum(points * points, -1)[:, None]
            + jnp.sum(centers * centers, -1)[None, :]
            - 2.0 * points @ centers.T
        )
        assign = jnp.argmin(d, -1)  # [N]
        one_hot = jax.nn.one_hot(assign, k, dtype=points.dtype)  # [N,k]
        counts = one_hot.sum(0)  # [k]
        sums = one_hot.T @ points  # [k,3]
        new_centers = sums / jnp.maximum(counts[:, None], 1.0)
        # keep old center for empty clusters
        return jnp.where(counts[:, None] > 0, new_centers, centers)

    return jax.lax.fori_loop(0, iters, step, centers)

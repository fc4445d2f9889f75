"""Bidirectional chamfer distance + F-score, pure JAX (XLA-tiled).

TPU-native replacement of the reference's CUDA extension
third_party/chamfer3D/{chamfer3D.cu,dist_chamfer_3D.py} (brute-force
nearest neighbor) and third_party/fscore.py:28-41. The all-pairs distance
matrix is computed in tiles so memory stays bounded; matmul lands on MXU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _min_dist_sq(x: jnp.ndarray, y: jnp.ndarray, tile: int = 4096):
    """For each x_i, min_j |x_i - y_j|^2 and argmin.  x [N,3], y [M,3]."""
    N = x.shape[0]
    pad = (-N) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xt = xp.reshape(-1, tile, 3)
    y_sq = jnp.sum(y * y, -1)

    def one_tile(xtile):
        sq = jnp.sum(xtile * xtile, -1)[:, None] + y_sq[None, :] - 2.0 * xtile @ y.T
        return jnp.min(sq, -1), jnp.argmin(sq, -1)

    d, idx = jax.lax.map(one_tile, xt)
    d = d.reshape(-1)[:N]
    idx = idx.reshape(-1)[:N]
    return jnp.maximum(d, 0.0), idx


@partial(jax.jit, static_argnames=("tile",))
def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray, tile: int = 4096):
    """Returns (dist_x [N], dist_y [M], idx_x [N], idx_y [M]) — squared
    distances, matching the CUDA kernel's output contract
    (dist_chamfer_3D.py:69-117 for 1-batch inputs)."""
    dx, ix = _min_dist_sq(x, y, tile)
    dy, iy = _min_dist_sq(y, x, tile)
    return dx, dy, ix, iy


def fscore(dist1: jnp.ndarray, dist2: jnp.ndarray, threshold: float):
    """F-score at squared-distance threshold (third_party/fscore.py:28-41)."""
    precision_1 = jnp.mean((dist1 < threshold).astype(jnp.float32))
    precision_2 = jnp.mean((dist2 < threshold).astype(jnp.float32))
    f = 2 * precision_1 * precision_2 / jnp.maximum(precision_1 + precision_2, 1e-9)
    return f, precision_1, precision_2

"""Point-cloud ICP alignment, JAX (replaces pytorch3d.ops.iterative_closest_point
used by the AMA eval at scripts/visualize/render_vis.py:390)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from moda_tpu.ops.chamfer import _min_dist_sq


def _procrustes(x: jnp.ndarray, y: jnp.ndarray):
    """Best-fit rigid transform mapping x -> y (Kabsch/Umeyama, no scale)."""
    mx = x.mean(0)
    my = y.mean(0)
    xc = x - mx
    yc = y - my
    H = xc.T @ yc
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.asarray([1.0, 1.0, d]))
    R = Vt.T @ D @ U.T
    t = my - R @ mx
    return R, t


@partial(jax.jit, static_argnames=("iters",))
def icp_align(src: jnp.ndarray, dst: jnp.ndarray, iters: int = 20):
    """Iteratively align src [N,3] to dst [M,3]. Returns (R, t) with
    aligned = src @ R.T + t."""

    def body(_, Rt):
        R, t = Rt
        cur = src @ R.T + t
        _, idx = _min_dist_sq(cur, dst)
        matched = dst[idx]
        dR, dt = _procrustes(cur, matched)
        return dR @ R, dR @ t + dt

    R0 = jnp.eye(3)
    t0 = jnp.zeros(3)
    return jax.lax.fori_loop(0, iters, body, (R0, t0))

"""SE(3) / rtk-vector algebra, pure JAX.

"rtk" follows the reference layout: a 12-vector (r1..r9, t1..t3) per
transform, or a 3x4 / 4x4 matrix. Functional equivalents of
geom_utils.py:113-199 (rtmat_invert/rtk_invert/rts_invert/rtk_to_4x4/
rtk_compose/vec_to_sim3).
"""
from __future__ import annotations

import jax.numpy as jnp

from moda_tpu.core import quat as Q


def rts_invert(rts: jnp.ndarray) -> jnp.ndarray:
    """Invert [..., 3, 4] rigid transforms."""
    rmat = rts[..., :3, :3]
    tmat = rts[..., :3, 3:]
    rmat_i = jnp.swapaxes(rmat, -1, -2)
    tmat_i = -rmat_i @ tmat
    return jnp.concatenate([rmat_i, tmat_i], axis=-1)


def rtmat_invert(rmat: jnp.ndarray, tmat: jnp.ndarray):
    """Invert rotation [...,3,3] + translation [...,3]."""
    rts = jnp.concatenate([rmat, tmat[..., None]], axis=-1)
    rts_i = rts_invert(rts)
    return rts_i[..., :3, :3], rts_i[..., :3, 3]


def vec_to_rts(rtk: jnp.ndarray) -> jnp.ndarray:
    """12-vector [..., 12] -> [..., 3, 4]."""
    rmat = rtk[..., :9].reshape(rtk.shape[:-1] + (3, 3))
    tmat = rtk[..., 9:12]
    return jnp.concatenate([rmat, tmat[..., None]], axis=-1)


def rts_to_vec(rts: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 4] -> 12-vector [..., 12]."""
    rvec = rts[..., :3, :3].reshape(rts.shape[:-2] + (9,))
    tvec = rts[..., :3, 3]
    return jnp.concatenate([rvec, tvec], axis=-1)


def rtk_invert(rtk: jnp.ndarray) -> jnp.ndarray:
    """Invert 12-vector transforms [..., 12] (geom_utils.py:124-140)."""
    return rts_to_vec(rts_invert(vec_to_rts(rtk)))


def rtk_to_4x4(rtk: jnp.ndarray) -> jnp.ndarray:
    """12-vector [..., 12] -> homogeneous [..., 4, 4]."""
    rts = vec_to_rts(rtk)
    bottom = jnp.zeros(rts.shape[:-2] + (1, 4), dtype=rtk.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([rts, bottom], axis=-2)


def rtk_compose(rtk1: jnp.ndarray, rtk2: jnp.ndarray) -> jnp.ndarray:
    """Compose 12-vector transforms: result = rtk1 @ rtk2 (geom_utils.py:170-185)."""
    m = rtk_to_4x4(rtk1) @ rtk_to_4x4(rtk2)
    return rts_to_vec(m[..., :3, :])


def vec_to_sim3(vec: jnp.ndarray):
    """Bone 10-vector [..., 10] -> (center [...,3], orient [...,3,3], scale [...,3]).

    scale is exp-parameterized (geom_utils.py:187-199).
    """
    center = vec[..., :3]
    orient = Q.q_normalize(vec[..., 3:7])
    orient = Q.q_to_matrix(orient)
    scale = jnp.exp(vec[..., 7:10])
    return center, orient, scale


def se3_refine(rt_base: jnp.ndarray, rmat_delta: jnp.ndarray, tmat_delta: jnp.ndarray) -> jnp.ndarray:
    """Right-compose a delta SE(3) onto base [..., 3/4, 4] matrices.

    t' = t + R @ dt ; R' = R @ dR  — matches moda.refine_rt (moda.py:1449-1466).
    Returns an array of the same shape as rt_base with rows 0..2 updated.
    """
    rmat = rt_base[..., :3, :3]
    tmat = rt_base[..., :3, 3]
    tmat = tmat + (rmat @ tmat_delta[..., None])[..., 0]
    rmat = rmat @ rmat_delta
    out = rt_base
    out = out.at[..., :3, :3].set(rmat)
    out = out.at[..., :3, 3].set(tmat)
    return out

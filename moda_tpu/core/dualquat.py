"""Dual-quaternion algebra, pure JAX (real-first; dq = [q_r(4), q_d(4)]).

Functional equivalent of the reference's ``nnutils/dual_quat.py`` plus the
DQ<->SE(3) conversions scattered through ``nnutils/geom_utils.py``
(bone_transform at geom_utils.py:59-111, neu_dbs DQ blend at 457-517) and
the DQ construction of DQ_RTHead (nerf.py:256-279). All ops broadcast and
are static-shape.
"""
from __future__ import annotations

import jax.numpy as jnp

from moda_tpu.core import quat as Q

_EPS = 1e-9


def dq_mul(dq1: jnp.ndarray, dq2: jnp.ndarray) -> jnp.ndarray:
    """Dual-quaternion product of [..., 8] tensors."""
    r1, d1 = dq1[..., :4], dq1[..., 4:]
    r2, d2 = dq2[..., :4], dq2[..., 4:]
    r = Q.q_mul(r1, r2)
    d = Q.q_mul(r1, d2) + Q.q_mul(d1, r2)
    return jnp.concatenate([r, d], axis=-1)


def dq_normalize(dq: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """Divide both parts by |q_r| (dual_quat.py:51-62)."""
    return dq / jnp.maximum(Q.safe_norm(dq[..., :4], keepdims=True), eps)


def dq_quaternion_conjugate(dq: jnp.ndarray) -> jnp.ndarray:
    """Elementwise quaternion conjugate of both parts (dual_quat.py:65-74)."""
    conj = jnp.asarray([1, -1, -1, -1, 1, -1, -1, -1], dtype=dq.dtype)
    return dq * conj


def dq_combined_conjugate(dq: jnp.ndarray) -> jnp.ndarray:
    """Quaternion + dual conjugate combined (dual_quat.py:76-85)."""
    conj = jnp.asarray([1, -1, -1, -1, -1, 1, 1, 1], dtype=dq.dtype)
    return dq * conj


def dq_inverse(dq: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """dq^-1 = dq* / |q_r|^2 (dual_quat.py:87-93)."""
    sq = jnp.sum(jnp.square(dq[..., :4]), axis=-1, keepdims=True)
    return dq_quaternion_conjugate(dq) / jnp.maximum(sq, eps)


def rt_to_dq(rquat: jnp.ndarray, tmat: jnp.ndarray) -> jnp.ndarray:
    """Unit rotation quaternion [...,4] + translation [...,3] -> dq [...,8].

    dq_d = 1/2 * (0, t) * q_r  — matches DQ_RTHead (nerf.py:270-276).
    """
    tquat = jnp.concatenate([jnp.zeros_like(tmat[..., :1]), tmat], axis=-1)
    dq_d = 0.5 * Q.q_mul(tquat, rquat)
    return jnp.concatenate([rquat, dq_d], axis=-1)


def dq_to_rt(dq: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """dq [...,8] (unit) -> (Rmat [...,3,3], Tmat [...,3]).

    T = 2 * q_d * q_r^-1, vector part — matches bone_transform
    (geom_utils.py:77-85).
    """
    dq_r, dq_d = dq[..., :4], dq[..., 4:]
    rmat = Q.q_to_matrix(dq_r)
    tquat = 2.0 * Q.q_mul(dq_d, Q.q_invert(dq_r))
    return rmat, tquat[..., 1:]


def dq_apply(dq: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply normalized dual quaternion(s) [...,8] to points [...,3].

    v' = v + 2 d0 x (d0 x v + a0 v) + 2 (a0 de - ae d0 + d0 x de)
    with q_r = a0 + d0, q_d = ae + de — the closed form used by
    dqs_blend_skinning_chunk (geom_utils.py:481-491).
    """
    a0 = dq[..., 0:1]
    d0 = dq[..., 1:4]
    ae = dq[..., 4:5]
    de = dq[..., 5:8]
    trans = 2.0 * (a0 * de - ae * d0 + jnp.cross(d0, de))
    rotated = pts + 2.0 * jnp.cross(d0, jnp.cross(d0, pts) + a0 * pts)
    return rotated + trans

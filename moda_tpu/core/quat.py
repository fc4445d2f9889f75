"""Quaternion algebra (real-first, wxyz convention), pure JAX.

Replaces the reference's pytorch3d.transforms usage and
``nnutils/dual_quat.py`` quaternion helpers (q_normalize/q_mul at
dual_quat.py:4-31). All functions broadcast over leading dims and are
vmap/jit-safe with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = False,
              eps: float = 1e-12) -> jnp.ndarray:
    """L2 norm with a zero-safe gradient.

    jnp.linalg.norm has a NaN gradient at exactly 0 (d|x|/dx = x/|x|);
    sqrt(max(sum(x^2), eps^2)) selects the constant branch there, giving a
    zero gradient instead. Exact for |x| > eps.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def q_normalize(q: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """Normalize quaternion(s) of shape [..., 4]."""
    return q / jnp.maximum(safe_norm(q, keepdims=True), eps)


def q_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1*q2 for [..., 4] real-first quaternions."""
    w1, x1, y1, z1 = jnp.split(q1, 4, axis=-1)
    w2, x2, y2, z2 = jnp.split(q2, 4, axis=-1)
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return jnp.concatenate([w, x, y, z], axis=-1)


def q_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (w, -x, -y, -z)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def q_invert(q: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """Inverse q* / |q|^2."""
    sq = jnp.sum(jnp.square(q), axis=-1, keepdims=True)
    return q_conjugate(q) / jnp.maximum(sq, eps)


def q_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate point(s) v [..., 3] by unit quaternion(s) q [..., 4].

    Uses v' = v + 2 q_v x (q_v x v + q_w v) — no matmul, VPU friendly.
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv + qw * v)
    return v + 2.0 * uuv


def q_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] -> rotation matrix [..., 3, 3]."""
    w, x, y, z = jnp.split(q, 4, axis=-1)
    two_s = 2.0 / jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), _EPS)
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )[..., 0, :]
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_q(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w >= 0 branchless).

    Uses the numerically robust 4-branch method, selected via where.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # candidates: 4*q_i^2 = 1 + diag combination (clamped at 0)
    qabs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    qabs = jnp.sqrt(jnp.maximum(qabs_sq, 0.0))

    # four candidate quaternions (unnormalized, each scaled by 2*qabs[i])
    cand_w = jnp.stack([qabs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1)
    cand_x = jnp.stack([m21 - m12, qabs[..., 1] ** 2, m10 + m01, m02 + m20], -1)
    cand_y = jnp.stack([m02 - m20, m10 + m01, qabs[..., 2] ** 2, m12 + m21], -1)
    cand_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, qabs[..., 3] ** 2], -1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [...,4cand,4]
    denom = 2.0 * jnp.maximum(qabs, 0.1 * _EPS ** 0.5)
    cands = cands / denom[..., :, None]

    best = jnp.argmax(qabs_sq, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q_normalize(q)


def axis_angle_to_q(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> quaternion [..., 4].

    Matches the Taylor-guarded formula at nerf.py:280-305 of the reference;
    safe_norm keeps the gradient finite at exactly zero rotation (the
    RTExplicit delta table initializes there).
    """
    angle = safe_norm(aa, keepdims=True)
    half = 0.5 * angle
    eps = 1e-6
    small = angle < eps
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle ** 2) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle)
    )
    return jnp.concatenate([jnp.cos(half), aa * sin_half_over_angle], axis=-1)


def so3_exp(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues, guarded)."""
    return q_to_matrix(axis_angle_to_q(aa))


def rot_angle(m: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Rotation angle of matrix [..., 3, 3] (geom_utils.py:1196-1205)."""
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos)

"""Skinning: Gaussian-bone weights, LBS and neural dual-quaternion blend.

Pure-JAX, fully vectorized (no host-side chunking — XLA tiles the batched
einsums onto the MXU/VPU). Functional equivalents of:

- skinning weights (Mahalanobis + MLP delta + softmax): geom_utils.py:237-302
- LBS blend + bone_transform:                           geom_utils.py:304-348, 59-111, 906-931
- NeuDBS (DQ blend) fw/bw:                              geom_utils.py:372-517
- rest-pose correction:                                 geom_utils.py:933-972
- bone generation:                                      geom_utils.py:841-855

Conventions:
  bones    [B, 10]  (center 3, orient quat wxyz 4, log-scale 3)
  bone_dqs [bs, B, 8]  dual quaternions (NeuDBS path)
  bone_rts [bs, B, 12] r1..9,t1..3 vectors (LBS path)
  pts      [bs, N, 3]
  skin     [bs, N, B]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from moda_tpu.core import dualquat as DQ
from moda_tpu.core import quat as Q
from moda_tpu.core import se3 as SE3


def generate_bones(num_bones_x: int, num_bones: int, bound: float) -> jnp.ndarray:
    """Initialize bones on a regular grid (geom_utils.py:841-855)."""
    c = jnp.linspace(-bound, bound, num_bones_x)
    grid = jnp.stack(jnp.meshgrid(c, c, c, indexing="ij"), -1).reshape(-1, 3)
    center = grid[:num_bones]
    if center.shape[0] < num_bones:  # bound==0 path gives all-zero grid anyway
        center = jnp.zeros((num_bones, 3))
    orient = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (num_bones, 1))
    scale = jnp.zeros((num_bones, 3))
    return jnp.concatenate([center, orient, scale], -1)


def bone_transform_dq(bones: jnp.ndarray, dqs: jnp.ndarray) -> jnp.ndarray:
    """Move bone coordinates by dual-quaternion transforms (left-multiply).

    bones: [B, 10] or [bs, B, 10]; dqs: [bs, B, 8] -> [bs, B, 10].
    (geom_utils.py:73-86)
    """
    if bones.ndim == 2:
        bones = bones[None]
    center, orient, scale = bones[..., :3], bones[..., 3:7], bones[..., 7:10]
    rmat, tmat = DQ.dq_to_rt(dqs)
    center = (rmat @ center[..., None])[..., 0] + tmat
    orient = Q.q_mul(dqs[..., :4], orient)
    bs = dqs.shape[0]
    scale = jnp.broadcast_to(scale, (bs,) + scale.shape[-2:])
    center = jnp.broadcast_to(center, (bs,) + center.shape[-2:])
    orient = jnp.broadcast_to(orient, (bs,) + orient.shape[-2:])
    return jnp.concatenate([center, orient, scale], -1)


def bone_transform_rts(bones: jnp.ndarray, rts_vec: jnp.ndarray) -> jnp.ndarray:
    """LBS variant: rts_vec [bs, B, 12] (geom_utils.py:87-111)."""
    if bones.ndim == 2:
        bones = bones[None]
    center, orient, scale = bones[..., :3], bones[..., 3:7], bones[..., 7:10]
    rmat = rts_vec[..., :9].reshape(rts_vec.shape[:-1] + (3, 3))
    tmat = rts_vec[..., 9:12]
    center = (rmat @ center[..., None])[..., 0] + tmat
    orient = Q.q_mul(Q.matrix_to_q(rmat), orient)
    bs = rts_vec.shape[0]
    scale = jnp.broadcast_to(scale, (bs,) + scale.shape[-2:])
    center = jnp.broadcast_to(center, (bs,) + center.shape[-2:])
    orient = jnp.broadcast_to(orient, (bs,) + orient.shape[-2:])
    return jnp.concatenate([center, orient, scale], -1)


def skinning_weights(
    bones: jnp.ndarray,
    pts: jnp.ndarray,
    dskin: jnp.ndarray | None,
    log_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Gaussian-bone skinning weights with optional MLP delta.

    bones [bs,B,10] or [B,10]; pts [bs,N,3]; dskin [bs,N,B] or None;
    log_scale: scalar (skin_aux[0]).  Returns softmax weights [bs,N,B].
    (geom_utils.py:237-277: mdis = -10 * sum(100*e^ls * s * (R(c-p))^2))

    Computed as a quadratic form: sum_a s_a (R^T(c-p))_a^2 =
    (p-c)^T M (p-c) with M = R diag(s) R^T, so per point it is one
    [N,10] @ [10,B] matmul against features f(p) = (p^2, cross, p, 1) —
    the [bs,N,B,3] rotate/square intermediates of the naive form (78 MB
    each at the recipe's 2048x128x25 bundle, several HBM round trips
    fwd+bwd) never exist. Bit-identical math up to fp reassociation
    (regression-tested against the naive form in test_core_skinning).
    """
    if bones.ndim == 2:
        bones = bones[None]
    # M_b = R diag(s) R^T (3x3 PSD per bone), built entirely from [bs,B]
    # channel slices: [bs,B,3,3] rotation-matrix intermediates tile as
    # (8,128) on the LAST TWO dims (3->8, 3->128: 171x padding, ~218 MB
    # at the 2048-ray bundle) and cost ~3 ms/step in pure layout traffic.
    q = bones[..., 3:7]
    w, x, y, z = (q[..., i] for i in range(4))  # [bs,B]
    ts = 2.0 / jnp.maximum((q * q).sum(-1), 1e-12)  # q_to_matrix normalizer
    r00 = 1.0 - ts * (y * y + z * z)
    r01 = ts * (x * y - z * w)
    r02 = ts * (x * z + y * w)
    r10 = ts * (x * y + z * w)
    r11 = 1.0 - ts * (x * x + z * z)
    r12 = ts * (y * z - x * w)
    r20 = ts * (x * z - y * w)
    r21 = ts * (y * z + x * w)
    r22 = 1.0 - ts * (x * x + y * y)
    s0 = jnp.exp(bones[..., 7])
    s1 = jnp.exp(bones[..., 8])
    s2 = jnp.exp(bones[..., 9])
    # M_il = sum_j s_j R_ij R_lj (6 unique entries, symmetric)
    m00 = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    m11 = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    m22 = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    m01 = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    m02 = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    m12 = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    c0, c1, c2 = (bones[..., i] for i in range(3))
    mc0 = m00 * c0 + m01 * c1 + m02 * c2
    mc1 = m01 * c0 + m11 * c1 + m12 * c2
    mc2 = m02 * c0 + m12 * c1 + m22 * c2
    cmc = c0 * mc0 + c1 * mc1 + c2 * mc2
    # bone coefficient rows: p^T M p - 2 p^T (Mc) + cMc
    G = jnp.stack([
        m00, m11, m22, 2.0 * m01, 2.0 * m02, 2.0 * m12,
        -2.0 * mc0, -2.0 * mc1, -2.0 * mc2, cmc,
    ], -1)  # [bs,B,10]
    f = jnp.concatenate([
        pts * pts,
        pts[..., 0:1] * pts[..., 1:2], pts[..., 0:1] * pts[..., 2:3],
        pts[..., 1:2] * pts[..., 2:3],
        pts, jnp.ones_like(pts[..., :1]),
    ], -1)  # [bs,N,10]
    G = jnp.broadcast_to(jnp.swapaxes(G, -1, -2), (pts.shape[0], 10, G.shape[1]))
    # fp32 accumulation: the quadratic form subtracts large p^2/c^2 terms
    # to produce a small squared distance — bf16 MXU passes (the TPU
    # default for f32 operands) would put ~1e-3 absolute noise on logits
    # that -1000*e^ls then amplifies; K=10 makes HIGHEST free here
    mdis = jnp.einsum("bnf,bfk->bnk", f, G,
                      precision=jax.lax.Precision.HIGHEST)  # [bs,N,B]
    mdis = mdis * (-1000.0 * jnp.exp(log_scale))
    if dskin is not None:
        mdis = mdis + dskin
    return jax.nn.softmax(mdis, axis=-1)


def skinning_weights_naive(
    bones: jnp.ndarray,
    pts: jnp.ndarray,
    dskin: jnp.ndarray | None,
    log_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Direct transcription of geom_utils.py:237-277 (rotate-and-square
    over [bs,N,B,3]); kept as the conformance oracle for the quadratic-
    form fast path above."""
    if bones.ndim == 2:
        bones = bones[None]
    center, orient, scale = SE3.vec_to_sim3(bones)
    diff = center[:, None, :, :] - pts[:, :, None, :]  # [bs,N,B,3]
    local = jnp.einsum("bkij,bnkj->bnki", jnp.swapaxes(orient, -1, -2), diff)
    mdis = scale[:, None] * jnp.square(local)  # [bs,N,B,3]
    mdis = mdis * (100.0 * jnp.exp(log_scale))
    mdis = -10.0 * jnp.sum(mdis, axis=-1)  # [bs,N,B]
    if dskin is not None:
        mdis = mdis + dskin
    return jax.nn.softmax(mdis, axis=-1)


def lbs_blend(rts: jnp.ndarray, skin: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Linear blend skinning (geom_utils.py:304-325).

    rts [bs,B,3,4]; skin [bs,N,B]; pts [bs,N,3] -> [bs,N,3].
    """
    rmat = rts[..., :3, :3]  # [bs,B,3,3]
    tmat = rts[..., :3, 3]  # [bs,B,3]
    rmat_w = jnp.einsum("bnk,bkij->bnij", skin, rmat)
    tmat_w = jnp.einsum("bnk,bki->bni", skin, tmat)
    return (rmat_w @ pts[..., None])[..., 0] + tmat_w


def dq_blend(dqs: jnp.ndarray, skin: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Dual-quaternion blend skinning (geom_utils.py:457-517).

    dqs [bs,B,8]; skin [bs,N,B]; pts [bs,N,3] -> [bs,N,3].
    """
    weighted = jnp.einsum("bnk,bkd->bnd", skin, dqs)  # [bs,N,8]
    return DQ.dq_apply(DQ.dq_normalize(weighted), pts)


def lbs(bones, rts_fw_vec, skin, pts, backward=True):
    """LBS warp + deformed bones (geom_utils.py:906-931).

    rts_fw_vec [bs,B,12].
    """
    rts_fw = SE3.vec_to_rts(rts_fw_vec)
    bones_dfm = bone_transform_rts(bones, rts_fw_vec)
    if backward:
        rts_bw = SE3.rts_invert(rts_fw)
        xyz = lbs_blend(rts_bw, skin, pts)
    else:
        xyz = lbs_blend(rts_fw, skin, pts)
    return xyz, bones_dfm


def neu_dbs(bones, dqs_fw, skin, pts, dis: jnp.ndarray | None = None, backward=True):
    """Neural dual-quaternion blend skinning (geom_utils.py:372-456).

    dqs_fw [bs,B,8] forward (canonical->frame) bone transforms.
    dis: optional displacement-field output [bs,N,3] (nerf_dis), already
         evaluated by the caller at the appropriate input points.
    backward=True: frame->canonical (applies dq_inverse, subtracts dis).
    Returns (xyz [bs,N,3], bones_dfm [bs,B,10]).
    """
    bones_dfm = bone_transform_dq(bones, dqs_fw)
    if backward:
        dq = DQ.dq_inverse(dqs_fw)
        xyz = dq_blend(dq, skin, pts)
        if dis is not None:
            xyz = xyz - dis
    else:
        if dis is not None:
            pts = pts + dis
        xyz = dq_blend(dqs_fw, skin, pts)
    return xyz, bones_dfm


def correct_bones_dq(bones: jnp.ndarray, dq_rst: jnp.ndarray) -> jnp.ndarray:
    """Move bones to the rest configuration: bones* = (Jb*)^-1 . bones.

    dq_rst [1,B,8] (rest-pose head output). (geom_utils.py:933-949,
    inverse=True path used at model build/eval.)
    """
    dq_rst_inv = DQ.dq_inverse(dq_rst)
    return bone_transform_dq(bones, dq_rst_inv)[0]


def correct_rest_pose_dq(dqs_fw: jnp.ndarray, dq_rst: jnp.ndarray) -> jnp.ndarray:
    """delta(Jb) = (Jb*)^-1 . Jb (geom_utils.py:951-967).

    dqs_fw [..., B, 8]; dq_rst [B, 8] or [1, B, 8].
    """
    dq_rst_inv = DQ.dq_inverse(dq_rst)
    dq_rst_inv = jnp.broadcast_to(dq_rst_inv.reshape((1,) * (dqs_fw.ndim - 2) + dq_rst_inv.shape[-2:]), dqs_fw.shape)
    return DQ.dq_mul(dq_rst_inv, dqs_fw)


def correct_bones_rts(bones: jnp.ndarray, rts_rst_vec: jnp.ndarray) -> jnp.ndarray:
    """LBS variant of correct_bones (geom_utils.py:946-948)."""
    rts_inv = SE3.rtk_invert(rts_rst_vec)
    return bone_transform_rts(bones, rts_inv.reshape(1, -1, 12))[0]


def correct_rest_pose_rts(rts_fw_vec: jnp.ndarray, rts_rst_vec: jnp.ndarray) -> jnp.ndarray:
    """LBS variant of correct_rest_pose (geom_utils.py:968-972)."""
    rst_inv = SE3.rtk_invert(rts_rst_vec)
    rst_inv = jnp.broadcast_to(
        rst_inv.reshape((1,) * (rts_fw_vec.ndim - 2) + rst_inv.shape[-2:]), rts_fw_vec.shape
    )
    return SE3.rtk_compose(rst_inv, rts_fw_vec)

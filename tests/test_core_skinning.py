import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from moda_tpu.core import dualquat as DQ
from moda_tpu.core import skinning as SK
from moda_tpu.core import se3 as SE3


def make_bones(rng, B):
    center = rng.normal(size=(B, 3)).astype(np.float32)
    q = rng.normal(size=(B, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    logscale = rng.normal(size=(B, 3)).astype(np.float32) * 0.1
    return np.concatenate([center, q, logscale], -1)


def make_dqs(rng, bs, B):
    q = rng.normal(size=(bs, B, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(bs, B, 3)).astype(np.float32)
    return np.asarray(DQ.rt_to_dq(jnp.asarray(q), jnp.asarray(t))), q, t


def test_skinning_weights_softmax_and_peak(rng):
    B = 5
    bones = make_bones(rng, B)
    # put a point exactly at bone 2's center -> weight should peak there
    pts = np.tile(bones[2, :3], (1, 4, 1)).astype(np.float32)
    w = np.asarray(
        SK.skinning_weights(jnp.asarray(bones), jnp.asarray(pts), None, jnp.asarray(0.0))
    )
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert (w.argmax(-1) == 2).all()


def test_single_bone_blend_is_rigid(rng):
    """With one bone (weight 1), both LBS and DQ blend equal the rigid transform."""
    bs, N = 2, 6
    dqs, q, t = make_dqs(rng, bs, 1)
    pts = rng.normal(size=(bs, N, 3)).astype(np.float32)
    skin = np.ones((bs, N, 1), np.float32)

    out_dq = np.asarray(SK.dq_blend(jnp.asarray(dqs), jnp.asarray(skin), jnp.asarray(pts)))
    rmat = R.from_quat(q.reshape(-1, 4)[:, [1, 2, 3, 0]]).as_matrix().reshape(bs, 1, 3, 3)
    expect = np.einsum("bij,bnj->bni", rmat[:, 0], pts) + t[:, 0][:, None]
    np.testing.assert_allclose(out_dq, expect, atol=1e-4)

    rts = np.concatenate([rmat.reshape(bs, 1, 9), t.reshape(bs, 1, 3)], -1)
    out_lbs = np.asarray(
        SK.lbs_blend(SE3.vec_to_rts(jnp.asarray(rts)), jnp.asarray(skin), jnp.asarray(pts))
    )
    np.testing.assert_allclose(out_lbs, expect, atol=1e-4)


def test_neudbs_backward_forward_cycle(rng):
    """fw(bw(x)) ~= x when weights are computed consistently (single bone exact)."""
    bs, N = 2, 5
    dqs, _, _ = make_dqs(rng, bs, 1)
    pts = rng.normal(size=(bs, N, 3)).astype(np.float32)
    skin = np.ones((bs, N, 1), np.float32)
    bones = make_bones(rng, 1)

    canonical, _ = SK.neu_dbs(jnp.asarray(bones), jnp.asarray(dqs), jnp.asarray(skin), jnp.asarray(pts), backward=True)
    back, _ = SK.neu_dbs(jnp.asarray(bones), jnp.asarray(dqs), jnp.asarray(skin), canonical, backward=False)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_lbs_backward_forward_cycle(rng):
    bs, N, B = 2, 5, 1
    rmat = R.from_rotvec(rng.normal(size=(bs * B, 3))).as_matrix().astype(np.float32)
    t = rng.normal(size=(bs, B, 3)).astype(np.float32)
    rts = np.concatenate([rmat.reshape(bs, B, 9), t], -1)
    pts = rng.normal(size=(bs, N, 3)).astype(np.float32)
    skin = np.ones((bs, N, B), np.float32)
    bones = make_bones(rng, B)

    canonical, _ = SK.lbs(jnp.asarray(bones), jnp.asarray(rts), jnp.asarray(skin), jnp.asarray(pts), backward=True)
    back, _ = SK.lbs(jnp.asarray(bones), jnp.asarray(rts), jnp.asarray(skin), canonical, backward=False)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_bone_transform_dq_moves_center(rng):
    B = 3
    bones = make_bones(rng, B)
    dqs, q, t = make_dqs(rng, 1, B)
    out = np.asarray(SK.bone_transform_dq(jnp.asarray(bones), jnp.asarray(dqs)))
    rmat = R.from_quat(q[0][:, [1, 2, 3, 0]]).as_matrix()
    expect_center = np.einsum("bij,bj->bi", rmat, bones[:, :3]) + t[0]
    np.testing.assert_allclose(out[0, :, :3], expect_center, atol=1e-4)
    # scales unchanged
    np.testing.assert_allclose(out[0, :, 7:], bones[:, 7:], atol=1e-6)


def test_correct_rest_pose_identity(rng):
    """If rest pose == fw pose, delta must be the identity dq."""
    B = 4
    dqs, _, _ = make_dqs(rng, 1, B)
    delta = np.asarray(SK.correct_rest_pose_dq(jnp.asarray(dqs), jnp.asarray(dqs[0])))
    ident = np.tile(np.asarray([1, 0, 0, 0, 0, 0, 0, 0], np.float32), (1, B, 1))
    np.testing.assert_allclose(delta, ident, atol=1e-5)


def test_generate_bones():
    bones = np.asarray(SK.generate_bones(3, 25, 0.5))
    assert bones.shape == (25, 10)
    np.testing.assert_allclose(bones[:, 3:7], np.tile([1, 0, 0, 0], (25, 1)))


def test_skinning_weights_quadratic_matches_naive(rng):
    """The quadratic-form fast path (one [N,10]@[10,B] matmul) must match
    the rotate-and-square transcription of geom_utils.py:237-277 — values
    AND gradients (it sits on the training hot path)."""
    import jax

    B, bs, N = 7, 3, 11
    bones = make_bones(rng, B)
    pts = rng.normal(size=(bs, N, 3)).astype(np.float32) * 0.4
    dskin = rng.normal(size=(bs, N, B)).astype(np.float32) * 0.1
    ls = jnp.asarray(0.3)

    for bn in (jnp.asarray(bones), jnp.asarray(np.tile(bones, (bs, 1, 1)))):
        w_fast = np.asarray(SK.skinning_weights(bn, jnp.asarray(pts), jnp.asarray(dskin), ls))
        w_ref = np.asarray(SK.skinning_weights_naive(bn, jnp.asarray(pts), jnp.asarray(dskin), ls))
        np.testing.assert_allclose(w_fast, w_ref, atol=2e-5)

    def loss(fn, bn, p, d, s):
        return (fn(bn, p, d, s) * jnp.arange(B)).sum()

    bn = jnp.asarray(bones)
    g_fast = jax.grad(lambda *a: loss(SK.skinning_weights, *a), argnums=(0, 1, 2, 3))(
        bn, jnp.asarray(pts), jnp.asarray(dskin), ls)
    g_ref = jax.grad(lambda *a: loss(SK.skinning_weights_naive, *a), argnums=(0, 1, 2, 3))(
        bn, jnp.asarray(pts), jnp.asarray(dskin), ls)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)

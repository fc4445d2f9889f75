import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from moda_tpu.core import dualquat as DQ
from moda_tpu.core import quat as Q


def random_rt(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(n, 3)).astype(np.float32)
    return q, t


def test_rt_dq_roundtrip(rng):
    q, t = random_rt(rng, 16)
    dq = DQ.rt_to_dq(jnp.asarray(q), jnp.asarray(t))
    rmat, tmat = DQ.dq_to_rt(dq)
    expect_R = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(np.asarray(rmat), expect_R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tmat), t, atol=1e-5)


def test_dq_apply_equals_rigid_transform(rng):
    q, t = random_rt(rng, 8)
    pts = rng.normal(size=(8, 3)).astype(np.float32)
    dq = DQ.rt_to_dq(jnp.asarray(q), jnp.asarray(t))
    out = np.asarray(DQ.dq_apply(dq, jnp.asarray(pts)))
    m = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    expect = np.einsum("nij,nj->ni", m, pts) + t
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_dq_mul_composes_transforms(rng):
    q1, t1 = random_rt(rng, 8)
    q2, t2 = random_rt(rng, 8)
    dq1 = DQ.rt_to_dq(jnp.asarray(q1), jnp.asarray(t1))
    dq2 = DQ.rt_to_dq(jnp.asarray(q2), jnp.asarray(t2))
    dq12 = DQ.dq_mul(dq1, dq2)
    pts = rng.normal(size=(8, 3)).astype(np.float32)
    out = np.asarray(DQ.dq_apply(DQ.dq_normalize(dq12), jnp.asarray(pts)))
    # apply dq2 then dq1
    step = np.asarray(DQ.dq_apply(dq2, jnp.asarray(pts)))
    expect = np.asarray(DQ.dq_apply(dq1, jnp.asarray(step)))
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_dq_inverse(rng):
    q, t = random_rt(rng, 8)
    dq = DQ.rt_to_dq(jnp.asarray(q), jnp.asarray(t))
    ident = DQ.dq_mul(dq, DQ.dq_inverse(dq))
    expect = np.tile(np.asarray([1, 0, 0, 0, 0, 0, 0, 0], np.float32), (8, 1))
    np.testing.assert_allclose(np.asarray(ident), expect, atol=1e-5)


def test_dq_inverse_applies_inverse_transform(rng):
    q, t = random_rt(rng, 8)
    pts = rng.normal(size=(8, 3)).astype(np.float32)
    dq = DQ.rt_to_dq(jnp.asarray(q), jnp.asarray(t))
    fwd = DQ.dq_apply(dq, jnp.asarray(pts))
    back = np.asarray(DQ.dq_apply(DQ.dq_normalize(DQ.dq_inverse(dq)), fwd))
    np.testing.assert_allclose(back, pts, atol=1e-4)

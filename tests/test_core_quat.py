import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from moda_tpu.core import quat as Q


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_q_mul_matches_scipy(rng):
    q1 = random_quats(rng, 16)
    q2 = random_quats(rng, 16)
    out = np.asarray(Q.q_mul(jnp.asarray(q1), jnp.asarray(q2)))
    # scipy uses xyzw; convert
    r1 = R.from_quat(q1[:, [1, 2, 3, 0]])
    r2 = R.from_quat(q2[:, [1, 2, 3, 0]])
    expect = (r1 * r2).as_quat()[:, [3, 0, 1, 2]]
    # sign ambiguity
    sign = np.sign(np.sum(out * expect, -1, keepdims=True))
    np.testing.assert_allclose(out, sign * expect, atol=1e-5)


def test_q_to_matrix_roundtrip(rng):
    q = random_quats(rng, 32)
    m = Q.q_to_matrix(jnp.asarray(q))
    expect = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(np.asarray(m), expect, atol=1e-5)
    q2 = np.asarray(Q.matrix_to_q(m))
    sign = np.sign(np.sum(q2 * q, -1, keepdims=True))
    np.testing.assert_allclose(sign * q2, q, atol=1e-5)


def test_q_apply_equals_matrix(rng):
    q = random_quats(rng, 8)
    v = rng.normal(size=(8, 3)).astype(np.float32)
    out = np.asarray(Q.q_apply(jnp.asarray(q), jnp.asarray(v)))
    m = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    expect = np.einsum("nij,nj->ni", m, v)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_q_invert(rng):
    q = rng.normal(size=(8, 4)).astype(np.float32) * 2.0
    prod = Q.q_mul(jnp.asarray(q), Q.q_invert(jnp.asarray(q)))
    expect = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (8, 1))
    np.testing.assert_allclose(np.asarray(prod), expect, atol=1e-5)


def test_axis_angle_and_so3_exp(rng):
    aa = rng.normal(size=(16, 3)).astype(np.float32)
    aa[0] = 0.0  # small-angle branch
    aa[1] = 1e-8
    m = np.asarray(Q.so3_exp(jnp.asarray(aa)))
    expect = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(m, expect, atol=1e-5)


def test_rot_angle(rng):
    aa = rng.normal(size=(8, 3)).astype(np.float32)
    m = R.from_rotvec(aa).as_matrix().astype(np.float32)
    ang = np.asarray(Q.rot_angle(jnp.asarray(m)))
    expect = np.linalg.norm(aa, axis=-1) % (2 * np.pi)
    expect = np.minimum(expect, 2 * np.pi - expect)
    np.testing.assert_allclose(ang, expect, atol=2e-2)

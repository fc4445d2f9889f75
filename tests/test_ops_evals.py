import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from moda_tpu.ops.chamfer import chamfer_distance, fscore
from moda_tpu.ops.kmeans import kmeans
from moda_tpu.ops.sinkhorn import sinkhorn_divergence
from moda_tpu.evals.icp import icp_align
from moda_tpu.evals.sim3 import align_sim3, umeyama_alignment


def test_chamfer_identity(rng):
    x = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    d1, d2, i1, i2 = chamfer_distance(x, x)
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.arange(100))


def test_chamfer_known_offset():
    x = jnp.zeros((5, 3))
    y = jnp.ones((7, 3)) * jnp.asarray([1.0, 0, 0])
    d1, d2, _, _ = chamfer_distance(x, y)
    np.testing.assert_allclose(np.asarray(d1), 1.0, atol=1e-6)  # squared dist


def test_fscore():
    d1 = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    d2 = jnp.asarray([0.0, 10.0])
    f, p1, p2 = fscore(d1, d2, threshold=1.0)
    np.testing.assert_allclose(float(p1), 0.5)
    np.testing.assert_allclose(float(p2), 0.5)
    np.testing.assert_allclose(float(f), 0.5)


def test_kmeans_separated_clusters(rng):
    a = rng.normal(size=(50, 3)) * 0.05 + np.asarray([2, 0, 0])
    b = rng.normal(size=(50, 3)) * 0.05 + np.asarray([-2, 0, 0])
    pts = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    centers = np.asarray(kmeans(jax.random.key(0), pts, 2, iters=50))
    centers = centers[np.argsort(centers[:, 0])]
    np.testing.assert_allclose(centers[0], [-2, 0, 0], atol=0.1)
    np.testing.assert_allclose(centers[1], [2, 0, 0], atol=0.1)


def test_sinkhorn_divergence_properties(rng):
    x = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32) + 2.0)
    d_self = float(sinkhorn_divergence(x, x))
    d_xy = float(sinkhorn_divergence(x, y))
    assert abs(d_self) < 1e-3
    assert d_xy > 1.0  # clouds are ~2 apart -> divergence ~ |offset|^2/2 * something


def test_icp_recovers_rigid_transform(rng):
    src = rng.normal(size=(200, 3)).astype(np.float32)
    R_gt = R.from_rotvec([0.2, -0.1, 0.3]).as_matrix().astype(np.float32)
    t_gt = np.asarray([0.3, -0.2, 0.5], np.float32)
    dst = src @ R_gt.T + t_gt
    R_est, t_est = icp_align(jnp.asarray(src), jnp.asarray(dst), iters=30)
    aligned = src @ np.asarray(R_est).T + np.asarray(t_est)
    assert np.abs(aligned - dst).max() < 1e-2


def test_align_sim3_zero_error_when_rotated(rng):
    n = 20
    rts = np.tile(np.eye(4)[None], (n, 1, 1))
    rts[:, :3, :3] = R.from_rotvec(rng.normal(size=(n, 3)) * 0.3).as_matrix()
    rts[:, :3, 3] = rng.normal(size=(n, 3)) + 5
    # apply a global right-rotation + scale to get trajectory b
    g = R.from_rotvec([0.3, 0.1, -0.2]).as_matrix()
    rts_b = rts.copy()
    rts_b[:, :3, :3] = rts[:, :3, :3] @ g
    rts_b[:, :3, 3] = rts[:, :3, 3] * 2.0
    stats = align_sim3(rts, rts_b)
    assert stats["so3_err_mean"] < 0.5
    np.testing.assert_allclose(stats["aligned"][:, :3, 3], rts[:, :3, 3], rtol=1e-3)


def test_umeyama(rng):
    x = rng.normal(size=(3, 50))
    Rm = R.from_rotvec([0.1, 0.2, 0.3]).as_matrix()
    y = 1.7 * Rm @ x + np.asarray([[1.0], [2.0], [3.0]])
    R_est, t_est, c = umeyama_alignment(x, y, with_scale=True)
    np.testing.assert_allclose(R_est, Rm, atol=1e-6)
    np.testing.assert_allclose(c, 1.7, atol=1e-6)
    np.testing.assert_allclose(t_est, [1, 2, 3], atol=1e-6)


def test_marching_cubes_sphere():
    from moda_tpu.native import marching_cubes
    n = 32
    x = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(x, x, x, indexing="ij"), -1)
    sdf = (0.5 - np.linalg.norm(g, axis=-1)).astype(np.float32)
    v, t = marching_cubes(sdf, 0.0)
    assert len(v) > 100 and len(t) > 100
    vn = (v / (n - 1)) * 2 - 1
    r = np.linalg.norm(vn, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.02)


def test_ama_eval_pair_protocol():
    """eval_pair: identical meshes -> ~0 chamfer, F~1; pure scale
    difference is removed by the median-extent fit (render_vis.py:387-388
    fits scale before ICP); genuine shape difference -> positive chamfer."""
    from moda_tpu.evals.ama import eval_pair
    from moda_tpu.viz.render_vis import unit_sphere
    from moda_tpu.extract.mesh import Mesh

    sv, sf = unit_sphere(2)
    a = Mesh((sv * 0.5).astype(np.float32), sf)
    res_same = eval_pair(a, a, n_sample=2000, use_icp=False)
    assert res_same["chamfer"] < 0.02
    assert res_same["f@5%"] > 0.95

    # 30% scale difference: removed by the protocol's fitted scale
    b = Mesh((sv * 0.65).astype(np.float32), sf)
    res_scale = eval_pair(a, b, n_sample=2000, use_icp=True)
    assert res_scale["chamfer"] < 0.03

    # genuine shape difference (sphere vs 2:1 ellipsoid) survives the fit
    c = Mesh((sv * np.asarray([1.0, 0.5, 0.5])).astype(np.float32), sf)
    res_shape = eval_pair(a, c, n_sample=2000, use_icp=True)
    assert res_shape["chamfer"] > 0.05

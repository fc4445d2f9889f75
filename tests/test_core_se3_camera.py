import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from moda_tpu.core import se3 as SE3
from moda_tpu.core import camera as cam


def random_rts(rng, n):
    rmat = R.from_rotvec(rng.normal(size=(n, 3))).as_matrix().astype(np.float32)
    tmat = rng.normal(size=(n, 3)).astype(np.float32)
    return np.concatenate([rmat, tmat[..., None]], -1)


def test_rts_invert(rng):
    rts = random_rts(rng, 8)
    inv = np.asarray(SE3.rts_invert(jnp.asarray(rts)))
    for i in range(8):
        m = np.eye(4, dtype=np.float32)
        m[:3] = rts[i]
        mi = np.eye(4, dtype=np.float32)
        mi[:3] = inv[i]
        np.testing.assert_allclose(m @ mi, np.eye(4), atol=1e-5)


def test_rtk_compose_and_vec_roundtrip(rng):
    rts1 = random_rts(rng, 8)
    rts2 = random_rts(rng, 8)
    v1 = SE3.rts_to_vec(jnp.asarray(rts1))
    v2 = SE3.rts_to_vec(jnp.asarray(rts2))
    v12 = np.asarray(SE3.rtk_compose(v1, v2))
    for i in range(8):
        m1 = np.eye(4); m1[:3] = rts1[i]
        m2 = np.eye(4); m2[:3] = rts2[i]
        expect = (m1 @ m2)[:3]
        got = np.concatenate([v12[i, :9].reshape(3, 3), v12[i, 9:, None]], -1)
        np.testing.assert_allclose(got, expect, atol=1e-5)
    # vec <-> rts roundtrip
    np.testing.assert_allclose(np.asarray(SE3.vec_to_rts(v1)), rts1, atol=1e-6)


def test_K_mats(rng):
    K = np.abs(rng.normal(size=(5, 4)).astype(np.float32)) + 1.0
    Kmat = np.asarray(cam.K2mat(jnp.asarray(K)))
    Kinv = np.asarray(cam.K2inv(jnp.asarray(K)))
    for i in range(5):
        np.testing.assert_allclose(Kmat[i] @ Kinv[i], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.mat2K(jnp.asarray(Kmat))), K, atol=1e-6)


def test_pinhole_project_unproject(rng):
    K = np.asarray([[500.0, 500.0, 256.0, 256.0]], np.float32)
    pts = rng.normal(size=(1, 10, 3)).astype(np.float32)
    pts[..., 2] = np.abs(pts[..., 2]) + 2.0
    px = np.asarray(cam.pinhole_cam(jnp.asarray(pts), jnp.asarray(K)))
    # unproject: Kinv @ (u,v,1) * z == pts
    Kinv = np.asarray(cam.K2inv(jnp.asarray(K)))[0]
    uv1 = np.concatenate([px[0, :, :2], np.ones((10, 1), np.float32)], -1)
    rec = (uv1 @ Kinv.T) * px[0, :, 2:3]
    np.testing.assert_allclose(rec, pts[0], atol=1e-3)


def test_raycast_hits_pixel(rng):
    """Points along a ray must project back to the source pixel."""
    rmat = R.from_rotvec([0.1, 0.2, 0.3]).as_matrix().astype(np.float32)[None]
    tmat = np.asarray([[0.0, 0.1, 3.0]], np.float32)
    K = np.asarray([[500.0, 500.0, 250.0, 250.0]], np.float32)
    Kinv = np.asarray(cam.K2inv(jnp.asarray(K)))
    xys = rng.uniform(0, 512, size=(1, 7, 2)).astype(np.float32)
    near_far = np.asarray([[1.0, 5.0]], np.float32)
    rays = cam.raycast(jnp.asarray(xys), jnp.asarray(rmat), jnp.asarray(tmat), jnp.asarray(Kinv), jnp.asarray(near_far))
    # take points at several depths along each ray, project
    for alpha in [0.0, 0.5, 1.0]:
        z = np.asarray(rays.near) * (1 - alpha) + np.asarray(rays.far) * alpha
        pts_obj = np.asarray(rays.rays_o) + np.asarray(rays.rays_d) * z
        pts_cam = cam.obj_to_cam(jnp.asarray(pts_obj), jnp.asarray(rmat), jnp.asarray(tmat))
        px = np.asarray(cam.pinhole_cam(pts_cam, jnp.asarray(K)))
        np.testing.assert_allclose(px[..., :2], xys, atol=1e-2)
        np.testing.assert_allclose(px[..., 2], z[..., 0], atol=1e-3)


def test_prepare_ray_cams_identity_kaug():
    rtk = np.zeros((1, 4, 4), np.float32)
    rtk[0, :3, :3] = np.eye(3)
    rtk[0, :3, 3] = [0, 0, 3]
    rtk[0, 3] = [500, 500, 250, 250]
    kaug = np.asarray([[1.0, 1.0, 0.0, 0.0]], np.float32)
    Rm, Tm, Kinv = cam.prepare_ray_cams(jnp.asarray(rtk), jnp.asarray(kaug))
    np.testing.assert_allclose(np.asarray(Rm)[0], np.eye(3), atol=1e-6)
    expect_Kinv = np.asarray(cam.K2inv(jnp.asarray(rtk[:, 3])))[0]
    np.testing.assert_allclose(np.asarray(Kinv)[0], expect_Kinv, atol=1e-6)

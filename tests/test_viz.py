import numpy as np
import jax
import jax.numpy as jnp

from tests.test_render_pipeline import tiny_setup
from moda_tpu.viz.nvs import render_nvs, turntable_cams


def test_turntable_cams_orbit():
    base = np.zeros((4, 4), np.float32)
    base[:3, :3] = np.eye(3)
    base[:3, 3] = [0, 0, 0.3]
    base[3] = [20, 20, 8, 8]
    cams = turntable_cams(base, num_views=4)
    assert cams.shape == (4, 4, 4)
    # all cameras keep the same distance to origin
    d = [np.linalg.norm(-c[:3, :3].T @ c[:3, 3]) for c in cams]
    np.testing.assert_allclose(d, d[0], rtol=1e-5)
    # rotations valid
    for c in cams:
        np.testing.assert_allclose(c[:3, :3] @ c[:3, :3].T, np.eye(3), atol=1e-5)


def test_render_nvs_decoupled_codes():
    cfg, model, params, mvars = tiny_setup()
    base = np.zeros((4, 4), np.float32)
    base[:3, :3] = np.eye(3)
    base[:3, 3] = [0, 0, 0.3]
    base[3] = [8.0, 8.0, 4.0, 4.0]
    cams = turntable_cams(base, num_views=2)
    frames = render_nvs(model, params, mvars, cams, [0, 3], render_size=8,
                        ndepth=cfg.ndepth, chunk=64)
    assert len(frames) == 2
    assert frames[0]["img_coarse"].shape == (8, 8, 3)
    assert np.isfinite(frames[0]["img_coarse"]).all()

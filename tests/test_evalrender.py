import numpy as np
import jax
import jax.numpy as jnp

from tests.test_render_pipeline import tiny_setup
from moda_tpu.render.evalrender import make_frame_renderer


def test_frame_renderer_chunked_matches_unchunked():
    cfg, model, params, mvars = tiny_setup()
    rtk = jnp.asarray(np.concatenate([
        np.concatenate([np.eye(3), [[0], [0], [0.3]]], 1)[None],
        np.asarray([[20.0, 20.0, 4.0, 4.0]])[None, None].reshape(1, 1, 4)], 1))
    kaug = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    fid = jnp.asarray([0])
    did = jnp.zeros((1,), jnp.int32)

    r_full = make_frame_renderer(model, 8, cfg.ndepth, chunk=64, render_vis=True)
    r_chunk = make_frame_renderer(model, 8, cfg.ndepth, chunk=16, render_vis=True)  # 4 chunks
    out_f = r_full(params, mvars, rtk, kaug, fid, did)
    out_c = r_chunk(params, mvars, rtk, kaug, fid, did)
    assert out_f["img_coarse"].shape == (8, 8, 3)
    np.testing.assert_allclose(out_f["img_coarse"], out_c["img_coarse"], atol=1e-5)
    np.testing.assert_allclose(out_f["sil_coarse"], out_c["sil_coarse"], atol=1e-5)
    assert "vis_pred" in out_f and "depth_rnd" in out_f


def test_frame_renderer_with_flow():
    cfg, model, params, mvars = tiny_setup()
    rtk = jnp.asarray(np.concatenate([
        np.concatenate([np.eye(3), [[0], [0], [0.3]]], 1)[None],
        np.asarray([[20.0, 20.0, 4.0, 4.0]])[None, None].reshape(1, 1, 4)], 1))
    kaug = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    r = make_frame_renderer(model, 8, cfg.ndepth, chunk=64, with_flow=True)
    out = r(params, mvars, rtk, kaug, jnp.asarray([0]), jnp.zeros((1,), jnp.int32),
            rtk_target=rtk, frameid_target=jnp.asarray([1]))
    assert "flo_coarse" in out
    assert out["flo_coarse"].shape == (8, 8, 2)
    assert np.isfinite(out["flo_coarse"]).all()

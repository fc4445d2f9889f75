"""Golden-value regression for the L6 viz tools (VERDICT r2 #10).

Renders one NVS frame (viz/nvs.py — reference scripts/visualize/nvs.py)
and one feature-match reprojection (viz/match.py — reference
scripts/visualize/match.py:64-166) from the seeded tiny model and pins
the numbers against committed goldens, so render-path changes that move
eval outputs are caught — shape tests alone (test_viz.py) cannot.

Regenerate after an INTENTIONAL change with:
    MODA_REGEN_GOLDENS=1 python -m pytest tests/test_viz_goldens.py -q
and commit tests/goldens/viz_goldens.npz with a note of what moved.
"""
import os

import numpy as np
import pytest

from tests.test_render_pipeline import tiny_setup

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "viz_goldens.npz")


def _base_rtk():
    base = np.zeros((4, 4), np.float32)
    base[:3, :3] = np.eye(3)
    base[:3, 3] = [0, 0, 0.3]
    base[3] = [8.0, 8.0, 4.0, 4.0]
    return base


def _compute():
    from moda_tpu.viz.match import match_frames
    from moda_tpu.viz.nvs import render_nvs, turntable_cams

    cfg, model, params, mvars = tiny_setup()
    cams = turntable_cams(_base_rtk(), num_views=2)
    frames = render_nvs(model, params, mvars, cams, [0, 1], render_size=8,
                        ndepth=cfg.ndepth, chunk=64)

    rng = np.random.default_rng(11)
    feats0 = rng.normal(size=(8, 16)).astype(np.float32)
    feats0 /= np.linalg.norm(feats0, axis=-1, keepdims=True)
    xys0 = rng.uniform(2, 14, size=(8, 2)).astype(np.float32)
    kaug = np.asarray([1.0, 1.0, 0.0, 0.0], np.float32)
    pts, proj = match_frames(model, params, mvars, feats0, xys0,
                             _base_rtk(), _base_rtk(), kaug, 0, 1,
                             grid_size=cfg.feat_ndepth_grid)
    return {
        "nvs_img": np.asarray(frames[0]["img_coarse"], np.float32),
        "nvs_sil": np.asarray(frames[0]["sil_coarse"], np.float32),
        "match_pts": np.asarray(pts, np.float32),
        "match_proj": np.asarray(proj, np.float32),
    }


@pytest.mark.slow
def test_viz_goldens():
    got = _compute()
    if os.environ.get("MODA_REGEN_GOLDENS"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **got)
        pytest.skip(f"goldens regenerated at {GOLDEN}")
    if not os.path.exists(GOLDEN):
        pytest.fail("tests/goldens/viz_goldens.npz missing — run with "
                    "MODA_REGEN_GOLDENS=1 and commit it")
    with np.load(GOLDEN) as z:
        for k in ("nvs_img", "nvs_sil", "match_pts", "match_proj"):
            np.testing.assert_allclose(
                got[k], z[k], atol=2e-3,
                err_msg=f"{k} drifted from committed golden")

import os

import numpy as np

from moda_tpu.data.pfm import read_pfm, write_pfm
from moda_tpu.data.synthetic import SynthScene


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.normal(size=(8, 6, 3)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    back, scale = read_pfm(p)
    np.testing.assert_allclose(back, img, atol=0)
    gray = rng.normal(size=(5, 7)).astype(np.float32)
    write_pfm(p, gray)
    back, _ = read_pfm(p)
    np.testing.assert_allclose(back, gray, atol=0)


def test_synth_scene_geometry():
    scene = SynthScene(img_size=32, num_frames=4)
    f = scene.render_frame(0)
    assert f["img"].shape == (32, 32, 3)
    assert 0.05 < f["mask"].mean() < 0.9  # object visible, not filling frame
    # hit points lie on the surface
    pts = f["pts"][f["mask"] > 0]
    sd = scene.sdf(pts, 0.0)
    assert np.abs(sd).max() < 5e-3
    # reprojection: hit points project back to their own pixel
    R, T, K = scene.camera(0)
    cam = pts @ R.T + T
    x = cam[:, 0] / cam[:, 2] * K[0] + K[2]
    ys, xs = np.where(f["mask"] > 0)
    np.testing.assert_allclose(x, xs + 0.5, atol=0.5)


def test_synth_flow_consistency():
    """GT flow must map pixel centers of frame0 onto projections in frame1."""
    scene = SynthScene(img_size=32, num_frames=4)
    f0, f1 = scene.render_frame(0), scene.render_frame(1)
    flow = scene.flow_between(f0, f1, 1)
    assert np.isfinite(flow).all()
    # flow is zero outside mask, nonzero somewhere inside (camera moves)
    assert np.abs(flow[f0["mask"] == 0]).max() == 0
    assert np.abs(flow[f0["mask"] > 0]).max() > 1e-3


def test_synth_batch_layout():
    scene = SynthScene(img_size=16, num_frames=6)
    batch = scene.make_batch([(0, 1), (2, 3)])
    P = 16 * 16
    assert batch["imgs"].shape == (4, 3, P)
    assert batch["flow"].shape == (4, 2, P)
    assert batch["dp_feats"].shape == (4, 16, P)
    assert batch["rtk"].shape == (4, 4, 4)
    np.testing.assert_array_equal(batch["frameid"], [0, 2, 1, 3])
    # features are unit-norm on the surface
    feats = batch["dp_feats"][0].T[batch["masks"][0, 0] > 0]
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)

"""preproc_app CLI: raw frames -> full training-ready database in one
command (reference preprocess/preprocess.sh role), weight-free backends."""
import glob
import os

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def raw_frames(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(0)
    n, H, W = 5, 48, 64
    masks = d / "masks"
    os.makedirs(masks)
    for i in range(n):
        img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
        x0 = 6 + 5 * i
        img[12:36, x0:x0 + 20] = [240, 130, 40]
        cv2.imwrite(str(d / ("%05d.jpg" % i)), img)
        m = np.zeros((H, W), np.uint8)
        m[12:36, x0:x0 + 20] = 255
        cv2.imwrite(str(masks / ("%05d.png" % i)), m)
    return d, masks, n


def test_preproc_app_end_to_end(raw_frames, tmp_path):
    raw, masks, n = raw_frames
    from moda_tpu.cli import preproc_app

    db = tmp_path / "DAVIS"
    cfgs = tmp_path / "configs"
    preproc_app.main([
        "--seqname", "toy", "--input", str(raw), "--database", str(db),
        "--config_dir", str(cfgs), "--mask_dir", str(masks),
        "--img_size", "16",
    ])

    assert len(glob.glob(str(db / "JPEGImages/Full-Resolution/toy/*.jpg"))) == n
    assert len(glob.glob(str(db / "Annotations/Full-Resolution/toy/*.png"))) == n
    # zero CSE features still produce the byte-compatible artifact set
    dp = db / "Densepose/Full-Resolution/toy"
    assert len(glob.glob(str(dp / "feat-*.pfm"))) == n
    assert len(glob.glob(str(dp / "bbox-*.txt"))) == n
    assert glob.glob(str(db / "FlowFW_1/Full-Resolution/toy/flo-*.pfm"))
    assert (cfgs / "toy.config").exists()
    # line shards readable by the LineShardDataset drop-in reader
    shards = glob.glob(str(db / "Pixels/Full-Resolution/toy/1_*/0000.npy"))
    assert len(shards) == n - 1
    elem = np.load(shards[0], allow_pickle=True).item()
    assert elem["img"].shape[0] == 1 and elem["img"].shape[1] == 2

    # no masks from any source -> hard error (segmentation is required)
    with pytest.raises(SystemExit):
        preproc_app.main([
            "--seqname", "toy2", "--input", str(raw),
            "--database", str(tmp_path / "DAVIS2"),
            "--config_dir", str(cfgs), "--img_size", "16",
        ])


def test_predictor_loaders_accept_converter_layout(tmp_path):
    """The npz layouts tools/convert_all_checkpoints.py emits must load
    into predictors via preproc.checkpoints (the preproc_app consumption
    path): vcn_rob.npz={params,mean}, cse.npz={backbone,head[,ve]}."""
    from moda_tpu.preproc.checkpoints import (
        load_cse_predictor, load_pointrend_predictor, load_vcn_predictor,
        save_pytree_npz)

    vcn_p = str(tmp_path / "vcn_rob.npz")
    save_pytree_npz(vcn_p, {"params": {"w": np.ones((2, 2), np.float32)},
                            "mean": np.asarray([0.3, 0.3, 0.3], np.float32)})
    pred = load_vcn_predictor(vcn_p)
    assert pred.params["w"].shape == (2, 2)
    np.testing.assert_allclose(pred.mean, [0.3, 0.3, 0.3])

    pr_p = str(tmp_path / "pointrend.npz")
    save_pytree_npz(pr_p, {"rpn": {"w": np.zeros((1,), np.float32)}})
    assert load_pointrend_predictor(pr_p, keep_classes=(0,)).keep_classes == (0,)

    cse_p = str(tmp_path / "cse.npz")
    save_pytree_npz(cse_p, {"backbone": {"w": np.ones((1,), np.float32)},
                            "head": {"b": np.zeros((1,), np.float32)}})
    cse = load_cse_predictor(cse_p)
    assert cse.vertex_embeddings is None and "w" in cse.bp


def test_checkpoint_npz_roundtrip(tmp_path):
    from moda_tpu.preproc.checkpoints import load_pytree_npz, save_pytree_npz

    tree = {"a": {"b": np.arange(6.0).reshape(2, 3), "c": np.float32(2.0)},
            "d": np.ones((4,), np.int32)}
    p = str(tmp_path / "t.npz")
    save_pytree_npz(p, tree)
    back = load_pytree_npz(p)
    assert set(back) == {"a", "d"}
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["d"], tree["d"])

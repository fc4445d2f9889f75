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

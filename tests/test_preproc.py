import os

import numpy as np
import cv2

from moda_tpu.preproc import pipeline as PP
from moda_tpu.preproc.ama import pmat_to_rtk


def test_dis_flow_translation():
    """DIS flow recovers a synthetic integer shift."""
    rng = np.random.default_rng(0)
    img0 = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    img0 = cv2.GaussianBlur(img0, (5, 5), 1.5)
    shift = 3
    img1 = np.roll(img0, shift, axis=1)
    flow = PP.dis_flow(img0, img1)
    inner = flow[16:48, 16:48]
    assert abs(np.median(inner[..., 0]) - shift) < 1.0
    assert abs(np.median(inner[..., 1])) < 1.0


def test_fb_confidence_consistency():
    h = w = 32
    fw = np.full((h, w, 2), 2.0, np.float32)
    bw = -fw
    conf = PP.fb_confidence(fw, bw)
    assert conf[8:-8, 8:-8].min() > 0.9
    conf_bad = PP.fb_confidence(fw, fw)
    assert np.median(conf_bad[8:-8, 8:-8]) < np.median(conf[8:-8, 8:-8])


def test_write_flows_layout(tmp_path, rng):
    seq = tmp_path / "seq"
    os.makedirs(seq)
    for i in range(4):
        img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(seq / ("%05d.jpg" % i)), img)
    PP.compute_flows(str(seq), str(tmp_path / "db"), "seq", dframes=(1, 2))
    assert os.path.exists(tmp_path / "db/FlowFW_1/Full-Resolution/seq/flo-00000.pfm")
    assert os.path.exists(tmp_path / "db/FlowBW_1/Full-Resolution/seq/occ-00001.pfm")
    assert os.path.exists(tmp_path / "db/FlowFW_2/Full-Resolution/seq/flo-00000.pfm")


def test_write_config(tmp_path):
    p = PP.write_config(str(tmp_path), "myseq", "database/x/myseq", (480, 640))
    from moda_tpu.config import load_seq_config
    seqs = load_seq_config("myseq", str(tmp_path))
    assert len(seqs) == 1
    assert seqs[0].ks == (640.0, 640.0, 320.0, 240.0)


def test_largest_cc():
    m = np.zeros((20, 20), np.uint8)
    m[2:6, 2:6] = 1     # 16 px
    m[10:19, 10:19] = 1  # 81 px
    out = PP.largest_cc(m)
    assert out[12, 12] == 1 and out[3, 3] == 0


def test_pmat_decomposition():
    from scipy.spatial.transform import Rotation as R
    K = np.asarray([[500.0, 0, 320], [0, 510, 240], [0, 0, 1]])
    Rm = R.from_rotvec([0.1, 0.2, -0.1]).as_matrix()
    t = np.asarray([0.2, -0.1, 3.0])
    P = K @ np.concatenate([Rm, t[:, None]], 1)
    rtk = pmat_to_rtk(P)
    np.testing.assert_allclose(rtk[:3, :3], Rm, atol=1e-8)
    np.testing.assert_allclose(rtk[:3, 3], t, atol=1e-8)
    np.testing.assert_allclose(rtk[3], [500, 510, 320, 240], atol=1e-6)

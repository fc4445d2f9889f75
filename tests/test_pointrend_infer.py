"""Parity + behavior tests for the JAX PointRend graph
(preproc/pointrend_infer.py) against independent torch functional
forwards of the detectron2 heads on identical d2-layout weights."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from moda_tpu.preproc.pointrend_infer import (  # noqa: E402
    BoxHead, CoarseMaskHead, PointHead, RPNHead, assign_fpn_level,
    decode_deltas, make_anchors, nms, point_sample,
    convert_pointrend_checkpoint)
from tests.test_cse_infer import make_backbone_sd, rng, t  # noqa: E402


def _conv_sd(sd, name, o, i, k):
    sd[name + ".weight"] = (rng.randn(o, i, k, k) / np.sqrt(i * k * k)).astype(np.float32)
    sd[name + ".bias"] = (rng.randn(o) * 0.1).astype(np.float32)


def _fc_sd(sd, name, o, i):
    sd[name + ".weight"] = (rng.randn(o, i) / np.sqrt(i)).astype(np.float32)
    sd[name + ".bias"] = (rng.randn(o) * 0.1).astype(np.float32)


def make_heads_sd(C=80):
    sd = {}
    _conv_sd(sd, "proposal_generator.rpn_head.conv", 256, 256, 3)
    _conv_sd(sd, "proposal_generator.rpn_head.objectness_logits", 3, 256, 1)
    _conv_sd(sd, "proposal_generator.rpn_head.anchor_deltas", 12, 256, 1)
    _fc_sd(sd, "roi_heads.box_head.fc1", 1024, 256 * 49)
    _fc_sd(sd, "roi_heads.box_head.fc2", 1024, 1024)
    _fc_sd(sd, "roi_heads.box_predictor.cls_score", C + 1, 1024)
    _fc_sd(sd, "roi_heads.box_predictor.bbox_pred", 4 * C, 1024)
    _conv_sd(sd, "roi_heads.mask_coarse_head.reduce_channel_dim_conv", 256, 256, 1)
    _conv_sd(sd, "roi_heads.mask_coarse_head.reduce_spatial_dim_conv", 256, 256, 2)
    _fc_sd(sd, "roi_heads.mask_coarse_head.fc1", 1024, 256 * 49)
    _fc_sd(sd, "roi_heads.mask_coarse_head.fc2", 1024, 1024)
    _fc_sd(sd, "roi_heads.mask_coarse_head.prediction", C * 49, 1024)
    # point head: Conv1d k=1 weights [O, I, 1]
    in0 = 256 + C
    for i, (o, ic) in enumerate(((256, in0), (256, 256 + C), (256, 256 + C))):
        sd[f"roi_heads.mask_point_head.fc{i+1}.weight"] = \
            (rng.randn(o, ic, 1) / np.sqrt(ic)).astype(np.float32)
        sd[f"roi_heads.mask_point_head.fc{i+1}.bias"] = \
            (rng.randn(o) * 0.1).astype(np.float32)
    sd["roi_heads.mask_point_head.predictor.weight"] = \
        (rng.randn(C, 256 + C, 1) / 16).astype(np.float32)
    sd["roi_heads.mask_point_head.predictor.bias"] = \
        (rng.randn(C) * 0.1).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def heads():
    sd = make_backbone_sd()
    sd.update(make_heads_sd())
    return sd, convert_pointrend_checkpoint(sd)


def test_rpn_head_parity(heads):
    sd, params = heads
    x = rng.rand(1, 256, 16, 16).astype(np.float32)
    r = "proposal_generator.rpn_head."
    tc = F.relu(F.conv2d(t(x), t(sd[r + "conv.weight"]), t(sd[r + "conv.bias"]),
                         padding=1))
    t_log = F.conv2d(tc, t(sd[r + "objectness_logits.weight"]),
                     t(sd[r + "objectness_logits.bias"]))
    t_del = F.conv2d(tc, t(sd[r + "anchor_deltas.weight"]),
                     t(sd[r + "anchor_deltas.bias"]))
    logits, deltas = RPNHead().apply({"params": params["rpn"]},
                                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(logits),
                               t_log.numpy().transpose(0, 2, 3, 1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(deltas),
                               t_del.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_box_head_parity(heads):
    """Covers the CHW->HWC flatten permutation of fc1."""
    sd, params = heads
    roi = rng.rand(2, 256, 7, 7).astype(np.float32)
    b = "roi_heads.box_head."
    x = t(roi).flatten(1)
    x = F.relu(F.linear(x, t(sd[b + "fc1.weight"]), t(sd[b + "fc1.bias"])))
    x = F.relu(F.linear(x, t(sd[b + "fc2.weight"]), t(sd[b + "fc2.bias"])))
    t_sc = F.linear(x, t(sd["roi_heads.box_predictor.cls_score.weight"]),
                    t(sd["roi_heads.box_predictor.cls_score.bias"]))
    t_dl = F.linear(x, t(sd["roi_heads.box_predictor.bbox_pred.weight"]),
                    t(sd["roi_heads.box_predictor.bbox_pred.bias"]))
    scores, deltas = BoxHead().apply({"params": params["box_head"]},
                                     jnp.asarray(roi.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(scores), t_sc.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(deltas), t_dl.numpy(), atol=1e-3)


def test_coarse_mask_head_parity(heads):
    sd, params = heads
    roi = rng.rand(2, 256, 14, 14).astype(np.float32)
    c = "roi_heads.mask_coarse_head."
    x = F.relu(F.conv2d(t(roi), t(sd[c + "reduce_channel_dim_conv.weight"]),
                        t(sd[c + "reduce_channel_dim_conv.bias"])))
    x = F.relu(F.conv2d(x, t(sd[c + "reduce_spatial_dim_conv.weight"]),
                        t(sd[c + "reduce_spatial_dim_conv.bias"]), stride=2))
    x = x.flatten(1)
    x = F.relu(F.linear(x, t(sd[c + "fc1.weight"]), t(sd[c + "fc1.bias"])))
    x = F.relu(F.linear(x, t(sd[c + "fc2.weight"]), t(sd[c + "fc2.bias"])))
    x = F.linear(x, t(sd[c + "prediction.weight"]), t(sd[c + "prediction.bias"]))
    ref = x.numpy().reshape(2, 80, 7, 7)
    got = np.asarray(CoarseMaskHead().apply(
        {"params": params["coarse"]}, jnp.asarray(roi.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_point_head_parity(heads):
    sd, params = heads
    fine = rng.rand(1, 256, 10).astype(np.float32)   # torch [N,C,P]
    coarse = rng.rand(1, 80, 10).astype(np.float32)
    p = "roi_heads.mask_point_head."
    x = torch.cat([t(fine), t(coarse)], 1)
    for i in (1, 2, 3):
        x = F.relu(F.conv1d(x, t(sd[f"{p}fc{i}.weight"]), t(sd[f"{p}fc{i}.bias"])))
        x = torch.cat([x, t(coarse)], 1)
    x = F.conv1d(x, t(sd[p + "predictor.weight"]), t(sd[p + "predictor.bias"]))
    ref = x.numpy().transpose(0, 2, 1)  # [N,P,C]
    got = np.asarray(PointHead().apply(
        {"params": params["point"]},
        jnp.asarray(fine.transpose(0, 2, 1)), jnp.asarray(coarse.transpose(0, 2, 1))))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_decode_deltas_roundtrip():
    anchors = np.asarray([[10, 20, 50, 80], [0, 0, 32, 32]], np.float32)
    np.testing.assert_allclose(decode_deltas(anchors, np.zeros((2, 4), np.float32)),
                               anchors, atol=1e-4)
    d = np.asarray([[0, 0, np.log(2.0), np.log(2.0)]], np.float32)
    out = decode_deltas(anchors[:1], d)
    np.testing.assert_allclose(out[0, 2] - out[0, 0], 80, atol=1e-3)


def test_nms_and_level_assign():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                       np.float32)
    keep = nms(boxes, np.asarray([0.9, 0.8, 0.7]), 0.5)
    assert keep == [0, 2]
    lv = assign_fpn_level(np.asarray([[0, 0, 224, 224], [0, 0, 32, 32],
                                      [0, 0, 2000, 2000]], np.float32))
    assert list(lv) == [4, 2, 5]


def test_point_sample_matches_grid_sample():
    f = rng.rand(1, 4, 9, 9).astype(np.float32)
    pts = rng.rand(25, 2).astype(np.float32) * 0.8 + 0.1
    grid = t((pts * 2 - 1).reshape(1, 1, 25, 2))
    ref = F.grid_sample(t(f), grid, align_corners=False,
                        mode="bilinear").numpy()[0, :, 0].T  # [P,C]
    got = np.asarray(point_sample(jnp.asarray(f[0].transpose(1, 2, 0)),
                                  jnp.asarray(pts)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_anchors_grid():
    a = make_anchors(2, 3, stride=16, size=32)
    assert a.shape == (2 * 3 * 3, 4)
    # first anchor centered at (0,0): ratio 0.5 -> w=sqrt(2)*32... area 32^2
    w = a[:3, 2] - a[:3, 0]
    h = a[:3, 3] - a[:3, 1]
    np.testing.assert_allclose(w * h, 32 * 32, rtol=1e-5)
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)


def test_pointrend_end_to_end_smoke(heads):
    """Random weights won't segment, but the full pipeline must run and
    return a well-formed mask (possibly empty) on a real-sized image."""
    from moda_tpu.preproc.pointrend_infer import PointRendPredictor
    sd, params = heads
    pred = PointRendPredictor(params, input_size=128, score_thresh=0.0,
                              subdivision_steps=2)
    img = (rng.rand(96, 120, 3) * 255).astype(np.uint8)
    mask, score, box = pred(img)
    assert mask.shape == (96, 120) and mask.dtype == np.uint8
    assert 0.0 <= score <= 1.0
    if box is not None:
        assert box.shape == (4,)

"""Parity tests: flax ResNet50-FPN + CSE head vs an independent torch
functional forward of the detectron2 graph, on identical (randomly
generated, d2-key-layout) weights.

Validates the weight converter and the conv padding/stride placement so
real detectron2 DensePose-CSE checkpoints run bit-faithfully in JAX.
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from moda_tpu.fields.resnet_fpn import (  # noqa: E402
    ResNetFPN, convert_resnet50_fpn)
from moda_tpu.preproc.cse_infer import (  # noqa: E402
    CSEHead, CSEPredictor, convert_cse_head, roi_align)

STAGE_BLOCKS = (3, 4, 6, 3)
rng = np.random.RandomState(0)


def _conv_w(o, i, k):
    return (rng.randn(o, i, k, k) * (1.0 / np.sqrt(i * k * k))).astype(np.float32)


def _bn(sd, name, c):
    sd[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
    sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1
    sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
    sd[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5


def make_backbone_sd():
    sd = {}
    bu = "backbone.bottom_up."
    sd[bu + "stem.conv1.weight"] = _conv_w(64, 3, 7)
    _bn(sd, bu + "stem.conv1.norm", 64)
    in_c = 64
    for si, nb in enumerate(STAGE_BLOCKS):
        out_c = 256 * (2 ** si)
        mid = out_c // 4
        for bi in range(nb):
            p = f"{bu}res{si+2}.{bi}."
            cin = in_c if bi == 0 else out_c
            sd[p + "conv1.weight"] = _conv_w(mid, cin, 1)
            _bn(sd, p + "conv1.norm", mid)
            sd[p + "conv2.weight"] = _conv_w(mid, mid, 3)
            _bn(sd, p + "conv2.norm", mid)
            sd[p + "conv3.weight"] = _conv_w(out_c, mid, 1)
            _bn(sd, p + "conv3.norm", out_c)
            if bi == 0:
                sd[p + "shortcut.weight"] = _conv_w(out_c, cin, 1)
                _bn(sd, p + "shortcut.norm", out_c)
        in_c = out_c
    for lvl, cin in ((2, 256), (3, 512), (4, 1024), (5, 2048)):
        sd[f"backbone.fpn_lateral{lvl}.weight"] = _conv_w(256, cin, 1)
        sd[f"backbone.fpn_lateral{lvl}.bias"] = rng.randn(256).astype(np.float32) * 0.1
        sd[f"backbone.fpn_output{lvl}.weight"] = _conv_w(256, 256, 3)
        sd[f"backbone.fpn_output{lvl}.bias"] = rng.randn(256).astype(np.float32) * 0.1
    return sd


# ------------------------- independent torch-functional d2 forward ----------
def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def torch_frozen_bn(x, sd, name, eps=1e-5):
    g, b = t(sd[name + ".weight"]), t(sd[name + ".bias"])
    m, v = t(sd[name + ".running_mean"]), t(sd[name + ".running_var"])
    scale = g / torch.sqrt(v + eps)
    return x * scale[:, None, None] + (b - m * scale)[:, None, None]


def torch_bottleneck(x, sd, p, stride, has_shortcut):
    out = F.conv2d(x, t(sd[p + "conv1.weight"]))
    out = F.relu(torch_frozen_bn(out, sd, p + "conv1.norm"))
    out = F.conv2d(out, t(sd[p + "conv2.weight"]), stride=stride, padding=1)
    out = F.relu(torch_frozen_bn(out, sd, p + "conv2.norm"))
    out = F.conv2d(out, t(sd[p + "conv3.weight"]))
    out = torch_frozen_bn(out, sd, p + "conv3.norm")
    if has_shortcut:
        sc = F.conv2d(x, t(sd[p + "shortcut.weight"]), stride=stride)
        sc = torch_frozen_bn(sc, sd, p + "shortcut.norm")
    else:
        sc = x
    return F.relu(out + sc)


def torch_backbone_fpn(img_nchw, sd):
    bu = "backbone.bottom_up."
    x = F.conv2d(t(img_nchw), t(sd[bu + "stem.conv1.weight"]), stride=2, padding=3)
    x = F.relu(torch_frozen_bn(x, sd, bu + "stem.conv1.norm"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    feats = {}
    for si, nb in enumerate(STAGE_BLOCKS):
        for bi in range(nb):
            x = torch_bottleneck(x, sd, f"{bu}res{si+2}.{bi}.",
                                 stride=(1 if si == 0 else 2) if bi == 0 else 1,
                                 has_shortcut=(bi == 0))
        feats[f"res{si+2}"] = x
    lat = {lvl: F.conv2d(feats[f"res{lvl}"],
                         t(sd[f"backbone.fpn_lateral{lvl}.weight"]),
                         t(sd[f"backbone.fpn_lateral{lvl}.bias"]))
           for lvl in (2, 3, 4, 5)}
    out = {}
    prev = lat[5]
    out["p5"] = F.conv2d(prev, t(sd["backbone.fpn_output5.weight"]),
                         t(sd["backbone.fpn_output5.bias"]), padding=1)
    for lvl in (4, 3, 2):
        prev = lat[lvl] + F.interpolate(prev, scale_factor=2, mode="nearest")
        out[f"p{lvl}"] = F.conv2d(prev, t(sd[f"backbone.fpn_output{lvl}.weight"]),
                                  t(sd[f"backbone.fpn_output{lvl}.bias"]), padding=1)
    return out


def test_backbone_fpn_parity():
    sd = make_backbone_sd()
    img = rng.rand(1, 3, 64, 64).astype(np.float32)
    ref = torch_backbone_fpn(img, sd)
    params = convert_resnet50_fpn(sd)
    got = ResNetFPN().apply({"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)))
    for lvl in (2, 3, 4, 5):
        r = ref[f"p{lvl}"].numpy().transpose(0, 2, 3, 1)
        g = np.asarray(got[f"p{lvl}"])
        assert g.shape == r.shape, f"p{lvl}: {g.shape} vs {r.shape}"
        np.testing.assert_allclose(g, r, atol=2e-3, rtol=1e-3,
                                   err_msg=f"p{lvl} mismatch")


def make_head_sd(n_convs=2, cin=256, hidden=64, E=16):
    sd = {}
    hp = "roi_heads.densepose_head."
    for i in range(n_convs):
        c_in = cin if i == 0 else hidden
        sd[f"{hp}body_conv_fcn{i+1}.weight"] = _conv_w(hidden, c_in, 3)
        sd[f"{hp}body_conv_fcn{i+1}.bias"] = rng.randn(hidden).astype(np.float32) * 0.1
    # torch ConvTranspose2d weight layout: [in, out, kh, kw]
    sd["roi_heads.densepose_predictor.embed_lowres.weight"] = \
        (rng.randn(hidden, E, 4, 4) * 0.05).astype(np.float32)
    sd["roi_heads.densepose_predictor.embed_lowres.bias"] = \
        rng.randn(E).astype(np.float32) * 0.1
    return sd


def torch_cse_head(x_nchw, sd, n_convs=2):
    x = t(x_nchw)
    for i in range(n_convs):
        x = F.relu(F.conv2d(x, t(sd[f"roi_heads.densepose_head.body_conv_fcn{i+1}.weight"]),
                            t(sd[f"roi_heads.densepose_head.body_conv_fcn{i+1}.bias"]),
                            padding=1))
    x = F.conv_transpose2d(
        x, t(sd["roi_heads.densepose_predictor.embed_lowres.weight"]),
        t(sd["roi_heads.densepose_predictor.embed_lowres.bias"]),
        stride=2, padding=1)
    return x


def test_cse_head_parity():
    sd = make_head_sd(n_convs=2, hidden=64)
    x = rng.rand(1, 256, 14, 14).astype(np.float32)
    ref = torch_cse_head(x, sd, n_convs=2).numpy().transpose(0, 2, 3, 1)
    params = convert_cse_head(sd, n_convs=2)
    got = np.asarray(CSEHead(n_convs=2, hidden=64).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_roi_align_identity_box():
    """ROI over the full feature map at out_size=H reproduces the map."""
    f = jnp.asarray(rng.rand(8, 8, 4).astype(np.float32))
    box = jnp.asarray([0.0, 0.0, 8.0, 8.0])
    out = roi_align(f, box, out_size=8, spatial_scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-6)


def test_cse_predictor_end_to_end():
    """Random-weight CSEPredictor produces unit-norm 112^2x16 embeddings."""
    sd = make_backbone_sd()
    sd.update(make_head_sd(n_convs=8, cin=256, hidden=512))
    bp = convert_resnet50_fpn(sd)
    hp = convert_cse_head(sd, n_convs=8)
    pred = CSEPredictor(bp, hp, input_size=128)
    img = (rng.rand(96, 80, 3) * 255).astype(np.uint8)
    mask = np.zeros((96, 80), np.uint8)
    mask[20:70, 15:60] = 1
    feat, vert_map, bbox = pred(img, mask)
    assert feat.shape == (16, 112, 112)
    assert vert_map.shape == (96, 80)
    norms = np.linalg.norm(feat, axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert bbox[0] <= 15 and bbox[2] >= 60


def test_cse_predictor_vertex_map():
    """With a vertex table, the closest-vertex map is nonzero in-mask."""
    sd = make_backbone_sd()
    sd.update(make_head_sd(n_convs=8, cin=256, hidden=512))
    from moda_tpu.fields.resnet_fpn import convert_resnet50_fpn
    vtable = rng.randn(50, 16).astype(np.float32)
    vtable /= np.linalg.norm(vtable, axis=-1, keepdims=True)
    pred = CSEPredictor(convert_resnet50_fpn(sd), convert_cse_head(sd, n_convs=8),
                        vertex_embeddings=vtable, input_size=128)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 1
    feat, vert_map, bbox = pred(img, mask)
    assert vert_map.max() > 0 and vert_map.max() < 50
    assert (vert_map[mask == 0] == 0).all()

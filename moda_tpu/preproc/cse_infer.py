"""DensePose-CSE pixel-embedding inference in JAX (detectron2-free).

Re-creation of the reference's offline CSE feature extraction
(preprocess/libs/cselib.py `run_cse`, SURVEY §2.1 "cselib"): given an
image and its object mask, produce a 112x112x16 continuous surface
embedding map + the closest-vertex assignment against the mesh vertex
embedding table. The reference runs the full detectron2 Mask R-CNN; we
need only the dense prediction for the *known* object box (masks come
from the segmentation stage), so the detection tower is unnecessary:

  image -> ResNet50-FPN (fields/resnet_fpn.py) -> ROIAlign(p2, mask bbox)
        -> CSE head (K conv3x3) -> deconv upsample -> 1x1 -> E=16 map

Weights load from a detectron2 DensePose-CSE checkpoint via
``convert_cse_checkpoint`` (plain tensor dict; no detectron2 import).
The mesh vertex embedding table ships inside the same checkpoint
(``roi_heads.embedder.embedder_*``).
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from moda_tpu.fields.resnet_fpn import ResNetFPN, _cv, convert_resnet50_fpn

# detectron2 DensePose pixel means (BGR) — preprocessing contract of the
# converted checkpoint, not a tunable.
_PIXEL_MEAN = np.asarray([103.530, 116.280, 123.675], np.float32)
_PIXEL_STD = np.asarray([1.0, 1.0, 1.0], np.float32)


class CSEHead(nn.Module):
    """DensePoseV1ConvXHead + embedding predictor (E-dim per-pixel)."""

    n_convs: int = 8
    hidden: int = 512
    embed_dim: int = 16

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_convs):
            x = nn.Conv(self.hidden, (3, 3), name=f"conv{i+1}")(x)
            x = nn.relu(x)
        # ConvTranspose(k=4, s=2, p=1) upsample (d2 "embed_lowres"),
        # expressed as its exact definition — input-dilated conv with the
        # spatially-flipped kernel and pad k-1-p — because flax
        # nn.ConvTranspose uses different padding/flip conventions than
        # torch (the converter pre-flips the kernel).
        kernel = self.param("predictor_kernel", nn.initializers.lecun_normal(),
                            (4, 4, self.hidden, self.embed_dim))
        bias = self.param("predictor_bias", nn.initializers.zeros,
                          (self.embed_dim,))
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x + bias


def roi_align(feat: jnp.ndarray, box: jnp.ndarray, out_size: int,
              spatial_scale: float) -> jnp.ndarray:
    """Bilinear ROI crop of feat [H,W,C] at box [x0,y0,x1,y1] (image px).

    Equivalent to ROIAlign with sampling_ratio=1 at output resolution
    out_size (adequate for dense per-pixel heads; the reference uses
    detectron2's ROIAlignV2).
    """
    b = box * spatial_scale
    ys = b[1] + (jnp.arange(out_size) + 0.5) * (b[3] - b[1]) / out_size - 0.5
    xs = b[0] + (jnp.arange(out_size) + 0.5) * (b[2] - b[0]) / out_size - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, feat.shape[0] - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, feat.shape[1] - 2).astype(jnp.int32)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :, None]
    f00 = feat[y0][:, x0]
    f01 = feat[y0][:, x0 + 1]
    f10 = feat[y0 + 1][:, x0]
    f11 = feat[y0 + 1][:, x0 + 1]
    return (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx
            + f10 * wy * (1 - wx) + f11 * wy * wx)


class CSEPredictor:
    """Callable matching preproc.pipeline's ``cse_fn`` contract.

    __call__(img_bgr_uint8 [H,W,3], mask [H,W]) ->
        (feat [16,112,112] unit-norm embeddings, vert_map [H,W] closest
         mesh-vertex index (0 without a vertex table), bbox [4] xyxy)
    """

    def __init__(self, backbone_params: Dict, head_params: Dict,
                 vertex_embeddings: Optional[np.ndarray] = None,
                 input_size: int = 448):
        self.backbone = ResNetFPN()
        self.head = CSEHead()
        self.bp = backbone_params
        self.hp = head_params
        self.vertex_embeddings = vertex_embeddings
        self.input_size = int(input_size)

        @jax.jit
        def _run(img, box):
            x = (img - _PIXEL_MEAN) / _PIXEL_STD  # BGR input, d2 normalization
            feats = self.backbone.apply({"params": self.bp}, x[None])
            p2 = feats["p2"][0]
            roi = roi_align(p2, box, out_size=56, spatial_scale=0.25)
            emb = self.head.apply({"params": self.hp}, roi[None])[0]  # 112^2xE
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
            return emb

        self._run = _run

    def __call__(self, img: np.ndarray, mask: np.ndarray):
        H, W = mask.shape
        ys, xs = np.nonzero(mask > 0)
        if len(ys) == 0:
            return (np.zeros((16, 112, 112), np.float32),
                    np.zeros((H, W), np.float32),
                    np.asarray([0, 0, W, H], np.float32))
        pad = 0.02 * max(H, W)
        box = np.asarray([max(xs.min() - pad, 0), max(ys.min() - pad, 0),
                          min(xs.max() + pad, W), min(ys.max() + pad, H)],
                         np.float32)
        S = self.input_size
        scale = S / max(H, W)
        import cv2
        imr = cv2.resize(img.astype(np.float32), (int(round(W * scale)),
                                                  int(round(H * scale))))
        imp = np.zeros((S, S, 3), np.float32)
        imp[: imr.shape[0], : imr.shape[1]] = imr
        emb = np.asarray(self._run(jnp.asarray(imp), jnp.asarray(box * scale)))
        vert_map = np.zeros((H, W), np.float32)
        if self.vertex_embeddings is not None:
            # closest-vertex assignment inside the box (cselib's vertex map)
            vids = np.argmax(emb @ self.vertex_embeddings.T, axis=-1)
            x0, y0, x1, y1 = [int(round(v)) for v in box]
            bh, bw = max(y1 - y0, 1), max(x1 - x0, 1)
            up = cv2.resize(vids.astype(np.float32), (bw, bh),
                            interpolation=cv2.INTER_NEAREST)
            vert_map[y0:y0 + bh, x0:x0 + bw] = up * mask[y0:y0 + bh, x0:x0 + bw]
        return (emb.transpose(2, 0, 1).astype(np.float32), vert_map, box)


def convert_cse_head(sd: Dict[str, np.ndarray],
                     prefix: str = "roi_heads.densepose_head.",
                     pred_prefix: str = "roi_heads.densepose_predictor.",
                     n_convs: int = 8) -> Dict:
    """d2 DensePose head + predictor tensors -> CSEHead flax params."""
    params: Dict = {}
    for i in range(n_convs):
        params[f"conv{i+1}"] = {
            "kernel": _cv(sd[f"{prefix}body_conv_fcn{i+1}.weight"]),
            "bias": sd[f"{prefix}body_conv_fcn{i+1}.bias"].astype(np.float32),
        }
    # torch ConvTranspose weight [I,O,kh,kw]: spatial flip + [kh,kw,I,O]
    # (the head implements transpose-conv as a dilated regular conv)
    w = sd[f"{pred_prefix}embed_lowres.weight"][:, :, ::-1, ::-1]
    params["predictor_kernel"] = np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))).astype(np.float32)
    params["predictor_bias"] = \
        sd[f"{pred_prefix}embed_lowres.bias"].astype(np.float32)
    return params


def load_detectron2_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a detectron2 checkpoint file into a plain numpy dict.

    Handles both formats d2 ships: ``.pkl`` (pickle of numpy arrays under
    a 'model' key — no torch needed) and ``.pth`` (torch zip pickle).
    """
    if path.endswith(".pkl"):
        import pickle
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        model = data.get("model", data)
        return {k: np.asarray(v) for k, v in model.items()
                if isinstance(v, np.ndarray) or np.isscalar(v)}
    import torch
    ck = torch.load(path, map_location="cpu", weights_only=False)
    model = ck.get("model", ck)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in model.items()}


def convert_cse_checkpoint(sd: Dict[str, np.ndarray]):
    """Full detectron2 DensePose-CSE checkpoint -> CSEPredictor.

    ``sd`` is the checkpoint's ``model`` dict with numpy values (load the
    .pkl/.pth externally — torch.load works for .pth; detectron2 .pkl
    files are plain pickle of numpy arrays).
    """
    backbone = convert_resnet50_fpn(sd)
    head = convert_cse_head(sd)
    vemb = None
    for k in sd:
        if "embedder" in k and k.endswith(".weight"):
            vemb = sd[k].astype(np.float32)
            break
    return CSEPredictor(backbone, head, vertex_embeddings=vemb)

"""PointRend instance segmentation in JAX (detectron2-free).

The reference's mask preprocessing (preprocess/mask.py, SURVEY §2.2
"detectron2 PointRend") runs a detectron2 R50-FPN PointRend model to
segment the foreground object. This module re-creates that inference
graph natively so converted PointRend checkpoints produce masks without
detectron2:

  image -> ResNet50-FPN (fields/resnet_fpn.py, +p6)
        -> RPN head (shared conv, objectness + anchor deltas)
        -> proposal decode + NMS                      (host numpy)
        -> box head (ROIAlign 7x7, 2FC, class scores + box deltas)
        -> coarse mask head (ROIAlign 14x14 -> FC -> 7x7 logits)
        -> PointRend subdivision (uncertain-point MLP refinement on p2)

The conv/FC towers run jitted in JAX; the tiny sequential parts
(NMS, point selection) run on host — this is offline preprocessing, not
the training hot path. Weight layout follows detectron2 key names
(``proposal_generator.rpn_head.*``, ``roi_heads.box_head.*``,
``roi_heads.mask_coarse_head.*``, ``roi_heads.mask_point_head.*``);
``convert_pointrend_checkpoint`` maps them onto the flax trees.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from moda_tpu.fields.resnet_fpn import ResNetFPN, _cv, convert_resnet50_fpn
from moda_tpu.preproc.cse_infer import _PIXEL_MEAN, _PIXEL_STD, roi_align

ANCHOR_SIZES = (32, 64, 128, 256, 512)  # p2..p6
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
SCALE_CLAMP = float(np.log(1000.0 / 16))


class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness/delta predictors (A anchors/loc)."""

    num_anchors: int = 3

    @nn.compact
    def __call__(self, x):
        t = nn.relu(nn.Conv(x.shape[-1], (3, 3), name="conv")(x))
        logits = nn.Conv(self.num_anchors, (1, 1), name="objectness_logits")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), name="anchor_deltas")(t)
        return logits, deltas


class BoxHead(nn.Module):
    """FastRCNNConvFCHead (2 FC) + cls/box predictors."""

    fc_dim: int = 1024
    num_classes: int = 80

    @nn.compact
    def __call__(self, x):  # [N,7,7,256]
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, name="fc2")(x))
        scores = nn.Dense(self.num_classes + 1, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred")(x)
        return scores, deltas


class CoarseMaskHead(nn.Module):
    """PointRend coarse head: 14x14 ROI -> FCs -> 7x7xC mask logits."""

    conv_dim: int = 256
    fc_dim: int = 1024
    num_classes: int = 80
    output_side: int = 7

    @nn.compact
    def __call__(self, x):  # [N,14,14,256]
        x = nn.relu(nn.Conv(self.conv_dim, (1, 1), padding="VALID",
                            name="reduce_channel_dim_conv")(x))
        x = nn.relu(nn.Conv(self.conv_dim, (2, 2), strides=(2, 2),
                            padding="VALID", name="reduce_spatial_dim_conv")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, name="fc2")(x))
        x = nn.Dense(self.num_classes * self.output_side ** 2,
                     name="prediction")(x)
        return x.reshape(-1, self.num_classes, self.output_side,
                         self.output_side)


class PointHead(nn.Module):
    """StandardPointHead: per-point MLP on (p2 feature, coarse logit),
    coarse logits re-concatenated before every layer."""

    fc_dim: int = 256
    num_fc: int = 3
    num_classes: int = 80

    @nn.compact
    def __call__(self, fine, coarse):  # [N,P,256], [N,P,C]
        x = jnp.concatenate([fine, coarse], -1)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, name=f"fc{i+1}")(x))
            x = jnp.concatenate([x, coarse], -1)
        return nn.Dense(self.num_classes, name="predictor")(x)


# -------------------------------------------------------------- host utils
def make_anchors(h: int, w: int, stride: int, size: int) -> np.ndarray:
    """d2 DefaultAnchorGenerator grid for one level -> [H*W*A,4] xyxy."""
    boxes = []
    for r in ANCHOR_RATIOS:
        area = float(size * size)
        bw = np.sqrt(area / r)
        bh = bw * r
        boxes.append([-bw / 2, -bh / 2, bw / 2, bh / 2])
    base = np.asarray(boxes, np.float32)  # [A,4]
    sx = (np.arange(w, dtype=np.float32)) * stride
    sy = (np.arange(h, dtype=np.float32)) * stride
    gx, gy = np.meshgrid(sx, sy)
    shifts = np.stack([gx, gy, gx, gy], -1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def decode_deltas(anchors: np.ndarray, deltas: np.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> np.ndarray:
    """d2 Box2BoxTransform.apply_deltas."""
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    cxa = anchors[:, 0] + 0.5 * wa
    cya = anchors[:, 1] + 0.5 * ha
    dx, dy, dw, dh = [deltas[:, i] / weights[i] for i in range(4)]
    dw = np.minimum(dw, SCALE_CLAMP)
    dh = np.minimum(dh, SCALE_CLAMP)
    cx = dx * wa + cxa
    cy = dy * ha + cya
    w = np.exp(dw) * wa
    h = np.exp(dh) * ha
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thr: float) -> List[int]:
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        xx0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a + b - inter, 1e-8)
        order = rest[iou <= iou_thr]
    return keep


def assign_fpn_level(boxes: np.ndarray) -> np.ndarray:
    """d2 level assignment: floor(4 + log2(sqrt(area)/224)), clamp p2..p5."""
    area = np.maximum((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]),
                      1e-8)
    lvl = np.floor(4 + np.log2(np.sqrt(area) / 224.0))
    return np.clip(lvl, 2, 5).astype(np.int32)


def point_sample(feat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample feat [H,W,C] at pts [P,2] in [0,1]^2 (x,y),
    align_corners=False convention (torch grid_sample)."""
    H, W = feat.shape[:2]
    x = pts[:, 0] * W - 0.5
    y = pts[:, 1] * H - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    wx = jnp.clip(x - x0, 0.0, 1.0)[:, None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[:, None]
    f00 = feat[y0, x0]
    f01 = feat[y0, x0 + 1]
    f10 = feat[y0 + 1, x0]
    f11 = feat[y0 + 1, x0 + 1]
    return (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx
            + f10 * wy * (1 - wx) + f11 * wy * wx)


class PointRendPredictor:
    """Callable: img_bgr_uint8 [H,W,3] -> (mask [H,W] uint8, score, box).

    Implements the reference's PointRend mask stage (preprocess/mask.py);
    selects the best detection among ``keep_classes`` (COCO ids; None =
    any class), refines its mask by PointRend subdivision to
    ``mask_side``², and pastes it into the image frame.
    """

    def __init__(self, params: Dict, num_classes: int = 80,
                 input_size: int = 512, keep_classes=None,
                 score_thresh: float = 0.3, subdivision_steps: int = 5,
                 subdivision_points: int = 784):
        self.p = params
        self.num_classes = num_classes
        self.input_size = int(input_size)
        self.keep_classes = keep_classes
        self.score_thresh = score_thresh
        self.steps = subdivision_steps
        self.npts = subdivision_points
        self.backbone = ResNetFPN()
        self.rpn = RPNHead()
        self.box_head = BoxHead(num_classes=num_classes)
        self.coarse = CoarseMaskHead(num_classes=num_classes)
        self.point = PointHead(num_classes=num_classes)

        @jax.jit
        def _features(img):
            x = (img - _PIXEL_MEAN) / _PIXEL_STD
            f = self.backbone.apply({"params": params["backbone"]}, x[None])
            p6 = nn.max_pool(f["p5"], (1, 1), strides=(2, 2))
            return {**f, "p6": p6}

        @jax.jit
        def _rpn(feat):
            return self.rpn.apply({"params": params["rpn"]}, feat)

        @jax.jit
        def _boxes(rois):  # [N,7,7,256]
            return self.box_head.apply({"params": params["box_head"]}, rois)

        @jax.jit
        def _coarse(rois):  # [N,14,14,256]
            return self.coarse.apply({"params": params["coarse"]}, rois)

        @jax.jit
        def _points(fine, coarse_logits):
            return self.point.apply({"params": params["point"]}, fine,
                                    coarse_logits)

        self._features, self._rpn = _features, _rpn
        self._boxes, self._coarse, self._points = _boxes, _coarse, _points
        self._roi7 = jax.jit(lambda f, b, s: roi_align(f, b, 7, s))
        self._roi14 = jax.jit(lambda f, b, s: roi_align(f, b, 14, s))
        self._sample = jax.jit(point_sample)

    # ------------------------------------------------------------ stages
    def _proposals(self, feats, hw) -> Tuple[np.ndarray, np.ndarray]:
        all_boxes, all_scores = [], []
        for li, lvl in enumerate(("p2", "p3", "p4", "p5", "p6")):
            logits, deltas = self._rpn(feats[lvl])
            logits = np.asarray(logits[0])
            deltas = np.asarray(deltas[0])
            h, w, A = logits.shape
            stride = 2 ** (li + 2)
            anchors = make_anchors(h, w, stride, ANCHOR_SIZES[li])
            # d2 permute: [A*4,H,W]->per-anchor; NHWC already interleaves A
            sc = logits.reshape(-1)
            dl = deltas.reshape(-1, 4)
            k = min(1000, len(sc))
            top = np.argpartition(-sc, k - 1)[:k]
            boxes = decode_deltas(anchors[top], dl[top])
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, hw[1])
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, hw[0])
            all_boxes.append(boxes)
            all_scores.append(sc[top])
        boxes = np.concatenate(all_boxes)
        scores = np.concatenate(all_scores)
        wh_ok = ((boxes[:, 2] - boxes[:, 0]) > 1) & ((boxes[:, 3] - boxes[:, 1]) > 1)
        boxes, scores = boxes[wh_ok], scores[wh_ok]
        keep = nms(boxes, scores, 0.7)[:100]
        return boxes[keep], scores[keep]

    def _roi_multilevel(self, feats, boxes: np.ndarray, out: int):
        lvls = assign_fpn_level(boxes)
        rois = []
        fn = self._roi7 if out == 7 else self._roi14
        for b, lv in zip(boxes, lvls):
            rois.append(fn(feats[f"p{lv}"][0], jnp.asarray(b),
                           1.0 / (2 ** lv)))
        return jnp.stack(rois)

    def _detect(self, feats, hw):
        props, _ = self._proposals(feats, hw)
        if len(props) == 0:
            return None
        rois = self._roi_multilevel(feats, props, 7)
        scores, deltas = self._boxes(rois)
        prob = np.asarray(jax.nn.softmax(scores, -1))[:, :-1]  # drop bg
        deltas = np.asarray(deltas).reshape(len(props), self.num_classes, 4)
        cls_ids = np.arange(self.num_classes)
        if self.keep_classes is not None:
            sel = np.zeros(self.num_classes, bool)
            sel[list(self.keep_classes)] = True
            prob = prob * sel[None]
        flat = prob.reshape(-1)
        best = int(np.argmax(flat))
        ri, ci = best // self.num_classes, best % self.num_classes
        score = float(flat[best])
        if score < self.score_thresh:
            return None
        box = decode_deltas(props[ri: ri + 1],
                            deltas[ri, ci][None], weights=(10, 10, 5, 5))[0]
        box[0::2] = box[0::2].clip(0, hw[1])
        box[1::2] = box[1::2].clip(0, hw[0])
        return box, int(cls_ids[ci]), score

    def _refine_mask(self, feats, box: np.ndarray, cls: int) -> np.ndarray:
        """Coarse 7x7 logits -> PointRend subdivision on p2 features."""
        roi14 = self._roi_multilevel(feats, box[None], 14)
        all_coarse = np.asarray(self._coarse(roi14))[0]  # [C,7,7]
        p2 = feats["p2"][0]
        H2, W2 = p2.shape[:2]
        side = 7
        m = all_coarse[cls].copy()
        for _ in range(self.steps):
            side *= 2
            import cv2
            m = cv2.resize(m, (side, side), interpolation=cv2.INTER_LINEAR)
            cm = np.stack([cv2.resize(all_coarse[c], (side, side),
                                      interpolation=cv2.INTER_LINEAR)
                           for c in range(all_coarse.shape[0])], -1)
            unc = -np.abs(m).reshape(-1)
            P = min(self.npts, side * side)
            pick = np.argpartition(-unc, P - 1)[:P]
            py, px = pick // side, pick % side
            # point coords in box frame [0,1] -> image px -> p2 grid [0,1]
            u = (px + 0.5) / side
            v = (py + 0.5) / side
            ix = box[0] + u * (box[2] - box[0])
            iy = box[1] + v * (box[3] - box[1])
            pts = np.stack([ix / 4.0 / W2, iy / 4.0 / H2], -1)  # p2 stride 4
            fine = self._sample(p2, jnp.asarray(pts.astype(np.float32)))
            cpts = jnp.asarray(cm.reshape(-1, cm.shape[-1])[pick]
                               .astype(np.float32))
            ref = np.asarray(self._points(fine[None], cpts[None]))[0, :, cls]
            m.reshape(-1)[pick] = ref
        return m

    def as_mask_fn(self):
        """Adapter for preproc.pipeline.write_masks (img -> binary mask)."""
        return lambda img: self(img)[0]

    def __call__(self, img: np.ndarray):
        H, W = img.shape[:2]
        S = self.input_size
        scale = S / max(H, W)
        import cv2
        imr = cv2.resize(img.astype(np.float32),
                         (int(round(W * scale)), int(round(H * scale))))
        imp = np.zeros((S, S, 3), np.float32)
        imp[: imr.shape[0], : imr.shape[1]] = imr
        feats = self._features(jnp.asarray(imp))
        det = self._detect(feats, (imr.shape[0], imr.shape[1]))
        if det is None:
            return np.zeros((H, W), np.uint8), 0.0, None
        box, cls, score = det
        m = self._refine_mask(feats, box, cls)
        x0, y0, x1, y1 = [int(round(v)) for v in box]
        bw, bh = max(x1 - x0, 1), max(y1 - y0, 1)
        mfull = np.zeros((imp.shape[0], imp.shape[1]), np.float32)
        mres = cv2.resize(m, (bw, bh), interpolation=cv2.INTER_LINEAR)
        y1c, x1c = min(y0 + bh, S), min(x0 + bw, S)
        mfull[y0:y1c, x0:x1c] = mres[: y1c - y0, : x1c - x0]
        mimg = cv2.resize(mfull[: imr.shape[0], : imr.shape[1]], (W, H))
        return (mimg > 0).astype(np.uint8), score, box / scale


# ------------------------------------------------------------- converters
def load_pointrend_checkpoint(path: str, **kw) -> "PointRendPredictor":
    """Read a detectron2 PointRend checkpoint file -> PointRendPredictor."""
    from moda_tpu.preproc.cse_infer import load_detectron2_state_dict
    return PointRendPredictor(
        convert_pointrend_checkpoint(load_detectron2_state_dict(path)), **kw)


def _fc(sd, name):
    return {"kernel": sd[name + ".weight"].T.astype(np.float32),
            "bias": sd[name + ".bias"].astype(np.float32)}


def _conv(sd, name):
    return {"kernel": _cv(sd[name + ".weight"]),
            "bias": sd[name + ".bias"].astype(np.float32)}


def convert_pointrend_checkpoint(sd: Dict[str, np.ndarray],
                                 num_classes: int = 80) -> Dict:
    """detectron2 PointRend R50-FPN state dict -> PointRendPredictor params.

    Box-head FC weights assume d2's NCHW flatten of the 7x7x256 ROI; the
    kernel rows are permuted to match our NHWC flatten.
    """
    params = {"backbone": convert_resnet50_fpn(sd)}
    r = "proposal_generator.rpn_head."
    params["rpn"] = {
        "conv": _conv(sd, r + "conv"),
        "objectness_logits": _conv(sd, r + "objectness_logits"),
        "anchor_deltas": _conv(sd, r + "anchor_deltas"),
    }
    b = "roi_heads.box_head."
    fc1 = _fc(sd, b + "fc1")
    # permute CHW-flatten rows -> HWC-flatten rows
    k = fc1["kernel"].reshape(256, 7, 7, -1)
    fc1["kernel"] = np.ascontiguousarray(
        k.transpose(1, 2, 0, 3)).reshape(256 * 49, -1)
    params["box_head"] = {
        "fc1": fc1,
        "fc2": _fc(sd, b + "fc2"),
        "cls_score": _fc(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": _fc(sd, "roi_heads.box_predictor.bbox_pred"),
    }
    c = "roi_heads.mask_coarse_head."
    fc1c = _fc(sd, c + "fc1")
    kc = fc1c["kernel"].reshape(256, 7, 7, -1)
    fc1c["kernel"] = np.ascontiguousarray(
        kc.transpose(1, 2, 0, 3)).reshape(256 * 49, -1)
    params["coarse"] = {
        "reduce_channel_dim_conv": _conv(sd, c + "reduce_channel_dim_conv"),
        "reduce_spatial_dim_conv": _conv(sd, c + "reduce_spatial_dim_conv"),
        "fc1": fc1c,
        "fc2": _fc(sd, c + "fc2"),
        "prediction": _fc(sd, c + "prediction"),
    }
    p = "roi_heads.mask_point_head."
    point = {}
    for i in (1, 2, 3):
        # d2 point-head fcs are Conv1d k=1: [O,I,1] -> Dense [I,O]
        w = sd[f"{p}fc{i}.weight"][..., 0]
        point[f"fc{i}"] = {"kernel": w.T.astype(np.float32),
                           "bias": sd[f"{p}fc{i}.bias"].astype(np.float32)}
    w = sd[p + "predictor.weight"][..., 0]
    point["predictor"] = {"kernel": w.T.astype(np.float32),
                          "bias": sd[p + "predictor.bias"].astype(np.float32)}
    params["point"] = point
    return params

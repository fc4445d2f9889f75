"""One-shot conversion of the reference's released preprocessing
checkpoints into this framework's npz format, plus a golden-artifact
acceptance check.

The reference ships three pretrained torch/detectron2 models for offline
preprocessing (reference: preprocess/mask.py:50-126 PointRend,
utils/cselib.py:35-149 DensePose-CSE, third_party/vcnplus/auto_gen.py
VCN+ with vcn_rob.pth). Our JAX inference graphs are oracle-tested
against torch with randomized weights (tests/test_{pointrend_infer,
cse_infer,vcn_flow}.py); this tool is the missing real-weight step:
given the released files it (a) converts each to a flat npz pytree and
(b) optionally scores the converted models on a golden frame against
reference-produced artifacts.

Usage:
  python tools/convert_all_checkpoints.py --weights_dir /path/to/weights \
      [--out_dir weights_converted] [--golden_dir /path/to/golden]

Expected filenames under --weights_dir (any that exist are converted):
  vcn_rob.pth                        VCN+ robust flow checkpoint
  pointrend*.pkl|pointrend*.pth      detectron2 PointRend R50-FPN instseg
  cse*.pkl|cse*.pth|densepose*.pkl   detectron2 DensePose-CSE

Acceptance protocol (--golden_dir): the directory holds one frame plus
the REFERENCE pipeline's outputs for it —
  frame.jpg                 input image (and frame2.jpg for flow)
  mask.png                  reference PointRend mask (preprocess/mask.py)
  flo.pfm                   reference VCN+ forward flow (auto_gen.py)
  feat.pfm                  reference CSE features, 16*112 x 112
Checks: mask IoU >= 0.90, flow EPE <= 1.0 px, CSE feature cosine >= 0.95
(thresholds allow TPU-vs-CUDA numeric drift; real disagreement of a
mis-converted layer is orders of magnitude larger). A JSON report is
written to <out_dir>/acceptance.json and the tool exits nonzero on any
failed check, so it doubles as a CI gate when weights are available.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


from moda_tpu.preproc.checkpoints import (  # noqa: E402,F401 (re-exported)
    load_cse_predictor, load_pointrend_predictor, load_pytree_npz,
    load_vcn_predictor, save_pytree_npz)


def _find(weights_dir: str, patterns) -> str | None:
    for pat in patterns:
        hits = sorted(glob.glob(os.path.join(weights_dir, pat)))
        if hits:
            return hits[0]
    return None


def convert_vcn(path: str, out_dir: str) -> str:
    from moda_tpu.preproc.vcn_flow import load_vcn_checkpoint
    params, mean = load_vcn_checkpoint(path)
    out = os.path.join(out_dir, "vcn_rob.npz")
    save_pytree_npz(out, {"params": params, "mean": mean})
    return out

def convert_pointrend(path: str, out_dir: str) -> str:
    from moda_tpu.preproc.cse_infer import load_detectron2_state_dict
    from moda_tpu.preproc.pointrend_infer import convert_pointrend_checkpoint
    params = convert_pointrend_checkpoint(load_detectron2_state_dict(path))
    out = os.path.join(out_dir, "pointrend.npz")
    save_pytree_npz(out, params)
    return out

def convert_cse(path: str, out_dir: str) -> str:
    from moda_tpu.preproc.cse_infer import (convert_cse_checkpoint,
                                            load_detectron2_state_dict)
    pred = convert_cse_checkpoint(load_detectron2_state_dict(path))
    tree = {"backbone": pred.bp, "head": pred.hp}
    if pred.vertex_embeddings is not None:
        tree["vertex_embeddings"] = pred.vertex_embeddings
    out = os.path.join(out_dir, "cse.npz")
    save_pytree_npz(out, tree)
    return out


# ------------------------------------------------------------ acceptance

def run_acceptance(golden_dir: str, converted: dict) -> dict:
    import cv2
    from moda_tpu.data.pfm import read_pfm

    report: dict = {}
    frame_p = os.path.join(golden_dir, "frame.jpg")
    img = cv2.imread(frame_p)
    if img is None:
        raise FileNotFoundError(f"{frame_p} missing or unreadable")

    mask_p = os.path.join(golden_dir, "mask.png")
    if "pointrend" in converted and os.path.exists(mask_p):
        gt = (cv2.imread(mask_p, 0) > 0)
        pred_mask = load_pointrend_predictor(
            converted["pointrend"]).as_mask_fn()(img) > 0
        inter = float(np.logical_and(gt, pred_mask).sum())
        union = float(np.logical_or(gt, pred_mask).sum())
        iou = inter / max(union, 1.0)
        report["mask_iou"] = {"value": iou, "pass": bool(iou >= 0.90)}

    flo_p = os.path.join(golden_dir, "flo.pfm")
    frame2_p = os.path.join(golden_dir, "frame2.jpg")
    if "vcn" in converted and os.path.exists(flo_p) \
            and os.path.exists(frame2_p):
        gt_flow = read_pfm(flo_p)[0][..., :2]
        img2 = cv2.imread(frame2_p)
        pred_flow = load_vcn_predictor(converted["vcn"]).as_flow_fn()(
            img, img2)
        epe = float(np.linalg.norm(pred_flow - gt_flow, axis=-1).mean())
        report["flow_epe_px"] = {"value": epe, "pass": bool(epe <= 1.0)}

    feat_p = os.path.join(golden_dir, "feat.pfm")
    if "cse" in converted and os.path.exists(feat_p):
        gt_feat = read_pfm(feat_p)[0].reshape(16, 112, 112)
        mask = (cv2.imread(mask_p, 0) > 0).astype(np.uint8) \
            if os.path.exists(mask_p) else np.ones(img.shape[:2], np.uint8)
        feat, _, _ = load_cse_predictor(converted["cse"])(img, mask)
        a = gt_feat.reshape(16, -1).T
        b = feat.reshape(16, -1).T
        num = (a * b).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8
        cos = float((num / den).mean())
        report["cse_cosine"] = {"value": cos, "pass": bool(cos >= 0.95)}

    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights_dir", required=True)
    ap.add_argument("--out_dir", default="weights_converted")
    ap.add_argument("--golden_dir", default=None)
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    converted = {}
    vcn = _find(args.weights_dir, ["vcn_rob.pth", "vcn*.pth"])
    if vcn:
        converted["vcn"] = convert_vcn(vcn, args.out_dir)
        print(f"converted {vcn} -> {converted['vcn']}")
    pr = _find(args.weights_dir,
               ["pointrend*.pkl", "pointrend*.pth", "model_final*pointrend*"])
    if pr:
        converted["pointrend"] = convert_pointrend(pr, args.out_dir)
        print(f"converted {pr} -> {converted['pointrend']}")
    cse = _find(args.weights_dir, ["cse*.pkl", "cse*.pth", "densepose*.pkl",
                                   "densepose*.pth"])
    if cse:
        converted["cse"] = convert_cse(cse, args.out_dir)
        print(f"converted {cse} -> {converted['cse']}")

    if not converted:
        print(f"no recognized checkpoints under {args.weights_dir} "
              "(expected vcn_rob.pth / pointrend*.pkl / cse*.pkl)")
        return 2

    manifest = {k: os.path.abspath(v) for k, v in converted.items()}
    with open(os.path.join(args.out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)

    if args.golden_dir:
        report = run_acceptance(args.golden_dir, converted)
        with open(os.path.join(args.out_dir, "acceptance.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report, indent=1))
        if not all(v["pass"] for v in report.values()):
            return 1
        if not report:
            print("golden_dir given but no scorable artifacts found")
            return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())

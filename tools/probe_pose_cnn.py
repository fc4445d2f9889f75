"""Probe: does the pose-CNN warmup + extract_cams route recover the
fixture's camera orbit? Trains PoseWarmup on the sphere prior with
feat_bank_encode embeddings (trainer.py default) for --steps, then runs
the CNN on the observed dataset dp features (extract_cams_cnn's exact
input path) and reports per-frame rotation error vs the GT cameras.

  python tools/probe_pose_cnn.py --seqname a-flap [--steps 400]
"""
from __future__ import annotations

import argparse
import glob
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqname", default="a-flap")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--db", default="database/DAVIS")
    ap.add_argument("--load", default="",
                    help="pose_cnn.npz to load instead of training")
    ap.add_argument("--prior", default="auto",
                    help="prior.pkl path ('auto': use the fixture's template "
                         "prior if present — the eval_synth_cnn.sh route; "
                         "'sphere': the trainer's default sphere prior)")
    args = ap.parse_args()

    from moda_tpu.data.frames import FramePaths, FrameReader
    from moda_tpu.data.synthetic import feat_bank_encode
    from moda_tpu.train.warmup_pose import PoseWarmup
    from moda_tpu.viz.render_vis import unit_sphere

    prior_path = args.prior
    if prior_path == "auto":
        cand = (f"{args.db}/Densepose/Full-Resolution/{args.seqname}/"
                "prior.pkl")
        import os
        prior_path = cand if os.path.exists(cand) else "sphere"
    if prior_path == "sphere":
        sv, sf = unit_sphere(2)
        sv = sv.astype(np.float32)
        embeds = feat_bank_encode(sv).astype(np.float32)
    else:
        import pickle
        with open(prior_path, "rb") as f:
            dp = pickle.load(f)
        sv = np.asarray(dp["vertices"], np.float32)
        sv = sv - sv.mean(0)
        sv = sv / np.abs(sv).max()
        sf = np.asarray(dp["faces"], np.int32)
        embeds = (np.asarray(dp["embeddings"], np.float32)
                  if "embeddings" in dp else feat_bank_encode(sv))
        print(json.dumps({"prior": prior_path, "verts": len(sv)}))
    w = PoseWarmup(sv, sf, embeds, d_mean=3.0,
                   total_steps=args.steps)
    if args.load:
        w.load(args.load)
        print(json.dumps({"loaded": args.load}))
    else:
        t0 = time.time()
        losses = w.train(steps=args.steps, bs=args.bs)
        t_train = time.time() - t0
        print(json.dumps({
            "rot_loss_first50": round(float(np.mean(losses[:50])), 4),
            "rot_loss_last50": round(float(np.mean(losses[-50:])), 4),
            "train_s": round(t_train, 1),
            "s_per_step": round(t_train / args.steps, 3)}))

    # observed features exactly as extract_cams_cnn reads them
    imgs = sorted(glob.glob(
        f"{args.db}/JPEGImages/Full-Resolution/{args.seqname}/*.jpg"))
    reader = FrameReader(FramePaths.from_imglist(imgs), img_size=256)
    n = len(imgs) - 1
    feats = []
    for i in range(n):
        d = reader.read_raw(i, flowfw=True, dframe=1)
        feats.append(np.transpose(d["dp_feat"], (1, 2, 0)))
    feats = np.stack(feats)
    feats = feats / np.maximum(
        np.linalg.norm(feats, axis=-1, keepdims=True), 1e-9)
    rtk = w.predict(feats)

    gt_files = sorted(glob.glob(
        f"{args.db}/Cameras/Full-Resolution/{args.seqname}/*.txt"))
    gt = np.stack([np.loadtxt(f) for f in gt_files])[:n]
    # relative-rotation error: offset C_i = R_gt_i^T R_pred_i should be
    # CONSTANT (global gauge); report drift of C_i vs C_0 — the spin-gauge
    # failure shows as drift at the orbit rate (tools/diag_root_gauge.py)
    C = np.einsum("nij,nik->njk", gt[:, :3, :3], rtk[:, :3, :3])
    C0 = C[0]
    drift = [float(np.degrees(np.arccos(np.clip(
        (np.trace(C0.T @ C[i]) - 1) / 2, -1, 1)))) for i in range(n)]
    print(json.dumps({
        "offset_drift_deg_every4": [round(d, 1) for d in drift[::4]],
        "drift_med": round(float(np.median(drift)), 1),
        "drift_max": round(float(np.max(drift)), 1)}))


if __name__ == "__main__":
    main()

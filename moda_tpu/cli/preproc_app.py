"""One-command offline preprocessing: raw video/frames -> training-ready
database (the role of preprocess/preprocess.sh in the reference).

Chains the pipeline stages over one sequence:
  frames -> masks -> densepose features -> optical flow -> config -> lines

Model-backed stages use converted checkpoints when present under
--weights_dir (tools/convert_all_checkpoints.py output: pointrend.npz,
cse.npz, vcn_rob.npz) and otherwise fall back to the weight-free
backends (existing/injected masks, zero CSE features + --nouse_embed,
OpenCV DIS flow with forward-backward confidence), so the command always
produces a loadable database.

Reference: preprocess/preprocess.sh (ffmpeg + mask.py + compute_dp.py +
auto_gen.py + write_config.py), preprocess/img2lines.py.

Usage:
  python -m moda_tpu.cli.preproc_app --seqname myvid \
      --input video.mp4            # or a directory of frames/
      [--database database/DAVIS] [--config_dir configs] \
      [--weights_dir weights_converted] [--img_size 512] [--fps 10] \
      [--mask_dir existing_masks/] [--use_human] [--nolines]
"""
from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

import cv2
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seqname", required=True)
    ap.add_argument("--input", required=True,
                    help="video file or directory of frames")
    ap.add_argument("--database", default="database/DAVIS")
    ap.add_argument("--config_dir", default="configs")
    ap.add_argument("--weights_dir", default="",
                    help="dir of converted npz checkpoints "
                         "(tools/convert_all_checkpoints.py)")
    ap.add_argument("--img_size", type=int, default=512,
                    help="line-shard crop size (img2lines img_size)")
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--mask_dir", default="",
                    help="directory of existing %%05d.png masks (used when "
                         "no PointRend weights are available)")
    ap.add_argument("--use_human", action="store_true",
                    help="segment the person class instead of animals "
                         "(mask.py:50-126 class split)")
    ap.add_argument("--lines", action=argparse.BooleanOptionalAction,
                    default=True, help="write Pixels/ line shards")
    return ap


def stage_frames(args) -> str:
    from moda_tpu.preproc.pipeline import extract_frames

    seq_dir = os.path.join(args.database, "JPEGImages", "Full-Resolution",
                           args.seqname)
    if os.path.isdir(args.input):
        os.makedirs(seq_dir, exist_ok=True)
        srcs = sorted(
            glob.glob(os.path.join(args.input, "*.jpg"))
            + glob.glob(os.path.join(args.input, "*.png")))
        if not srcs:
            sys.exit(f"no frames (*.jpg|*.png) in {args.input}")
        for i, p in enumerate(srcs):
            dst = os.path.join(seq_dir, "%05d.jpg" % i)
            if p.endswith(".jpg"):
                shutil.copyfile(p, dst)
            else:
                cv2.imwrite(dst, cv2.imread(p))
        print(f"[frames] copied {len(srcs)} frames -> {seq_dir}")
    else:
        paths = extract_frames(args.input, seq_dir, fps=args.fps)
        print(f"[frames] extracted {len(paths)} frames @ {args.fps}fps -> {seq_dir}")
    return seq_dir


def stage_masks(args, seq_dir: str) -> None:
    from moda_tpu.preproc.pipeline import write_masks

    w = glob.glob(os.path.join(args.weights_dir, "pointrend*.npz")) \
        if args.weights_dir else []
    if w:
        from moda_tpu.preproc.checkpoints import load_pointrend_predictor
        # person class 0 vs animal classes 14-23 (preprocess/mask.py:50-126)
        keep = (0,) if args.use_human else tuple(range(14, 24))
        pred = load_pointrend_predictor(w[0], keep_classes=keep)
        write_masks(seq_dir, args.database, args.seqname, pred.as_mask_fn())
        print(f"[masks] PointRend ({os.path.basename(w[0])})")
        return
    out_dir = os.path.join(args.database, "Annotations", "Full-Resolution",
                           args.seqname)
    if args.mask_dir:
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for i, p in enumerate(sorted(glob.glob(
                os.path.join(args.mask_dir, "*.png")))):
            m = (cv2.imread(p, 0) > 0).astype(np.uint8) * 128
            cv2.imwrite(os.path.join(out_dir, "%05d.png" % i), m)
            n += 1
        print(f"[masks] copied {n} user masks from {args.mask_dir}")
        return
    if os.path.isdir(out_dir) and glob.glob(os.path.join(out_dir, "*.png")):
        print(f"[masks] keeping existing masks in {out_dir}")
        return
    sys.exit("[masks] no PointRend weights, no --mask_dir, and no existing "
             f"Annotations for {args.seqname}: segmentation is required "
             "(reference preprocess/mask.py)")


def stage_densepose(args, seq_dir: str) -> bool:
    from moda_tpu.preproc.pipeline import write_dp_features

    w = glob.glob(os.path.join(args.weights_dir, "cse*.npz")) \
        if args.weights_dir else []
    cse_fn = None
    if w:
        from moda_tpu.preproc.checkpoints import load_cse_predictor
        cse_fn = load_cse_predictor(w[0])
        print(f"[densepose] CSE ({os.path.basename(w[0])})")
    else:
        print("[densepose] no CSE weights: writing zero features "
              "(train with --nouse_embed, or distill via train/cse_distill.py)")
    write_dp_features(seq_dir, args.database, args.seqname, cse_fn=cse_fn)
    return cse_fn is not None


def stage_flow(args, seq_dir: str) -> None:
    from moda_tpu.preproc.pipeline import compute_flows

    w = glob.glob(os.path.join(args.weights_dir, "vcn*.npz")) \
        if args.weights_dir else []
    flow_fn = None
    if w:
        from moda_tpu.preproc.checkpoints import load_vcn_predictor
        flow_fn = load_vcn_predictor(w[0]).as_flow_fn()
        print(f"[flow] VCN+ ({os.path.basename(w[0])})")
    else:
        print("[flow] no VCN weights: OpenCV DIS + fb-confidence")
    compute_flows(seq_dir, args.database, args.seqname, flow_fn=flow_fn)


def main(argv=None):
    args = build_argparser().parse_args(argv)

    seq_dir = stage_frames(args)
    stage_masks(args, seq_dir)
    have_cse = stage_densepose(args, seq_dir)
    stage_flow(args, seq_dir)

    from moda_tpu.preproc.pipeline import write_config

    img0 = cv2.imread(sorted(glob.glob(os.path.join(seq_dir, "*.jpg")))[0])
    cfg_path = write_config(args.config_dir, args.seqname, seq_dir,
                            img0.shape[:2])
    print(f"[config] {cfg_path}")

    if args.lines:
        from moda_tpu.data.dataset import build_datasets
        from moda_tpu.preproc.pipeline import write_lines

        ds = build_datasets(args.seqname, img_size=args.img_size,
                            config_dir=args.config_dir)
        write_lines(args.database, args.seqname, args.img_size, ds)
        print(f"[lines] Pixels shards @ {args.img_size}")

    extra = "" if have_cse else " --nouse_embed"
    print(f"done. train with: python -m moda_tpu.cli.train_app "
          f"--seqname {args.seqname} --lineload{extra} ...")


if __name__ == "__main__":
    main()

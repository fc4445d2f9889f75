"""Offline preprocessing: raw video -> the DAVIS-layout database.

Role of preprocess/preprocess.sh + compute_flow.sh + write_config.py in
the reference (SURVEY.md L0). Produces the same on-disk contract the
datasets read (vidbase.py:68-174):

  database/DAVIS/JPEGImages/Full-Resolution/<seq>/%05d.jpg
  database/DAVIS/Annotations/Full-Resolution/<seq>/%05d.png
  database/DAVIS/FlowFW_<d>/Full-Resolution/<seq>/flo-%05d.pfm (+occ-)
  database/DAVIS/Densepose/Full-Resolution/<seq>/{%05d.pfm,feat-,bbox-}
  configs/<seq>.config

Model-based stages are pluggable callbacks:
- segmentation (reference: PointRend): defaults to accepting existing
  masks; a callable (frame -> mask) can be injected;
- surface embeddings (reference: DensePose-CSE): optional callable; when
  absent, zero features are written and training runs with
  --nouse_embed;
- optical flow (reference: VCN+ CUDA): defaults to OpenCV DIS flow with
  forward-backward occlusion confidence — dependency-free and adequate
  for the flow-consistency losses; a learned-flow callable can be
  injected for full parity.
"""
from __future__ import annotations

import glob
import os
from typing import Callable, List, Optional

import cv2
import numpy as np

from moda_tpu.data.pfm import write_pfm

DFRAMES = (1, 2, 4, 8, 16, 32)


def extract_frames(video_path: str, out_dir: str, fps: int = 10) -> List[str]:
    """Video -> JPEG frames at a fixed rate (preprocess.sh:42 ffmpeg)."""
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    step = max(int(round(src_fps / fps)), 1)
    paths = []
    i = out_i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % step == 0:
            p = os.path.join(out_dir, "%05d.jpg" % out_i)
            cv2.imwrite(p, frame)
            paths.append(p)
            out_i += 1
        i += 1
    cap.release()
    return paths


def dis_flow(img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
    """Dense flow img0->img1 via OpenCV DIS (VCN+ stand-in)."""
    g0 = cv2.cvtColor(img0, cv2.COLOR_BGR2GRAY)
    g1 = cv2.cvtColor(img1, cv2.COLOR_BGR2GRAY)
    dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
    return dis.calc(g0, g1, None)


def fb_confidence(flow_fw: np.ndarray, flow_bw: np.ndarray) -> np.ndarray:
    """Forward-backward consistency -> [0,1] confidence (the occ-*.pfm
    convention consumed by vidbase.flow_process)."""
    h, w = flow_fw.shape[:2]
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    mx = xs + flow_fw[..., 0]
    my = ys + flow_fw[..., 1]
    bw_at = cv2.remap(flow_bw, mx, my, cv2.INTER_LINEAR)
    err = np.linalg.norm(flow_fw + bw_at, axis=-1)
    conf = np.exp(-0.1 * err)
    return conf.astype(np.float32)


def compute_flows(seq_dir: str, database_root: str, seqname: str,
                  flow_fn: Optional[Callable] = None,
                  dframes=DFRAMES) -> None:
    """Write FlowFW_<d>/FlowBW_<d> flo-/occ- PFM pairs for a sequence."""
    flow_fn = flow_fn or dis_flow
    imgs = sorted(glob.glob(os.path.join(seq_dir, "*.jpg")))
    frames = [cv2.imread(p) for p in imgs]
    n = len(frames)
    for d in dframes:
        fw_dir = os.path.join(database_root, f"FlowFW_{d}", "Full-Resolution", seqname)
        bw_dir = os.path.join(database_root, f"FlowBW_{d}", "Full-Resolution", seqname)
        os.makedirs(fw_dir, exist_ok=True)
        os.makedirs(bw_dir, exist_ok=True)
        for i in range(0, n - d):
            if i % d != 0:
                continue
            fw = flow_fn(frames[i], frames[i + d])
            bw = flow_fn(frames[i + d], frames[i])
            occ_fw = fb_confidence(fw, bw)
            occ_bw = fb_confidence(bw, fw)
            f3 = np.concatenate([fw, np.zeros_like(fw[..., :1])], -1)
            b3 = np.concatenate([bw, np.zeros_like(bw[..., :1])], -1)
            write_pfm(os.path.join(fw_dir, "flo-%05d.pfm" % i), f3)
            write_pfm(os.path.join(fw_dir, "occ-%05d.pfm" % i), occ_fw)
            write_pfm(os.path.join(bw_dir, "flo-%05d.pfm" % (i + d)), b3)
            write_pfm(os.path.join(bw_dir, "occ-%05d.pfm" % (i + d)), occ_bw)


def write_masks(seq_dir: str, database_root: str, seqname: str,
                mask_fn: Callable[[np.ndarray], np.ndarray]) -> None:
    """Run a segmentation callable over frames -> Annotations PNGs
    (preprocess/mask.py role). Use
    ``preproc.pointrend_infer.PointRendPredictor(...).as_mask_fn()`` with
    converted detectron2 PointRend weights for the reference's backend."""
    out_dir = os.path.join(database_root, "Annotations", "Full-Resolution", seqname)
    os.makedirs(out_dir, exist_ok=True)
    for p in sorted(glob.glob(os.path.join(seq_dir, "*.jpg"))):
        img = cv2.imread(p)
        mask = mask_fn(img)
        mask = largest_cc((mask > 0).astype(np.uint8))
        name = os.path.basename(p).rsplit(".", 1)[0] + ".png"
        cv2.imwrite(os.path.join(out_dir, name), mask.astype(np.uint8) * 128)


def largest_cc(mask: np.ndarray) -> np.ndarray:
    """Keep the largest connected component (mask.py:50-126 behavior)."""
    n, labels = cv2.connectedComponents(mask.astype(np.uint8))
    if n <= 1:
        return mask
    best, best_n = 0, -1
    for i in range(1, n):
        c = int((labels == i).sum())
        if c > best_n:
            best, best_n = i, c
    return (labels == best).astype(np.uint8)


def write_dp_features(seq_dir: str, database_root: str, seqname: str,
                      cse_fn: Optional[Callable] = None) -> None:
    """Write Densepose artifacts: per-frame vertex map (%05d.pfm, stored
    /50 as in compute_dp.py:97), 16x112x112 feature pfm, bbox txt.
    Without a CSE backend, zero features are emitted (training then runs
    with --nouse_embed). ``cse_fn(img_bgr, mask) -> (feat [16,112,112],
    vert_map [H,W], bbox [4])`` — e.g. ``preproc.cse_infer.CSEPredictor``
    with converted detectron2 weights; the mask comes from the
    write_masks stage (zeros if absent)."""
    out_dir = os.path.join(database_root, "Densepose", "Full-Resolution", seqname)
    mask_dir = os.path.join(database_root, "Annotations", "Full-Resolution", seqname)
    os.makedirs(out_dir, exist_ok=True)
    for idx, p in enumerate(sorted(glob.glob(os.path.join(seq_dir, "*.jpg")))):
        img = cv2.imread(p)
        h, w = img.shape[:2]
        mask_p = os.path.join(mask_dir, "%05d.png" % idx)
        mask = (cv2.imread(mask_p, 0) > 0).astype(np.uint8) \
            if os.path.exists(mask_p) else np.zeros((h, w), np.uint8)
        if cse_fn is not None:
            feat, vert_map, bbox = cse_fn(img, mask)
        else:
            feat = np.zeros((16, 112, 112), np.float32)
            vert_map = np.zeros((h, w), np.float32)
            bbox = np.asarray([0, 0, w, h], np.float32)
        write_pfm(os.path.join(out_dir, "%05d.pfm" % idx), vert_map / 50.0)
        write_pfm(os.path.join(out_dir, "feat-%05d.pfm" % idx),
                  feat.reshape(16 * 112, 112))
        np.savetxt(os.path.join(out_dir, "bbox-%05d.txt" % idx), bbox)


def write_config(config_dir: str, seqname: str, datapath: str,
                 img_hw: tuple, dframe: str = "1") -> str:
    """Emit configs/<seq>.config (preprocess/write_config.py format)."""
    os.makedirs(config_dir, exist_ok=True)
    h, w = img_hw
    fl = max(h, w)
    path = os.path.join(config_dir, f"{seqname}.config")
    with open(path, "w") as f:
        f.write("[data]\n")
        f.write(f"dframe = {dframe}\ninit_frame = 0\nend_frame = -1\ncan_frame = -1\n\n")
        f.write("[data_0]\n")
        f.write(f"ks = {fl} {fl} {w/2} {h/2}\n")
        f.write(f"datapath = {datapath}\n")
    return path


def write_lines(database_root: str, seqname: str, img_size: int,
                datasets) -> None:
    """img2lines-compatible pixel-row shards (preprocess/img2lines.py:33-107):
    Pixels/<seq>/<dframe>_<frameid>/%04d.npy per row (reference key names,
    pair-stacked [1, 2, C, W]) + rtk.npy {'rtk','kaug'}. Readable by both
    the reference's LineDataset and our LineShardDataset."""
    out_base = os.path.join(database_root, "Pixels", "Full-Resolution", seqname)
    key_map = {"img": "imgs", "mask": "masks", "vis2d": "vis2d",
               "flow": "flow", "occ": "occ", "dp_feat_rsmp": "dp_feats"}
    for ds in datasets:
        for i in range(ds.num_frames - 1):
            pair = ds.sample_pair(np.random.default_rng(i), idx=i)
            d0, d1 = pair["frames"]
            dirname = os.path.join(out_base, f"1_{i:05d}")
            os.makedirs(dirname, exist_ok=True)
            np.save(os.path.join(dirname, "rtk.npy"),
                    {"rtk": np.stack([d0["rtk"], d1["rtk"]])[None],
                     "kaug": np.stack([d0["kaug"], d1["kaug"]])[None]})
            for row in range(img_size):
                sl = slice(row * img_size, (row + 1) * img_size)
                elem = {}
                for ref_k, our_k in key_map.items():
                    elem[ref_k] = np.stack(
                        [d0[our_k][..., sl], d1[our_k][..., sl]])[None]
                elem["dp"] = np.stack(
                    [d0.get("dps", d0["masks"])[..., sl],
                     d1.get("dps", d1["masks"])[..., sl]])[None]
                np.save(os.path.join(dirname, "%04d.npy" % row), elem)


def compute_flow_cse(cse_a: np.ndarray, cse_b: np.ndarray) -> np.ndarray:
    """Dense flow a->b by CSE feature matching (geom_utils.py:1230-1247).

    cse_{a,b}: [16, h, w] unit feature images. Returns flo [2, h, w] in
    [-2, 2] normalized units (matching the reference's dp-flow convention)."""
    C, h, w = cse_a.shape
    fa = cse_a.reshape(C, -1)
    fb = cse_b.reshape(C, -1)
    cost = fa.T @ fb  # [hw, hw]
    match = cost.argmax(1)
    tx, ty = match % w, match // w
    xs, ys = np.meshgrid(range(w), range(h))
    flo = np.stack([tx.reshape(h, w) - xs, ty.reshape(h, w) - ys], 0)
    return flo.astype(np.float32) / w * 2.0

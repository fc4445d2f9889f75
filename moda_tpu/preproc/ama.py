"""AMA dataset conversion: multi-camera AMA captures -> DAVIS layout.

Role of scripts/ama-process/{ama2davis.py,read_cam.py}: copy per-camera
images + silhouettes into JPEGImages/Annotations and parse the
Camera%d.Pmat.cal projection matrices used as eval ground truth
(run_eval.sh:5-9).
"""
from __future__ import annotations

import glob
import os
import shutil

import cv2
import numpy as np


def read_pmat(path: str) -> np.ndarray:
    """Parse a Camera*.Pmat.cal 3x4 projection matrix."""
    vals = np.loadtxt(path)
    return vals.reshape(3, 4)


def pmat_to_rtk(pmat: np.ndarray) -> np.ndarray:
    """Decompose P = K [R|t] into the rtk 4x4 layout (RQ decomposition)."""
    import scipy.linalg

    M = pmat[:, :3]
    K, R = scipy.linalg.rq(M)
    # positive diagonal
    S = np.diag(np.sign(np.diag(K)))
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        R = -R
        K = -K
    t = np.linalg.solve(K, pmat[:, 3])
    K = K / K[2, 2]
    rtk = np.zeros((4, 4))
    rtk[:3, :3] = R
    rtk[:3, 3] = t
    rtk[3] = [K[0, 0], K[1, 1], K[0, 2], K[1, 2]]
    return rtk


def ama_to_davis(ama_seq_dir: str, database_root: str, seqname: str,
                 camera: int = 0) -> int:
    """Copy images/<cam> + silhouettes/<cam> into the DAVIS layout.

    AMA layout: <seq>/images/Image%d-%04d.png, <seq>/silhouettes/
    silhouette%d-%04d.pbm (ama2davis.py)."""
    img_dir = os.path.join(database_root, "JPEGImages", "Full-Resolution", seqname)
    ann_dir = os.path.join(database_root, "Annotations", "Full-Resolution", seqname)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    imgs = sorted(glob.glob(os.path.join(ama_seq_dir, "images", f"Image{camera}-*.png")))
    n = 0
    for i, p in enumerate(imgs):
        img = cv2.imread(p)
        cv2.imwrite(os.path.join(img_dir, "%05d.jpg" % i), img)
        sil_p = os.path.join(ama_seq_dir, "silhouettes",
                             f"silhouette{camera}-" + p.split("-")[-1].replace(".png", ".pbm"))
        sil = cv2.imread(sil_p, 0)
        if sil is None:
            sil = np.zeros(img.shape[:2], np.uint8)
        cv2.imwrite(os.path.join(ann_dir, "%05d.png" % i), (sil > 0).astype(np.uint8) * 128)
        n += 1
    return n

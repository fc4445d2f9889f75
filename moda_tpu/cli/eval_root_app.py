"""Root-pose accuracy evaluation CLI (scripts/eval/eval_root.py role).

Usage: python -m moda_tpu.cli.eval_root_app <pred_cam_prefix> <gt_cam_prefix> <num_frames>

Camera files are per-frame 4x4 rtk txt as written by extract_app
(<prefix>-%05d.txt); reports sim3-aligned SO3 error stats in degrees.
"""
from __future__ import annotations

import json
import sys

import numpy as np

from moda_tpu.evals.sim3 import align_sim3


def load_cams(prefix: str, n: int) -> np.ndarray:
    """Accepts extract_app's <prefix>-%05d.txt layout or a directory of
    %05d.txt files (the Cameras/ GT layout)."""
    import os
    out = []
    for i in range(n):
        p = f"{prefix}-{i:05d}.txt"
        if not os.path.exists(p):
            p = os.path.join(prefix, f"{i:05d}.txt")
        out.append(np.loadtxt(p))
    return np.stack(out)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    pred_prefix, gt_prefix, n = argv[0], argv[1], int(argv[2])
    pred = load_cams(pred_prefix, n)
    gt = load_cams(gt_prefix, n)
    stats = align_sim3(gt, pred)
    out = {k: v for k, v in stats.items() if k != "aligned"}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

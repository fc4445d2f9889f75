"""Root-pose gauge diagnostic: decompose exported-camera error vs GT into
a global canonical-frame offset plus per-frame drift.

The sim3-aligned SO3 metric (evals/sim3.py, reference eval_root.py)
reports one number; this tool shows the structure behind it:

- per-frame rotation error |R_pred R_gt^T| (raw, un-aligned);
- the object-frame offset C_i = R_gt^T R_pred, its magnitude, and its
  drift relative to frame 0 (constant C = benign global gauge that sim3
  alignment removes; C drifting at the camera-orbit rate = the monocular
  spin gauge: orbit re-explained as object rotation — see PARITY.md
  "Cold-start route rehearsal" for the round-3 case study).

Usage:
  python tools/diag_root_gauge.py <export_dir/seq-cam-prefix> <gt_cam_dir>
e.g.
  python tools/diag_root_gauge.py logdir/x-export/a-flap96-cam \\
      database/DAVIS/Cameras/Full-Resolution/a-flap96
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np


def rot_angle_deg(R: np.ndarray) -> float:
    return float(np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))))


def main(pred_prefix: str, gt_dir: str) -> dict:
    preds = sorted(glob.glob(pred_prefix + "-*.txt"))
    rows = []
    for p in preds:
        i = int(p.rsplit("-", 1)[1].split(".")[0])
        g = os.path.join(gt_dir, "%05d.txt" % i)
        if not os.path.exists(g):
            continue
        Rp = np.loadtxt(p)[:3, :3]
        Rg = np.loadtxt(g)[:3, :3]
        rows.append((i, Rp, Rg))
    if not rows:
        raise SystemExit(f"no overlapping frames for {pred_prefix} vs {gt_dir}")

    Cs = [Rg.T @ Rp for _, Rp, Rg in rows]
    C0 = Cs[0]
    report = {
        "frames": [i for i, _, _ in rows],
        "raw_err_deg": [round(rot_angle_deg(Rp @ Rg.T), 1)
                        for _, Rp, Rg in rows],
        "offset_mag_deg": [round(rot_angle_deg(C), 1) for C in Cs],
        "offset_drift_vs_frame0_deg": [round(rot_angle_deg(C0.T @ C), 1)
                                       for C in Cs],
    }
    drift = np.asarray(report["offset_drift_vs_frame0_deg"])
    report["summary"] = {
        "raw_err_med": float(np.median(report["raw_err_deg"])),
        "offset_drift_max": float(drift.max()),
        # constant offset (drift ~0) = benign global gauge; large drift =
        # per-frame mis-registration (e.g. spin gauge)
        "global_gauge_only": bool(drift.max() < 10.0),
    }
    return report


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    print(json.dumps(main(sys.argv[1], sys.argv[2]), indent=1))

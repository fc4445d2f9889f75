"""Two-frame feature-match visualization CLI (scripts/visualize/match.py).

  python -m moda_tpu.cli.match_app --seqname X --logname exp1 \
      --model_path logdir/exp1/latest --match_frames "0 5"
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    from moda_tpu.runtime import setup_jax
    setup_jax()

    import cv2

    from moda_tpu.cli.flags import parse_config
    from moda_tpu.config import DataInfo, load_seq_config
    from moda_tpu.data.dataset import build_datasets, data_offsets
    from moda_tpu.train.trainer import Trainer
    from moda_tpu.viz.match import draw_matches, match_frames

    argv = list(argv if argv is not None else sys.argv[1:])
    pair = "0 1"
    if "--match_frames" in argv:
        i = argv.index("--match_frames")
        pair = argv[i + 1]
        del argv[i:i + 2]
    f0, f1 = [int(x) for x in pair.split()]

    cfg = parse_config(argv)
    datasets = build_datasets(cfg.seqname, cfg.img_size, cfg.config_dir,
                              rtk_base=cfg.rtk_path or None)
    offsets = data_offsets(datasets)
    intrinsics = [tuple(s.ks) for s in load_seq_config(cfg.seqname, cfg.config_dir)]
    info = DataInfo(offset=offsets, intrinsics=tuple(intrinsics))
    trainer = Trainer(cfg, info, loader=None)

    ds = datasets[0]
    d0 = ds.reader.read_raw(f0, flowfw=True, dframe=1)
    d1 = ds.reader.read_raw(f1, flowfw=True, dframe=1)
    S = cfg.img_size
    # sample pixels on the object mask
    ys, xs = np.where(d0["mask"] > 0)
    sel = np.random.default_rng(0).choice(len(xs), size=min(64, len(xs)), replace=False)
    xys0 = np.stack([xs[sel], ys[sel]], -1).astype(np.float32)
    feats0 = d0["dp_feat_rsmp"].reshape(16, -1)[:, ys[sel] * S + xs[sel]].T

    rtk0 = trainer.latest_vars["rtk"][f0]
    rtk1 = trainer.latest_vars["rtk"][f1]
    pts, xys1 = match_frames(trainer.model, trainer.params, trainer.mvars,
                             feats0, xys0, rtk0, rtk1, d0["kaug"], f0, f1)
    canvas = draw_matches(d0["img"], d1["img"], xys0, xys1)
    out = os.path.join(cfg.checkpoint_dir, cfg.logname + f"-match-{f0}-{f1}.png")
    cv2.imwrite(out, canvas[..., ::-1])
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])

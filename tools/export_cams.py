"""Cams-only export: write the per-frame camera txt files a full
extract_app run would produce (extract.py:24-136 save_output's cam-*.txt
part), skipping the grid query / marching cubes / renders. Purpose:
root-pose evaluation (eval_root_app) of a checkpoint in seconds instead
of the ~20-min full extraction on a tunneled single chip.

  python tools/export_cams.py --seqname a-flap --logname x \
      --model_path logdir/x/latest [--lineload ...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    from moda_tpu.runtime import setup_jax
    setup_jax()

    from moda_tpu.cli.flags import parse_config
    from moda_tpu.config import DataInfo, load_seq_config
    from moda_tpu.data.dataset import build_datasets, data_offsets
    from moda_tpu.train.trainer import Trainer

    cfg = parse_config(argv)
    datasets = build_datasets(cfg.seqname, cfg.img_size, cfg.config_dir,
                              rtk_base=cfg.rtk_path or None)
    offsets = data_offsets(datasets)
    intrinsics = [tuple(s.ks)
                  for s in load_seq_config(cfg.seqname, cfg.config_dir)]
    info = DataInfo(offset=offsets, intrinsics=tuple(intrinsics))
    trainer = Trainer(cfg, info, loader=None)
    assert cfg.model_path, "--model_path required"

    out_dir = os.path.join(cfg.checkpoint_dir, cfg.logname + "-export")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for fi in range(offsets[-1] - 1):
        rtk = trainer.latest_vars["rtk"][fi].copy()
        rtk[:3, 3] *= trainer.model.obj_scale
        np.savetxt(os.path.join(out_dir, f"{cfg.seqname}-cam-{fi:05d}.txt"),
                   rtk)
        n += 1
    print(f"wrote {n} cams to {out_dir}/{cfg.seqname}-cam-*.txt")


if __name__ == "__main__":
    main()

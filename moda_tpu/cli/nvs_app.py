"""Novel-view-synthesis CLI (scripts/visualize/nvs.py role).

  python -m moda_tpu.cli.nvs_app --seqname X --logname exp1 \
      --model_path logdir/exp1/latest --test_frames 9

Renders (a) an input-view replay and (b) a bullet-time turntable around
the middle frame, written as gifs next to the checkpoint.
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    from moda_tpu.runtime import setup_jax
    setup_jax()

    import jax.numpy as jnp

    from moda_tpu.cli.flags import parse_config
    from moda_tpu.config import DataInfo, load_seq_config
    from moda_tpu.data.dataset import build_datasets, data_offsets
    from moda_tpu.train.trainer import Trainer
    from moda_tpu.viz.nvs import render_nvs, save_gif, turntable_cams

    cfg = parse_config(argv)
    datasets = build_datasets(cfg.seqname, cfg.img_size, cfg.config_dir,
                              rtk_base=cfg.rtk_path or None)
    offsets = data_offsets(datasets)
    intrinsics = [tuple(s.ks) for s in load_seq_config(cfg.seqname, cfg.config_dir)]
    info = DataInfo(offset=offsets, intrinsics=tuple(intrinsics))
    trainer = Trainer(cfg, info, loader=None)
    assert cfg.model_path, "--model_path required"

    if cfg.rootdir:
        # ctraj-file-driven NVS with reference-sil compositing
        # (scripts/visualize/nvs.py:41-199; trajectories from extract_app's
        # -ctrajs-/-refsil- exports or any saved root directory)
        import cv2

        from moda_tpu.extract.mesh import extract_mesh
        from moda_tpu.viz.nvs import load_root, load_sils, render_nvs_ctraj

        rtks = load_root(cfg.rootdir)
        sils = load_sils(cfg.rootdir.replace("ctrajs", "refsil"))
        if cfg.maxframe > 0:
            sample_idx = np.linspace(0, len(rtks) - 1, cfg.maxframe).astype(int)
        else:
            sample_idx = np.arange(len(rtks))
        rtks = rtks[sample_idx]
        sils = [sils[i] for i in sample_idx]
        embedids = sample_idx + offsets[cfg.vidid]
        if cfg.bullet_time > -1:
            embedids = np.full_like(embedids, cfg.bullet_time + offsets[cfg.vidid])

        mesh_rest = extract_mesh(trainer.model, trainer.params,
                                 trainer.latest_vars["obj_bound"],
                                 cfg.sample_grid3d, cfg.mc_threshold)
        frames = render_nvs_ctraj(trainer.model, trainer.params, trainer.mvars,
                                  rtks, sils, embedids, cfg.ndepth,
                                  scale=cfg.scale, chunk=cfg.chunk,
                                  mesh_rest_verts=mesh_rest.vertices)
        os.makedirs(os.path.dirname(cfg.nvs_outpath) or ".", exist_ok=True)
        for i, f in enumerate(frames):
            cv2.imwrite(f"{cfg.nvs_outpath}-rgb_{i:05d}.png",
                        (np.clip(f["rgb"], 0, 1) * 255)[..., ::-1].astype(np.uint8))
            cv2.imwrite(f"{cfg.nvs_outpath}-sil_{i:05d}.png",
                        (np.clip(f["sil"], 0, 1) * 255).astype(np.uint8))
            cv2.imwrite(f"{cfg.nvs_outpath}-vis_{i:05d}.png",
                        (np.clip(f["vis"], 0, 1) * 255).astype(np.uint8))
        from moda_tpu.viz.nvs import save_gif
        save_gif(f"{cfg.nvs_outpath}-rgb.gif", [f["rgb"] for f in frames])
        print(f"wrote {len(frames)} NVS frames to {cfg.nvs_outpath}-*")
        return

    out_dir = os.path.join(cfg.checkpoint_dir, cfg.logname + "-nvs")
    os.makedirs(out_dir, exist_ok=True)
    num_fr = info.num_fr
    n = min(int(cfg.test_frames) if not cfg.test_frames.startswith("{") else 9, num_fr)
    ids = np.linspace(0, num_fr - 1, n, dtype=int)

    # input-view replay
    cams = trainer.latest_vars["rtk"][ids]
    frames = render_nvs(trainer.model, trainer.params, trainer.mvars,
                        cams, ids, cfg.render_size, cfg.ndepth, chunk=cfg.chunk)
    save_gif(os.path.join(out_dir, "replay.gif"),
             [f["img_coarse"] for f in frames])

    # bullet time around the middle frame
    mid = int(ids[len(ids) // 2])
    orbit = turntable_cams(trainer.latest_vars["rtk"][mid], num_views=n)
    frames = render_nvs(trainer.model, trainer.params, trainer.mvars,
                        orbit, [mid] * n, cfg.render_size, cfg.ndepth,
                        chunk=cfg.chunk)
    save_gif(os.path.join(out_dir, "bullet.gif"),
             [f["img_coarse"] for f in frames])
    print(f"wrote {out_dir}/replay.gif and bullet.gif")


if __name__ == "__main__":
    main(sys.argv[1:])

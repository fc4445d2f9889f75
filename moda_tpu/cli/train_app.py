"""Training entry point — the reference's main.py, TPU edition.

Usage (mirrors scripts/template.sh stage flags):
  python -m moda_tpu.cli.train_app --seqname cat-pikachiu-sub \
      --logname exp1 --num_epochs 120 --lineload --batch_size 256 ...

Multi-host: when launched under a multi-process runtime (env vars below),
``jax.distributed.initialize()`` forms the process group — the TPU
equivalent of the reference's torchrun/NCCL init (main.py:22-28). Data
sharding per process comes from PairLoader's process_index RNG streams
(the DistributedSampler analogue, frameloader.py:40-45).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def maybe_init_distributed():
    """Initialize the jax process group when multi-process env vars are
    present (TPU pod runtimes set these; torchrun-style COORDINATOR vars
    also accepted). No-op for the single-host case."""
    import jax
    n = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get("NPROCS")
    coord = (os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("COORDINATOR_ADDRESS"))
    pid = os.environ.get("JAX_PROCESS_ID") or os.environ.get("PROCESS_ID")
    hosts = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    try:
        if coord and n:
            jax.distributed.initialize(coordinator_address=coord,
                                       num_processes=int(n),
                                       process_id=int(pid or 0))
        elif len(hosts) > 1:
            jax.distributed.initialize()  # auto-detected multi-host TPU pod
    except (RuntimeError, ValueError) as e:  # already initialized / partial env
        print(f"jax.distributed.initialize skipped: {e}")


def main(argv=None):
    from moda_tpu.runtime import setup_jax
    setup_jax()
    maybe_init_distributed()

    from moda_tpu.cli.flags import parse_config
    from moda_tpu.config import DataInfo
    from moda_tpu.data.dataset import PairLoader, build_datasets, data_offsets
    from moda_tpu.train.trainer import Trainer

    cfg = parse_config(argv)
    # lineload: prefer the reference's pre-sharded pixel rows when present
    datasets = None
    if cfg.lineload:
        import os
        from moda_tpu.config import load_seq_config
        from moda_tpu.data.dataset import build_line_datasets
        seqs = load_seq_config(cfg.seqname, cfg.config_dir)
        pixels = seqs[0].image_list()[0].replace("JPEGImages", "Pixels").rsplit("/", 1)[0]
        if os.path.isdir(pixels):
            datasets = build_line_datasets(cfg.seqname, cfg.img_size, cfg.config_dir,
                                           rtk_base=cfg.rtk_path or None)
    if datasets is None:
        datasets = build_datasets(cfg.seqname, cfg.img_size, cfg.config_dir,
                                  rtk_base=cfg.rtk_path or None)
    offsets = data_offsets(datasets)
    intrinsics = []
    from moda_tpu.config import load_seq_config
    for s in load_seq_config(cfg.seqname, cfg.config_dir):
        intrinsics.append(tuple(s.ks))
    info = DataInfo(offset=offsets, intrinsics=tuple(intrinsics))

    import jax
    # host-side pixel sampling: nsample uniform slots + the 4x active
    # candidate pool per entry; ft_cse needs full crops in the batch
    npix = None if cfg.ft_cse else 5 * cfg.nsample
    loader = PairLoader(datasets, cfg.batch_size, seed=cfg.seed,
                        process_index=jax.process_index(),
                        num_threads=cfg.n_data_workers,
                        num_prefetch=max(4, cfg.n_data_workers),
                        npix=npix)
    # eval datasets at render_size: eval renders use real crop kaug
    # (train_utils.py:140 builds the reference eval loader this way)
    try:
        eval_datasets = build_datasets(cfg.seqname, cfg.render_size,
                                       cfg.config_dir,
                                       rtk_base=cfg.rtk_path or None)
    except Exception:
        eval_datasets = None
    trainer = Trainer(cfg, info, loader=loader, eval_datasets=eval_datasets,
                      seed=cfg.seed)

    # canonical template prior (the reference's mesh_material CSE template,
    # moda.py:405-445): verts/faces [+ per-vertex 'embeddings'] pkl
    if cfg.prior_mesh_path:
        trainer.load_prior_mesh(cfg.prior_mesh_path)

    # camera initialization: rtk files on disk (use_rtk_file / posenet export)
    if cfg.use_rtk_file or cfg.rtk_path:
        rtks = []
        ok = True
        for d in datasets:
            rtklist = getattr(d, "rtklist", None)
            if rtklist is None:
                rtklist = d.reader.paths.rtklist
            for i in range(d.num_frames):
                try:
                    rtk = np.loadtxt(rtklist[i])
                    rtk[:3, 3] /= trainer.model.obj_scale
                    rtks.append(rtk)
                except (FileNotFoundError, OSError, TypeError):
                    ok = False
        if ok and rtks:
            trainer.set_cameras_from_rtk_files(np.stack(rtks).astype(np.float32))

    trainer.train()
    loader.close()


if __name__ == "__main__":
    main(sys.argv[1:])

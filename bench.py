"""Training-throughput benchmark: rays/sec on one chip, production step shape.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Step shape matches the reference recipe (BASELINE.md): batch 256 line
pairs x nsample 4 px x ndepth 128 depth samples -> 2048 rays x 128
samples per optimization step, full loss set (feat-match OT, projection,
cycle, flow, uncertainty).

vs_baseline: the reference publishes no throughput (BASELINE.md); we use a
2xA100 estimate of 2.0e5 rays/sec derived from the recipe's wall-clock
envelope (120 epochs x 200 iters in a few hours at 2048 rays/step).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    from moda_tpu.runtime import setup_jax
    setup_jax()

    import jax
    import jax.numpy as jnp

    from moda_tpu.config import DataInfo, MoDAConfig
    from moda_tpu.fields.model import MoDAModel
    from moda_tpu.train.optim import MoDAOptimizer
    from moda_tpu.train.step import StepExtras, make_train_step

    # production shape: 256 line pairs, nsample 4, ndepth 128
    # (template.sh:27, lineload layout: each batch entry is one 512-px row)
    n_pairs = 256
    cfg = MoDAConfig(num_bones=25, img_size=512, nsample=4, ndepth=128,
                     use_unc=True, feat_ndepth_grid=20, lineload=True)
    num_fr = 64
    info = DataInfo(offset=(0, num_fr), intrinsics=((500.0, 500.0, 256.0, 256.0),))
    model = MoDAModel(cfg, info)
    params, mvars = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    P = cfg.img_size  # one pixel row per entry
    bs2 = 2 * n_pairs

    def img(c):
        return jnp.asarray(rng.uniform(size=(bs2, c, P)).astype(np.float32))

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
                           donate=True)
    extras = StepExtras(
        progress=jnp.asarray(0.5), loss_select=jnp.asarray(1),
        root_update=jnp.asarray(1.0), body_update=jnp.asarray(1.0),
        shape_update=jnp.asarray(0.0), cvf_update=jnp.asarray(0.0),
        sil_err_median=jnp.asarray(1e9),
        shape_samp=jnp.asarray(rng.normal(size=(1000, 3)).astype(np.float32) * 0.1),
        shape_samp_valid=jnp.asarray(1.0),
        embed_alpha=jnp.asarray(10.0),
    )

    # warmup / compile
    params, opt_state, aux, _ = step(params, opt_state, mvars, batch, extras,
                                     jax.random.key(0))
    jax.block_until_ready(aux["total_loss"])

    n_steps = 50
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, aux, _ = step(params, opt_state, mvars, batch, extras,
                                         jax.random.key(i + 1))
    jax.block_until_ready(aux["total_loss"])
    dt = time.perf_counter() - t0

    rays_per_step = bs2 * cfg.nsample
    rays_per_sec = rays_per_step * n_steps / dt
    baseline_est = 2.0e5  # est. 2xA100 reference throughput (no published number)
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline_est, 3),
    }))


if __name__ == "__main__":
    main()

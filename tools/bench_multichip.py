"""Multi-chip program-scaling evidence on a virtual CPU mesh.

The driver's dryrun_multichip proves the sharded step compiles+runs; this
tool proves the PROGRAM scales, without needing N real chips:

- for mesh sizes 1/2/4/8 (same global batch, sharded on the ray/pair
  axis), lower + compile the full training step and assert from the
  compiled HLO that the batch parameters are the PER-DEVICE shape
  (2B/n) and the global shape is gone — the partitioner is splitting
  work, not replicating it (jax cost_analysis reports the logical
  module's FLOPs regardless of partitioning, so it cannot be the gate);
- count the collectives in the compiled HLO: data-parallel grad psum =>
  all-reduce present, count stable in n (one per reduction group, not
  one per device);
- execute two steps per mesh and assert the jit cache holds exactly one
  executable (no per-step recompile).

Writes one JSON line; run as:  python tools/bench_multichip.py
TPU-equivalence note: on real v4/v5e ICI the same program's collectives
ride the torus; the partitioned HLO is identical modulo backend.
Reference DDP semantics being replaced: main.py:22-28 (NCCL),
train_utils.py:958 (backward all-reduce).
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MAX = 8


def main():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={N_MAX}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__ as GE
    from moda_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from moda_tpu.train.optim import MoDAOptimizer
    from moda_tpu.train.step import StepExtras, make_train_step

    cfg, model, params0, mvars = GE._tiny_setup()
    batch0 = GE._tiny_batch(cfg, n_pairs=N_MAX)  # global batch fixed
    opt = MoDAOptimizer(cfg, total_steps=100)
    opt_state0 = opt.init(params0)

    extras = StepExtras(
        progress=jnp.asarray(0.5), loss_select=jnp.asarray(1),
        root_update=jnp.asarray(1.0), body_update=jnp.asarray(1.0),
        shape_update=jnp.asarray(0.0), cvf_update=jnp.asarray(0.0),
        sil_err_median=jnp.asarray(1e9),
        shape_samp=jnp.zeros((64, 3)), shape_samp_valid=jnp.asarray(0.0),
        embed_alpha=jnp.asarray(10.0),
    )

    out = {"n_devices": [], "flops_logical": [], "all_reduce": [],
           "all_gather": [], "cache_size": [], "total_loss": [],
           "batch_sharded": []}
    bs2 = 2 * N_MAX
    P = cfg.img_size * cfg.img_size
    for n in (1, 2, 4, 8):
        step = make_train_step(model, opt, nsample=cfg.nsample,
                               ndepth=cfg.ndepth, use_fine=False,
                               use_dskin=False, use_bones=True, donate=False)
        mesh = make_mesh(n)
        params = replicate(params0, mesh)
        opt_state = replicate(opt_state0, mesh)
        mvars_r = replicate(mvars, mesh)
        batch = shard_batch(batch0, mesh)
        extras_r = replicate(extras, mesh)
        with mesh:
            lowered = step.lower(params, opt_state, mvars_r, batch, extras_r,
                                 jax.random.key(0))
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            hlo = compiled.as_text()
            p1, o1, aux, _ = step(params, opt_state, mvars_r, batch, extras_r,
                                  jax.random.key(1))
            p2, o2, aux, _ = step(p1, o1, mvars_r, batch, extras_r,
                                  jax.random.key(2))
        # partition evidence: the [2B, 3, P] imgs param must appear in the
        # compiled module at its per-device shape, and never at the global
        # shape (n>1)
        global_shape = f"f32[{bs2},3,{P}]"
        local_shape = f"f32[{bs2 // n},3,{P}]"
        sharded = (local_shape in hlo) and (n == 1 or global_shape not in hlo)
        out["n_devices"].append(n)
        out["flops_logical"].append(float(ca.get("flops", 0.0)))
        out["all_reduce"].append(len(re.findall(r"all-reduce(?:-start)?\(", hlo)))
        out["all_gather"].append(len(re.findall(r"all-gather(?:-start)?\(", hlo)))
        out["cache_size"].append(int(step._cache_size()))
        out["total_loss"].append(float(aux["total_loss"]))
        out["batch_sharded"].append(bool(sharded))
        print(f"n={n}: sharded={sharded} "
              f"all_reduce={out['all_reduce'][-1]} "
              f"cache={out['cache_size'][-1]} loss={out['total_loss'][-1]:.4f}",
              file=sys.stderr)

    out["ok"] = bool(
        all(out["batch_sharded"])
        and all(c == 1 for c in out["cache_size"])
        and out["all_reduce"][-1] > 0
        and all(abs(l - out["total_loss"][0]) < 2e-2 for l in out["total_loss"])
    )
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

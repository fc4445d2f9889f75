"""Training-throughput benchmark: all three recipe stage shapes on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Measured per stage (scripts/template.sh; reference scripts/template.sh:7-63):
  init : batch 256 line pairs x nsample 4 px x ndepth 128, no fine pass
  ft1  : nsample 6 (stage default), freeze_proj program
  ft2  : nsample 4 split 2 uniform + 2 active (4x unc-scored candidate
         pool, moda.py:1062) + fine importance pass + eikonal 0.1

For each stage we report rays/s, ms/step, TFLOP/s and MFU, with FLOPs
taken from XLA's cost analysis of the same program lowered with
use_pallas=False (cost analysis cannot see inside Pallas custom calls).
Matmul precision is pinned to the same value training uses
(moda_tpu.runtime.setup_jax) and recorded in the output.

vs_baseline: the reference publishes no throughput. The denominator is
the modeled 2xA100 figure documented in BASELINE.md "Baseline
denominator": 0.10 MFU x 312 TFLOP/s TF32 peak x 2048 rays / 1.39 TFLOP
per step = 4.6e4 rays/s.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 4.6e4  # see BASELINE.md "Baseline denominator"

# peak dense matmul TFLOP/s for the precision the MXU actually runs
# (bf16 multiply / f32 accumulate under jax "default" f32 matmul precision)
PEAK_TFLOPS = {
    "v5 lite": 197.0, "v5e": 197.0, "v5litepod": 197.0,
    "v4": 275.0, "v5p": 459.0, "v6e": 918.0, "v6 lite": 918.0,
}


def device_peak_tflops(dev) -> float | None:
    kind = getattr(dev, "device_kind", "").lower()
    for k, v in PEAK_TFLOPS.items():
        if k in kind:
            return v
    return None


def make_stage(name: str, use_pallas: bool | None = None):
    """Build (step_fn, args, rays_per_step) for one recipe stage shape."""
    import jax
    import jax.numpy as jnp

    from moda_tpu.config import DataInfo, MoDAConfig
    from moda_tpu.fields.model import MoDAModel
    from moda_tpu.train.optim import MoDAOptimizer
    from moda_tpu.train.step import StepExtras, make_train_step

    n_pairs = 256
    num_fr = 64
    common = dict(num_bones=25, img_size=512, ndepth=128, feat_ndepth_grid=20,
                  lineload=True)
    # use_unc only in ft2, exactly as the recipe trains (template.sh
    # stage 3 passes --use_unc; stages 1-2 leave the flag at its False
    # default — reference scripts/template.sh:21-63)
    if name == "init":
        cfg = MoDAConfig(nsample=4, eikonal_wt=0.001, **common)
        use_fine, ns_uniform, ns_active = False, 4, 0
    elif name == "ft1":
        cfg = MoDAConfig(nsample=6, freeze_proj=True, **common)
        use_fine, ns_uniform, ns_active = False, 6, 0
    elif name == "ft2":
        # trainer.get_step_fn split with nactive=0.5: 2 uniform + 2 active
        cfg = MoDAConfig(nsample=4, use_unc=True, eikonal_wt=0.1, **common)
        use_fine, ns_uniform, ns_active = True, 2, 2
    else:
        raise ValueError(name)
    if use_pallas is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, use_pallas=use_pallas)

    info = DataInfo(offset=(0, num_fr), intrinsics=((500.0, 500.0, 256.0, 256.0),))
    model = MoDAModel(cfg, info)
    params, mvars = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    P = cfg.img_size  # one pixel row per entry (lineload)
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

    opt = MoDAOptimizer(cfg, total_steps=24000)
    opt_state = opt.init(params)
    # dskin gating as trained: init measures mid-stage (progress 0.5 <
    # dskin_steps 0.8 -> delta-skin MLP off); ft1/ft2 pass --dskin_steps 0
    # (template.sh:42,58) -> on
    step = make_train_step(model, opt, nsample=ns_uniform, ndepth=cfg.ndepth,
                           use_fine=use_fine, use_dskin=(name != "init"),
                           use_bones=True,
                           nsample_active=ns_active, donate=True)
    extras = StepExtras(
        progress=jnp.asarray(0.5), loss_select=jnp.asarray(1),
        root_update=jnp.asarray(1.0), body_update=jnp.asarray(1.0),
        shape_update=jnp.asarray(0.0), cvf_update=jnp.asarray(0.0),
        sil_err_median=jnp.asarray(1e9),
        shape_samp=jnp.asarray(rng.normal(size=(1000, 3)).astype(np.float32) * 0.1),
        shape_samp_valid=jnp.asarray(1.0),
        embed_alpha=jnp.asarray(10.0),
    )
    rays_per_step = bs2 * (ns_uniform + ns_active)
    return step, (params, opt_state, mvars, batch, extras), rays_per_step


def stage_flops(name: str, key=None) -> float | None:
    """FLOPs/step from XLA's HLO cost analysis of the SAME stage program
    lowered with use_pallas=False: cost analysis cannot see inside a Pallas
    custom call, so the count comes from the mathematically identical pure
    XLA graph (lowered only — never compiled or run)."""
    import jax

    try:
        step, args, _ = make_stage(name, use_pallas=False)
        ca = step.lower(*args, jax.random.key(0)).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def all_stage_flops() -> dict:
    """Run stage_flops for every stage in a CPU subprocess: the remote-TPU
    (axon) client cannot run HLO cost analysis, and the pure-XLA lowering
    only needs tracing, which works anywhere."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import json, bench\n"
        "print('FLOPS=' + json.dumps({s: bench.stage_flops(s)"
        " for s in ('init','ft1','ft2')}))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=900,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in r.stdout.splitlines():
            if line.startswith("FLOPS="):
                return json.loads(line[len("FLOPS="):])
    except Exception:
        pass
    return {}


def bench_stage(name: str, n_steps: int = 50, profile_dir: str | None = None,
                flops: float | None = None):
    import jax

    step, (params, opt_state, mvars, batch, extras), rays_per_step = make_stage(name)
    key = jax.random.key(0)

    # warmup / compile (fetch a scalar: through the remote-TPU tunnel,
    # block_until_ready acks dispatch without waiting for execution, so
    # only a device->host value transfer proves the work ran)
    params, opt_state, aux, _ = step(params, opt_state, mvars, batch, extras, key)
    float(aux["total_loss"])

    def run(n):
        nonlocal params, opt_state, aux
        t0 = time.perf_counter()
        for i in range(n):
            params, opt_state, aux, _ = step(params, opt_state, mvars, batch,
                                             extras, jax.random.key(i + 1))
        float(aux["total_loss"])  # forces the whole chain + round-trip
        return time.perf_counter() - t0

    # difference two chain lengths to cancel the fixed round-trip latency
    n_small = max(n_steps // 10, 2)
    t_small = run(n_small)
    t_big = run(n_small + n_steps)
    dt = max(t_big - t_small, 1e-9)
    if profile_dir:
        try:
            with jax.profiler.trace(profile_dir):
                run(5)
        except Exception:
            profile_dir = None

    ms_per_step = dt / n_steps * 1e3
    rays_per_sec = rays_per_step * n_steps / dt
    peak = device_peak_tflops(jax.devices()[0])
    tflops = (flops / (dt / n_steps)) / 1e12 if flops else None
    out = {
        "rays_per_sec": round(rays_per_sec, 1),
        "ms_per_step": round(ms_per_step, 3),
        "gflop_per_step": round(flops / 1e9, 2) if flops else None,
        "tflops": round(tflops, 2) if tflops else None,
        "mfu": round(tflops / peak, 4) if (tflops and peak) else None,
        "rays_per_step": rays_per_step,
    }
    if profile_dir:
        out["profile"] = profile_dir
    return out


def check_tunnel() -> str | None:
    """The axon TPU tunnel relays through local ports served by a relay
    process that can die mid-session (its stdio pipe to the supervisor is
    the transport; see .claude/skills/verify/SKILL.md). A dead relay makes
    every device call block forever — fail fast and honestly instead."""
    if os.environ.get("JAX_PLATFORMS", "").lower() not in ("", "axon", "tpu"):
        return None
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return None
    import socket

    for port in (8082, 8083, 8087):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=5):
                return None  # something is listening: relay alive
        except OSError:
            continue
    return "axon tunnel relay is down (no listener on relay ports)"


def start_deadman(seconds: float) -> None:
    """Hard-exit if the bench wedges (e.g. tunnel dies mid-run): a hung
    bench is worse for the driver than a failed one."""
    import threading

    def boom():
        print(json.dumps({"metric": "train_rays_per_sec", "value": 0,
                          "unit": "rays/s", "vs_baseline": 0,
                          "error": f"bench deadman fired after {seconds}s"}),
              flush=True)
        os._exit(3)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()


def main():
    err = check_tunnel()
    if err:
        print(json.dumps({"metric": "train_rays_per_sec", "value": 0,
                          "unit": "rays/s", "vs_baseline": 0, "error": err}))
        raise SystemExit(2)
    start_deadman(float(os.environ.get("BENCH_DEADMAN_S", 2400)))

    from moda_tpu.runtime import setup_jax
    setup_jax()

    import jax

    detail = {
        "device": getattr(jax.devices()[0], "device_kind", str(jax.devices()[0])),
        "matmul_precision": str(jax.config.jax_default_matmul_precision),
        "peak_tflops": device_peak_tflops(jax.devices()[0]),
    }
    prof = os.environ.get("BENCH_PROFILE_DIR")  # set to capture a trace
    flops = all_stage_flops()
    for stage in ("init", "ft1", "ft2"):
        detail[stage] = bench_stage(stage, profile_dir=prof if stage == "init" else None,
                                    flops=flops.get(stage))

    headline = detail["init"]["rays_per_sec"]
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": headline,
        "unit": "rays/s",
        "vs_baseline": round(headline / BASELINE_RAYS_PER_SEC, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()

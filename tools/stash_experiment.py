"""Measured remat-vs-stash experiment for the fused trunk backward
(VERDICT r4 #4a: "the inherent remat floor is argued, not measured").

Times the bench.py stage programs (full train step) and the isolated
coarse+feat fused launch (fwd+bwd) under:
  A) default: backward rematerializes activations in VMEM;
  B) MODA_PALLAS_STASH=1: forward writes the bf16 activation stack to
     HBM, backward reads it (no recompute).

Each mode runs in a SUBPROCESS so the env var is set before any jit
trace. Emits one JSON line per measurement and a summary; write to
logdir/stash-experiment.json for the BASELINE.md section.

  python tools/stash_experiment.py [--stages init ft2] [--steps 30]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, ".")
from moda_tpu.runtime import setup_jax
setup_jax()
import jax
import jax.numpy as jnp
import numpy as np

mode = os.environ.get("MODA_PALLAS_STASH", "0")
what = sys.argv[1]
n_steps = int(sys.argv[2])

if what == "launch":
    # isolated coarse+feat fused launch at the recipe bundle shape:
    # 2048 rays x 128 samples, trunk D8/W256 + feat D5/W128, in-kernel
    # embed, env_code on the dir branch (bench.py ft2's hot launch)
    from moda_tpu.config import DataInfo, MoDAConfig
    from moda_tpu.fields.model import MoDAModel
    cfg = MoDAConfig(num_bones=25, img_size=512, lineload=True)
    info = DataInfo(offset=(0, 64), intrinsics=((500.0, 500.0, 256.0, 256.0),))
    model = MoDAModel(cfg, info)
    params, _ = model.init(jax.random.key(0))
    R, S = 2048, 128
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(R, S, 3)).astype(np.float32) * 0.1)
    code_dir = jnp.asarray(rng.normal(size=(R, 27 + 64)).astype(np.float32))

    def f(params, xyz, code_dir):
        out, feat = model.apply_coarse_feat(params, xyz, code_dir=code_dir,
                                            embed_raw=True, embed_alpha=None)
        return (out ** 2).sum() + (feat ** 2).sum()

    g = jax.jit(jax.grad(f))
    r = g(params, xyz, code_dir)
    jax.tree_util.tree_leaves(r)[0].block_until_ready()
    def run(n):
        t0 = time.perf_counter()
        r = None
        for i in range(n):
            r = g(params, xyz, code_dir)
        float(jax.tree_util.tree_leaves(r)[0].sum())
        return time.perf_counter() - t0
    t_small = run(max(n_steps // 10, 2))
    t_big = run(max(n_steps // 10, 2) + n_steps)
    ms = (t_big - t_small) / n_steps * 1e3
    print(json.dumps({"what": "launch", "stash": mode, "ms": round(ms, 3)}))
else:
    import bench
    out = bench.bench_stage(what, n_steps=n_steps)
    print(json.dumps({"what": what, "stash": mode,
                      "ms": out["ms_per_step"],
                      "rays_per_sec": out["rays_per_sec"]}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", nargs="*", default=["launch", "init", "ft2"])
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    results = []
    for what in args.stages:
        for stash in ("0", "1"):
            env = dict(os.environ, MODA_PALLAS_STASH=stash)
            r = subprocess.run([sys.executable, "-c", WORKER, what,
                                str(args.steps)],
                               capture_output=True, text=True, timeout=3600,
                               env=env, cwd=os.path.dirname(
                                   os.path.dirname(os.path.abspath(__file__))))
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if line:
                d = json.loads(line[-1])
                results.append(d)
                print(json.dumps(d), flush=True)
            else:
                print(json.dumps({"what": what, "stash": stash,
                                  "error": r.stderr[-500:]}), flush=True)
    summary = {}
    for what in args.stages:
        a = next((r["ms"] for r in results
                  if r["what"] == what and r["stash"] == "0"), None)
        b = next((r["ms"] for r in results
                  if r["what"] == what and r["stash"] == "1"), None)
        if a and b:
            summary[what] = {"remat_ms": a, "stash_ms": b,
                             "stash_speedup": round(a / b, 3)}
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()

"""Block-size / variant sweep for the fused MLP Pallas kernels on real TPU.

The round-3 trace attributes ~19.5 ms/step to the backward kernels and
~4.8-6 ms to the forwards (tools/profile_breakdown.py, by-source view).
This sweeps block_points / block_points_bwd per call-site shape to find
the sequencing-overhead sweet spot (bigger blocks = fewer, larger MXU
ops, bounded by VMEM).

  python tools/bench_fused_mlp.py            # sweep all call sites
  python tools/bench_fused_mlp.py --site trunk
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


# (name, D, W, in_x, ct, cd, R, S, out_ch) at the stage-1 recipe bundle:
# R = 2*batch*nsample = 2048 rays, S = ndepth = 128 samples
SITES = {
    "trunk": dict(D=8, W=256, in_x=63, ct=0, cd=91, R=2048, S=128, out=3),
    "feat":  dict(D=5, W=128, in_x=63, ct=0, cd=0, R=2048, S=128, out=16),
    "vis":   dict(D=5, W=64, in_x=63, ct=0, cd=0, R=2048, S=128, out=1),
    "skin":  dict(D=5, W=64, in_x=63, ct=64, cd=0, R=2048, S=128, out=25),
}


def site_params(key, D, W, in_x, ct, cd, out):
    import jax
    import jax.numpy as jnp

    from moda_tpu.fields import nets

    mod = nets.NeRFMLP(D=D, W=W, in_channels_xyz=in_x + ct, in_channels_dir=cd,
                       out_channels=out, raw_feat=True, skips=(4,) if D > 4 else (2,))
    x = jnp.zeros((1, in_x + ct))
    d = jnp.zeros((1, cd)) if cd else None
    p = mod.init(key, jnp.concatenate([x, d], -1) if cd else x)["params"]
    return mod, p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--site", default=None)
    ap.add_argument("--blocks", default="512,768,1024,1536,2048,3072")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--R", type=int, default=0, help="override ray count")
    args = ap.parse_args()

    from moda_tpu.runtime import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    from moda_tpu.ops.fused_mlp import nerf_mlp_pallas

    blocks = [int(b) for b in args.blocks.split(",")]
    names = [args.site] if args.site else list(SITES)
    for name in names:
        s = SITES[name]
        mod, p = site_params(jax.random.key(0), s["D"], s["W"], s["in_x"],
                             s["ct"], s["cd"], s["out"])
        R, S = (args.R or s["R"]), s["S"]
        x = jax.random.normal(jax.random.key(1), (R, S, s["in_x"]))
        ct = (jax.random.normal(jax.random.key(2), (R, s["ct"]))
              if s["ct"] else None)
        cd = (jax.random.normal(jax.random.key(3), (R, s["cd"]))
              if s["cd"] else None)

        for bp in blocks:
            for bpb in {min(bp, 768), bp}:
                def f(x, ct, cd, p, bp=bp, bpb=bpb):
                    out = nerf_mlp_pallas(
                        p, x, D=s["D"], in_xyz=s["in_x"] + s["ct"],
                        in_dir=s["cd"], skips=mod.skips, raw_feat=True,
                        code_trunk=ct, code_dir=cd, samples_per_ray=S,
                        block_points=bp, block_points_bwd=bpb)
                    return (out ** 2).sum()

                grad = jax.jit(jax.grad(f, argnums=(0, 3)))
                fwd = jax.jit(f)
                try:
                    v = fwd(x, ct, cd, p); float(v)
                    g = grad(x, ct, cd, p)
                    jax.block_until_ready(g)
                except Exception as e:
                    print(f"{name} bp={bp} bpb={bpb}: FAIL {str(e)[:90]}")
                    continue

                def run(fn, n, fetch):
                    t0 = time.perf_counter()
                    for _ in range(n):
                        r = fn(x, ct, cd, p)
                    fetch(r)
                    return time.perf_counter() - t0

                fetch_f = lambda r: float(r)
                fetch_g = lambda r: float(jnp.ravel(r[1]["xyz_1"]["bias"])[0])
                n = args.iters
                tf = (run(fwd, n + 10, fetch_f) - run(fwd, 10, fetch_f)) / n
                tg = (run(grad, n + 10, fetch_g) - run(grad, 10, fetch_g)) / n
                print(f"{name:6s} bp={bp:5d} bpb={bpb:5d}: "
                      f"fwd {tf * 1e3:7.3f} ms  fwd+bwd {tg * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()

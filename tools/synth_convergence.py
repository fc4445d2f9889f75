"""End-to-end quality gate: train on the analytic synthetic scene (TPU)
and measure reconstruction quality against exact ground truth.

This is the role of the reference's synthetic eagle/hands fixture
(scripts/synthetic/render_synthetic.py + run_eval.sh's gt_pmat=canonical
mode): a self-contained scene with exact cameras/flow where the full
optimization must produce a correct canonical shape.

Run: python tools/synth_convergence.py [--epochs N] [--img_size S]
Reports the loss trajectory and the chamfer distance between the
extracted canonical mesh and the GT canonical ellipsoid surface.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from moda_tpu.runtime import setup_jax
    setup_jax()

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--img_size", type=int, default=64)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--n_pairs", type=int, default=16)
    ap.add_argument("--nsample", type=int, default=16)
    ap.add_argument("--ndepth", type=int, default=64)
    ap.add_argument("--out", type=str, default="logdir/synth-conv")
    ap.add_argument("--assert_chamfer", type=float, default=0.0,
                    help="exit non-zero unless chamfer_vs_gt <= this "
                         "(0 = report only); makes the gate a hard check")
    args = ap.parse_args()

    import jax.numpy as jnp

    from moda_tpu.config import DataInfo, MoDAConfig
    from moda_tpu.data.synthetic import SynthScene
    from moda_tpu.evals.ama import eval_pair
    from moda_tpu.extract.mesh import Mesh
    from moda_tpu.train.trainer import Trainer
    from tests.test_trainer import SynthLoader

    scene = SynthScene(img_size=args.img_size, num_frames=args.num_frames)
    cfg = MoDAConfig(
        num_bones=8, img_size=args.img_size, nsample=args.nsample,
        ndepth=args.ndepth, num_epochs=args.epochs, feat_ndepth_grid=12,
        use_cam=True, logname="synth-conv", eikonal_wt=0.0,
        warmup_shape_ep=1, sample_grid3d=64,
        # cameras are known (GT) -> no flow-only root warmup alternation,
        # matching the reference's known-camera stages (template.sh ft1/ft2
        # set --warmup_steps 0)
        warmup_steps=0.0,
        # synthetic flows/grads run larger than real footage; the default
        # rollback threshold (1*clip_scale, train_utils.py:971) would
        # trigger on the normal regime here
        clip_scale=100.0,
    )
    f = scene.focal * args.img_size / 2
    info = DataInfo(offset=(0, args.num_frames),
                    intrinsics=((f, f, args.img_size / 2, args.img_size / 2),))
    loader = SynthLoader(scene, n_pairs=args.n_pairs)
    tr = Trainer(cfg, info, loader=loader, save_dir=args.out)
    rtk = np.stack([scene.render_frame(i)["rtk"] for i in range(args.num_frames)])
    rtk4 = np.tile(np.eye(4, dtype=np.float32)[None], (args.num_frames, 1, 1))
    rtk4[:, :3] = rtk[:, :3]
    rtk4[:, 3] = rtk[:, 3]
    rtk4[:, :3, 3] /= tr.model.obj_scale
    tr.set_cameras_from_rtk_files(rtk4)

    t0 = time.time()
    tr.train()
    dt = time.time() - t0

    rows = [json.loads(l) for l in open(tr.log_path)]
    img = [r["img_loss"] for r in rows if "img_loss" in r]
    sil = [r["sil_loss"] for r in rows if "sil_loss" in r]

    # GT canonical surface: ellipsoid of radius scene.radius at t giving
    # scales(t)... canonical space has unit scales -> sphere r=scene.radius,
    # but object coords are normalized by obj_scale in the model space.
    pred = tr.mesh_rest
    gt_pts = np.random.default_rng(0).normal(size=(5000, 3))
    gt_pts = gt_pts / np.linalg.norm(gt_pts, axis=-1, keepdims=True) * scene.radius
    gt_pts = gt_pts / tr.model.obj_scale  # model-space normalization
    gt = Mesh(vertices=gt_pts.astype(np.float32) * tr.model.obj_scale,
              faces=np.zeros((0, 3), np.int32))

    report = {
        "epochs": args.epochs,
        "train_time_s": round(dt, 1),
        "img_loss_first": float(np.mean(img[:3])) if img else None,
        "img_loss_last": float(np.mean(img[-3:])) if img else None,
        "sil_loss_first": float(np.mean(sil[:3])) if sil else None,
        "sil_loss_last": float(np.mean(sil[-3:])) if sil else None,
        "mesh_verts": len(pred.vertices),
    }
    if len(pred.vertices) > 100:
        # chamfer between predicted surface (model units scaled back) and GT
        from moda_tpu.ops.chamfer import chamfer_distance
        import jax.numpy as jnp
        pv = pred.vertices * tr.model.obj_scale
        d1, d2, _, _ = chamfer_distance(jnp.asarray(pv), jnp.asarray(gt.vertices))
        cd = float((np.sqrt(np.asarray(d1)).mean() + np.sqrt(np.asarray(d2)).mean()) / 2)
        report["chamfer_vs_gt"] = cd
        report["gt_radius"] = scene.radius
    print(json.dumps(report, indent=2))
    if args.assert_chamfer > 0:
        cd = report.get("chamfer_vs_gt")
        if cd is None or cd > args.assert_chamfer:
            print(f"FAIL: chamfer {cd} > threshold {args.assert_chamfer} "
                  f"(or no mesh extracted)")
            sys.exit(1)
        print(f"PASS: chamfer {cd} <= {args.assert_chamfer}")


if __name__ == "__main__":
    main()

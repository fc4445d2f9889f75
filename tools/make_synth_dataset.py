"""Export a synthetic scene as an on-disk DAVIS-layout dataset.

The artifact-producing role of scripts/synthetic/render_synthetic.py:
JPEGImages/Annotations/FlowFW_d/Densepose + Cameras (GT rtk txt) + GT
meshes + configs/<seq>.config, so the standard CLI pipeline
(train_app -> extract_app -> eval) runs on exact-GT data.

Two scenes:
  --scene blob  analytic deforming ellipsoid (data/synthetic.py) — cheap,
                used by unit tests
  --scene mesh  articulated flapping creature (data/synth_mesh.py) — the
                quantitative fixture, equivalent of the reference's
                eagle/hands sequences (GT camera-space meshes like
                render_synthetic.py:127-129)

  python tools/make_synth_dataset.py --out database/DAVIS --seqname a-flap \
      --scene mesh --img_size 256 --num_frames 48 --lines
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="database/DAVIS")
    ap.add_argument("--seqname", default="a-ellipse")
    ap.add_argument("--scene", default="blob", choices=("blob", "mesh"))
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--config_dir", default="configs")
    ap.add_argument("--lines", action="store_true",
                    help="also write img2lines Pixels shards for --lineload")
    args = ap.parse_args()

    import cv2

    from moda_tpu.data.pfm import write_pfm
    from moda_tpu.extract.mesh import Mesh
    from moda_tpu.preproc.pipeline import write_config

    if args.scene == "mesh":
        from moda_tpu.data.synth_mesh import MeshScene
        scene = MeshScene(img_size=args.img_size, num_frames=args.num_frames)
    else:
        from moda_tpu.data.synthetic import SynthScene
        scene = SynthScene(img_size=args.img_size, num_frames=args.num_frames)
    seq = args.seqname
    root = args.out
    img_dir = os.path.join(root, "JPEGImages", "Full-Resolution", seq)
    ann_dir = os.path.join(root, "Annotations", "Full-Resolution", seq)
    cam_dir = os.path.join(root, "Cameras", "Full-Resolution", seq)
    dp_dir = os.path.join(root, "Densepose", "Full-Resolution", seq)
    mesh_dir = os.path.join(root, "Meshes", "Full-Resolution", seq)
    for d in (img_dir, ann_dir, cam_dir, dp_dir, mesh_dir):
        os.makedirs(d, exist_ok=True)

    frames = [scene.render_frame(i) for i in range(args.num_frames)]
    S = args.img_size

    # canonical template prior with per-vertex surface embeddings — the
    # fixture's analogue of the reference's mesh_material CSE template
    # (moda.py:405-445 + cselib mesh_vertex_embeddings). Consumed via
    # --prior_mesh_path by the pose-CNN warmup (no-prior route).
    if hasattr(scene, "rest_verts"):
        import pickle
        prior = {"vertices": scene.rest_verts, "faces": scene.faces,
                 "embeddings": scene.vert_feats}
        with open(os.path.join(dp_dir, "prior.pkl"), "wb") as fpk:
            pickle.dump(prior, fpk)
    for i, f in enumerate(frames):
        cv2.imwrite(os.path.join(img_dir, "%05d.jpg" % i),
                    (f["img"][..., ::-1] * 255).astype(np.uint8))
        cv2.imwrite(os.path.join(ann_dir, "%05d.png" % i),
                    (f["mask"] * 128).astype(np.uint8))
        np.savetxt(os.path.join(cam_dir, "%05d.txt" % i), f["rtk"])
        # CSE-style artifacts from the analytic features. The 112x112 feat
        # pfm is a TIGHT object-bbox crop, exactly like the reference's
        # compute_dp.py output (the detection-box crop): the pose CNN both
        # trains on and consumes bbox crops (render_pose_batch), and
        # resample_dp_np maps the crop back through dp_bbox [x0,y0,x1,y1].
        # Writing the full frame here put extract_cams_cnn's inputs far
        # outside the CNN's training distribution (round-5 forensics:
        # near-constant pose predictions, spin-gauge collapse).
        ys, xs = np.where(f["mask"] > 0)
        if len(xs) >= 4:
            bx0, bx1 = int(xs.min()), int(xs.max()) + 1
            by0, by1 = int(ys.min()), int(ys.max()) + 1
        else:
            bx0, by0, bx1, by1 = 0, 0, S, S
        feat112 = cv2.resize(f["feat"][by0:by1, bx0:bx1],
                             (112, 112)).transpose(2, 0, 1)
        write_pfm(os.path.join(dp_dir, "feat-%05d.pfm" % i),
                  feat112.reshape(16 * 112, 112))
        np.savetxt(os.path.join(dp_dir, "bbox-%05d.txt" % i),
                   np.asarray([bx0, by0, bx1, by1], np.float32))
        write_pfm(os.path.join(dp_dir, "%05d.pfm" % i),
                  np.zeros((S, S), np.float32))

    # GT flow at all dframes used by the loader
    for d in (1, 2, 4, 8):
        fw_dir = os.path.join(root, f"FlowFW_{d}", "Full-Resolution", seq)
        bw_dir = os.path.join(root, f"FlowBW_{d}", "Full-Resolution", seq)
        os.makedirs(fw_dir, exist_ok=True)
        os.makedirs(bw_dir, exist_ok=True)
        for i in range(0, args.num_frames - d):
            if i % d != 0:
                continue
            flo_fw = scene.flow_between(frames[i], frames[i + d], i + d) * S / 2.0
            flo_bw = scene.flow_between(frames[i + d], frames[i], i) * S / 2.0
            occ_fw = frames[i]["mask"].astype(np.float32)
            occ_bw = frames[i + d]["mask"].astype(np.float32)
            write_pfm(os.path.join(fw_dir, "flo-%05d.pfm" % i),
                      np.concatenate([flo_fw, np.zeros_like(flo_fw[..., :1])], -1))
            write_pfm(os.path.join(fw_dir, "occ-%05d.pfm" % i), occ_fw)
            write_pfm(os.path.join(bw_dir, "flo-%05d.pfm" % (i + d)),
                      np.concatenate([flo_bw, np.zeros_like(flo_bw[..., :1])], -1))
            write_pfm(os.path.join(bw_dir, "occ-%05d.pfm" % (i + d)), occ_bw)

    # GT meshes per frame, camera space (render_synthetic.py:127-129)
    if args.scene == "mesh":
        for i in range(args.num_frames):
            v, fc = scene.gt_mesh_cam(i)
            Mesh(v, fc).export_obj(os.path.join(mesh_dir, "mesh-%05d.obj" % i))
        v, fc = scene.gt_mesh_rest()
        Mesh(v, fc).export_obj(os.path.join(mesh_dir, "mesh-rest.obj"))
    else:
        from moda_tpu.native import marching_cubes
        n = 64
        half = 1.5 * scene.radius
        lin = np.linspace(-half, half, n).astype(np.float32)
        grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
        for i in range(args.num_frames):
            t = i / max(args.num_frames - 1, 1)
            sdf = -scene.sdf(grid.reshape(-1, 3), t).reshape(n, n, n)
            v, f_ = marching_cubes(sdf.astype(np.float32), 0.0)
            v = (v - n / 2.0) / n * 2.0 * half
            Mesh(v.astype(np.float32), f_).export_obj(
                os.path.join(mesh_dir, "mesh-%05d.obj" % i))

    fpx = scene.focal * S / 2
    write_config(args.config_dir, seq, img_dir, (S, S))
    # overwrite ks with the exact synthetic intrinsics
    cfgp = os.path.join(args.config_dir, f"{seq}.config")
    txt = open(cfgp).read().replace(
        f"ks = {S} {S} {S/2} {S/2}", f"ks = {fpx} {fpx} {S/2} {S/2}")
    with open(cfgp, "w") as fo:
        fo.write(txt)

    if args.lines:
        from moda_tpu.data.dataset import build_datasets
        from moda_tpu.preproc.pipeline import write_lines
        ds = build_datasets(seq, img_size=S, config_dir=args.config_dir)
        write_lines(root, seq, S, ds)
        print(f"wrote Pixels line shards for '{seq}'")
    print(f"wrote {args.num_frames} frames of '{seq}' under {root}")


if __name__ == "__main__":
    main()

"""Marching-cube resolution floor for the synthetic-fixture mesh eval.

The fixture F@1% numbers (logdir/*-eval.json) are only interpretable
against the best score the extraction pipeline could POSSIBLY produce at
its grid resolution: re-mesh the GROUND-TRUTH surface itself through the
same volumetric route (SDF sampled on the extraction grid -> marching
cubes -> eval_pair protocol, evals/ama.py:27-60 == reference
render_vis.py:382-416) and score it against the GT mesh. Everything the
trained model loses beyond this is model/registration error; the floor
itself is voxelization error (VERDICT r3 weak #7).

GT SDF: dense surface sampling with face normals + KD-tree nearest
neighbor; sign = dot(p - q_nn, n_nn). Exact away from edges, which is
all marching cubes needs at 1/128 voxel scale.

  python tools/mc_floor.py [--grid 128] [--frames 0,12,24,36,47]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, ".")

from moda_tpu.data.synth_mesh import MeshScene  # noqa: E402
from moda_tpu.evals.ama import eval_pair  # noqa: E402
from moda_tpu.extract.mesh import Mesh  # noqa: E402
from moda_tpu.native import marching_cubes  # noqa: E402


def surface_samples_with_normals(verts: np.ndarray, faces: np.ndarray,
                                 n: int, seed: int = 0):
    """Area-weighted surface samples + their face normals."""
    rng = np.random.default_rng(seed)
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    cross = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(cross, axis=-1)
    nrm = cross / np.maximum(np.linalg.norm(cross, axis=-1, keepdims=True), 1e-12)
    fidx = rng.choice(len(faces), size=n, p=area / area.sum())
    r1, r2 = rng.random((2, n, 1))
    su = np.sqrt(r1)
    pts = (1 - su) * v0[fidx] + su * (1 - r2) * v1[fidx] + su * r2 * v2[fidx]
    return pts.astype(np.float32), nrm[fidx].astype(np.float32)


def mesh_sdf_grid(verts: np.ndarray, faces: np.ndarray, grid: int,
                  bound: np.ndarray, n_surf: int = 200_000) -> np.ndarray:
    pts, nrm = surface_samples_with_normals(verts, faces, n_surf)
    tree = cKDTree(pts)
    axes = [np.linspace(-bound[i], bound[i], grid, dtype=np.float32)
            for i in range(3)]
    q = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    dist, idx = tree.query(q, workers=-1)
    sign = np.sign(np.einsum("ij,ij->i", q - pts[idx], nrm[idx]))
    return (dist * np.where(sign == 0, 1.0, sign)).reshape(grid, grid, grid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--frames", default="0,12,24,36,47")
    ap.add_argument("--num_frames", type=int, default=48)
    args = ap.parse_args()

    scene = MeshScene(img_size=256, num_frames=args.num_frames)
    rows = []
    for i in (int(f) for f in args.frames.split(",")):
        t = i / max(args.num_frames - 1, 1)
        verts = scene.posed_verts(t).astype(np.float32)
        faces = np.asarray(scene.faces, np.int32)
        gt = Mesh(verts, faces)
        # same grid convention as extract_mesh (extract/mesh.py:113-127):
        # symmetric bound, voxel->object via (v - G/2)/G * 2 * bound
        bound = np.abs(verts).max(0) * 1.1
        sdf = mesh_sdf_grid(verts, faces, args.grid, bound)
        v, f = marching_cubes((-sdf).astype(np.float32), 0.0)
        v = (v - args.grid / 2.0) / args.grid * 2.0 * bound[None, :]
        remeshed = Mesh(v.astype(np.float32), f)
        r = eval_pair(remeshed, gt)
        r["frame"] = i
        rows.append(r)

    out = {"grid": args.grid,
           "chamfer_ave": float(np.mean([r["chamfer"] for r in rows]))}
    for pct in (1, 2, 5):
        out[f"f@{pct}%_ave"] = float(np.mean([r[f"f@{pct}%"] for r in rows]))
        out[f"f@{pct}%_min"] = float(min(r[f"f@{pct}%"] for r in rows))
    out["per_frame"] = rows
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

"""AMA mesh-accuracy evaluation: ICP-aligned chamfer + F-scores.

The quantitative protocol of scripts/visualize/render_vis.py:382-425 and
513-525: per frame, ICP-align the predicted mesh to GT (both pre-centered
and depth-normalized), then report bidirectional Chamfer distance (cm) and
F-score at thresholds (1%, 2%, 5% of the GT bbox max edge)^2.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from moda_tpu.extract.mesh import Mesh
from moda_tpu.evals.icp import icp_align
from moda_tpu.ops.chamfer import chamfer_distance, fscore


def sample_surface(mesh: Mesh, n: int, seed: int = 0) -> np.ndarray:
    from moda_tpu.train.trainer import sample_mesh_points
    return sample_mesh_points(mesh, n, np.random.default_rng(seed))


def eval_pair(pred: Mesh, gt: Mesh, n_sample: int = 10000, use_icp: bool = True
              ) -> Dict[str, float]:
    """Single-frame mesh accuracy (render_vis.py:382-416)."""
    p = sample_surface(pred, n_sample, 0)
    g = sample_surface(gt, n_sample, 1)

    # center + scale normalization by gt depth extent (render_vis.py:371-381)
    g_center = gt.vertices.mean(0)
    p = p - pred.vertices.mean(0)
    g = g - g_center
    # median-extent scale fit before ICP (render_vis.py:387-388 fits the
    # median camera depth; centered meshes use the median radius, which
    # removes the canonical-unit vs world-unit mismatch the same way)
    fitted_scale = (np.median(np.linalg.norm(g, axis=-1))
                    / max(np.median(np.linalg.norm(p, axis=-1)), 1e-12))
    p = p * fitted_scale
    bbox = gt.vertices.max(0) - gt.vertices.min(0)
    max_edge = float(bbox.max())

    if use_icp:
        R, t = icp_align(jnp.asarray(p), jnp.asarray(g), iters=20)
        p = np.asarray(jnp.asarray(p) @ jnp.asarray(R).T + jnp.asarray(t))

    d1, d2, _, _ = chamfer_distance(jnp.asarray(p), jnp.asarray(g))
    d1, d2 = np.asarray(d1), np.asarray(d2)
    # raw distances (not squared) averaged both ways, in input units
    cd = float(np.sqrt(d1).mean() + np.sqrt(d2).mean()) / 2.0

    out = {"chamfer": cd, "max_edge": max_edge}
    for pct in (1, 2, 5):
        tau = (max_edge * pct / 100.0) ** 2
        f, _, _ = fscore(jnp.asarray(d1), jnp.asarray(d2), tau)
        out[f"f@{pct}%"] = float(f)
    return out


def eval_sequence(preds: List[Mesh], gts: List[Mesh], n_sample: int = 10000
                  ) -> Dict[str, float]:
    """Sequence summary: ave/max chamfer, ave/min F-scores
    (render_vis.py:513-525)."""
    rows = [eval_pair(p, g, n_sample) for p, g in zip(preds, gts)]
    cds = np.asarray([r["chamfer"] for r in rows])
    out = {"chamfer_ave": float(cds.mean()), "chamfer_max": float(cds.max())}
    for pct in (1, 2, 5):
        fs = np.asarray([r[f"f@{pct}%"] for r in rows])
        out[f"f@{pct}%_ave"] = float(fs.mean())
        out[f"f@{pct}%_min"] = float(fs.min())
    return out

"""Converted-checkpoint npz IO + predictor loaders, shared by
tools/convert_all_checkpoints.py (the conversion side) and
cli/preproc_app.py (the consumption side).

Format: one flat .npz whose keys are '/'-joined paths into the nested
param dict (vcn_rob.npz: {params, mean}; pointrend.npz: the param tree;
cse.npz: {backbone, head[, vertex_embeddings]}).
"""
from __future__ import annotations

import numpy as np


def flatten_tree(tree, prefix: str = "") -> dict:
    out: dict = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return tree


def save_pytree_npz(path: str, tree) -> None:
    np.savez(path, **flatten_tree(tree))


def load_pytree_npz(path: str) -> dict:
    with np.load(path) as z:
        return unflatten_tree({k: z[k] for k in z.files})


def load_vcn_predictor(npz_path: str):
    from moda_tpu.preproc.vcn_flow import VCNFlowPredictor
    t = load_pytree_npz(npz_path)
    return VCNFlowPredictor(t["params"], mean=t["mean"])


def load_pointrend_predictor(npz_path: str, **kw):
    from moda_tpu.preproc.pointrend_infer import PointRendPredictor
    return PointRendPredictor(load_pytree_npz(npz_path), **kw)


def load_cse_predictor(npz_path: str, **kw):
    from moda_tpu.preproc.cse_infer import CSEPredictor
    t = load_pytree_npz(npz_path)
    return CSEPredictor(t["backbone"], t["head"],
                        vertex_embeddings=t.get("vertex_embeddings"), **kw)

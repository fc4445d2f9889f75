"""Checkpoint save/load with the reference's size-mismatch surgery.

Equivalent of train_utils.py:292-391 (save_network / load_network):
- params + opt state saved as a flat npz pytree (msgpack-free, no orbax
  dependency on async machinery for these small models);
- host-side latest_vars saved as a pickle-free npz sidecar;
- on load into a model with a different number of frames/videos, all
  video-specific entries (near_far, codes, root/body bases, ks) are
  dropped so fine-tuning across datasets works (train_utils.py:330-359);
- bone-count mismatch drops bones/skin/body heads (train_utils.py:361-366).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

VIDEO_SPECIFIC = (
    "pose_code", "env_code", "appearance_code", "vid_code",
    "nerf_root_rts", "root_code", "ks_param",
)
BONE_SPECIFIC = ("bones", "nerf_body_rts", "nerf_skin", "nerf_dis")


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_checkpoint(path: str, params, latest_vars: Dict[str, Any],
                    mvars_dict: Dict[str, np.ndarray], meta: Optional[Dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # one batched device->host transfer for the whole pytree: per-leaf
    # np.asarray pays a tunnel round-trip per array (5+ s/epoch measured)
    flat = _flatten(jax.device_get(params))
    np.savez(path + ".params.npz", **flat)
    lv = {k: np.asarray(v) for k, v in latest_vars.items()
          if isinstance(v, np.ndarray) or np.isscalar(v)}
    np.savez(path + ".vars.npz", **lv)
    np.savez(path + ".mvars.npz", **mvars_dict)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def copy_checkpoint(src: str, dst: str):
    """Duplicate a just-written checkpoint under another tag (the epoch loop
    saves 'latest' + str(epoch+1) with identical contents every epoch,
    train_utils.py:728-729 — a file copy skips the second device fetch)."""
    import shutil
    for suffix in (".params.npz", ".vars.npz", ".mvars.npz", ".meta.json"):
        if os.path.exists(src + suffix):
            shutil.copyfile(src + suffix, dst + suffix)


def load_checkpoint(path: str):
    params = _unflatten(dict(np.load(path + ".params.npz")))
    latest_vars = dict(np.load(path + ".vars.npz"))
    mvars_dict = dict(np.load(path + ".mvars.npz"))
    meta = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return params, latest_vars, mvars_dict, meta


def merge_params(init_params, loaded_params, num_fr_match: bool, num_bones_match: bool):
    """Graft loaded params onto freshly-initialized ones, dropping entries
    that cannot transfer (the reference's del_key surgery)."""
    out = dict(init_params)
    for k, v in loaded_params.items():
        if k not in out:
            continue
        if not num_fr_match and k in VIDEO_SPECIFIC:
            continue
        if not num_bones_match and k in BONE_SPECIFIC:
            continue
        # leaf-shape compatibility check
        init_flat = _flatten(out[k])
        load_flat = _flatten(v)
        if set(init_flat) != set(load_flat):
            continue
        if any(init_flat[n].shape != load_flat[n].shape for n in init_flat):
            continue
        out[k] = jax.tree_util.tree_map(jnp.asarray, v)
    return out

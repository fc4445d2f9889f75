"""Optimizer: AdamW with per-group LR multipliers, OneCycle schedule,
per-group gradient clipping, freeze masks and NaN-step rejection.

Functional redesign of train_utils.py:148-291 (22 param groups + OneCycleLR
with per-group max LRs) and train_utils.py:1154-1311 (clip_grad: per-group
clip norms, indicator-driven grad zeroing, NaN-grad step rejection).

Param-group mapping: our param pytree is keyed at the top level by
component name, so the reference's name-substring matching collapses to a
dict lookup. rest_pose_code shares the pose_code group; nerf_flowfw shares
nerf_flowbw's (same as the reference's substring rules).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

Params = Dict[str, Any]

# group -> (lr multiplier, clip multiplier) ; clip scale multiplies cfg.clip_scale
# (train_utils.py:261-290 LR table; 1282-1306 clip table)
GROUP_TABLE: Dict[str, Tuple[float, float]] = {
    "nerf_coarse": (1.0, 1.0),
    "nerf_beta": (1.0, 1.0),
    "nerf_feat": (1.0, 0.1),
    "nerf_beta_feat": (10.0, 0.1),
    "nerf_fine": (1.0, 0.1),
    "nerf_unc": (1.0, 0.1),
    "nerf_flowbw": (1.0, 0.1),
    "nerf_flowfw": (1.0, 0.1),
    "nerf_skin": (1.0, 0.1),
    "nerf_dis": (1.0, 0.1),
    "nerf_vis": (1.0, 0.1),
    "nerf_root_rts": (1.0, 100.0),  # lr mult is root-basis dependent; expmlp=1
    "nerf_body_rts": (1.0, 100.0),
    "root_code": (1.0, 0.1),
    "pose_code": (1.0, 100.0),
    "rest_pose_code": (1.0, 100.0),
    "env_code": (1.0, 0.1),
    "appearance_code": (1.0, 0.1),
    "vid_code": (1.0, 0.1),
    "bones": (1.0, 1.0),
    "skin_aux": (10.0, 0.1),
    "ks_param": (10.0, 0.1),
    "nerf_dp": (1.0, 0.1),
    "csenet": (1.0, 0.1),
}

ROOT_BASIS_LR = {"exp": 10.0, "cnn": 0.2, "mlp": 1.0, "expmlp": 1.0}


def lr_mult_for(group: str, root_basis: str) -> float:
    mult = GROUP_TABLE.get(group, (1.0, 1.0))[0]
    if group in ("nerf_root_rts", "root_code"):
        mult *= ROOT_BASIS_LR[root_basis]
    return mult


def onecycle_lr(base_lr: float, total_steps: int, num_epochs: int):
    """OneCycleLR equivalent: warmup max/25 -> max over pct_start, then
    linear anneal max -> max/5 (div_factor=25, final_div_factor=1/5,
    train_utils.py:261-290)."""
    pct_start = 2.0 / max(num_epochs, 1)
    warmup = max(int(total_steps * pct_start), 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up = base_lr / 25.0 + (base_lr - base_lr / 25.0) * (step / warmup)
        frac = jnp.clip((step - warmup) / jnp.maximum(total_steps - warmup, 1), 0.0, 1.0)
        down = base_lr + (base_lr / 5.0 - base_lr) * frac
        return jnp.where(step < warmup, up, down)

    return sched


class OptState(NamedTuple):
    count: jnp.ndarray
    adam: optax.ScaleByAdamState


class MoDAOptimizer:
    """AdamW(beta 0.9/0.999, wd 1e-4) + OneCycle + group LR multipliers."""

    def __init__(self, cfg, total_steps: int):
        self.cfg = cfg
        self.total_steps = int(total_steps)
        self.sched = onecycle_lr(cfg.learning_rate, self.total_steps, cfg.num_epochs)
        self.adam = optax.scale_by_adam(b1=0.9, b2=0.999)
        self.wd = 1e-4

    def init(self, params: Params) -> OptState:
        return OptState(count=jnp.zeros((), jnp.int32), adam=self.adam.init(params))

    def update(self, grads: Params, state: OptState, params: Params) -> Tuple[Params, OptState]:
        lr = self.sched(state.count)
        adam_updates, adam_state = self.adam.update(grads, state.adam, params)

        def scale(path_key, u, p):
            mult = lr_mult_for(path_key, self.cfg.root_basis)
            return -(lr * mult) * (u + self.wd * p)

        updates = {
            k: jax.tree_util.tree_map(lambda u, p: scale(k, u, p), adam_updates[k], params[k])
            for k in params
        }
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return new_params, OptState(count=state.count + 1, adam=adam_state)


def group_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(0.0)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def clip_by_group(grads: Params, clip_scale: float) -> Tuple[Params, Dict[str, jnp.ndarray]]:
    """Per-group clip_grad_norm_ (train_utils.py:1282-1306). Returns
    clipped grads + per-group pre-clip norms (logged as *_g)."""
    norms: Dict[str, jnp.ndarray] = {}
    out: Params = {}
    for k, g in grads.items():
        max_norm = GROUP_TABLE.get(k, (1.0, 0.1))[1] * clip_scale
        n = group_global_norm(g)
        norms[k + "_g"] = n
        factor = jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-12))
        out[k] = jax.tree_util.tree_map(lambda x: x * factor, g)
    return out, norms


INPUT_LAYERS = ("xyz_1", "xyz_5")  # trunk input + skip re-injection layers
POS_DIM = 63  # positional-embedding rows of the input kernels


def _freeze_coarse_component(comp_grads):
    """freeze_coarse grad surgery for one NeRF trunk
    (find_nerf_coarse, train_utils.py:1313-1342): zero everything except
    the positional rows of the input-layer kernels."""

    def walk(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                if k in INPUT_LAYERS and "kernel" in v:
                    kern = v["kernel"]
                    mask = (jnp.arange(kern.shape[0]) < POS_DIM)[:, None]
                    out[k] = {
                        "kernel": kern * mask,
                        **{n: jnp.zeros_like(x) for n, x in v.items() if n != "kernel"},
                    }
                else:
                    out[k] = walk(v)
            else:
                out[k] = jnp.zeros_like(v)
        return out

    return walk(comp_grads)


def apply_freeze_masks(grads: Params, indicators: Dict[str, jnp.ndarray], cfg) -> Params:
    """Zero grads for frozen groups (train_utils.py:1234-1279).

    indicators: traced scalars {root_update, body_update, shape_update,
    cvf_update} with reference semantics (root/body: 1=update; shape/cvf:
    1=freeze)."""
    root_on = indicators["root_update"]
    body_on = indicators["body_update"]
    shape_frozen = indicators["shape_update"]
    cvf_frozen = indicators["cvf_update"]

    def mask(tree, on):
        return jax.tree_util.tree_map(lambda x: x * on, tree)

    out = dict(grads)
    for k in ("root_code", "nerf_root_rts"):
        if k in out:
            out[k] = mask(out[k], root_on)
    for k in ("pose_code", "rest_pose_code", "nerf_body_rts"):
        if k in out:
            out[k] = mask(out[k], body_on)
    if cfg.freeze_body_mlp and "nerf_body_rts" in out:
        out["nerf_body_rts"] = mask(out["nerf_body_rts"], 0.0)
    shape_on = 1.0 - shape_frozen
    for k in ("nerf_coarse", "nerf_beta", "nerf_vis", "bones", "nerf_skin", "nerf_dis", "skin_aux"):
        if k in out:
            out[k] = mask(out[k], shape_on)
    cvf_on = 1.0 - cvf_frozen
    for k in ("nerf_feat", "nerf_beta_feat", "csenet"):
        if k in out:
            out[k] = mask(out[k], cvf_on)

    if cfg.freeze_coarse:
        # only the positional input rows of coarse/skin/feat trunks train;
        # bones/skin_aux/vis fully frozen (train_utils.py:1256-1279)
        for k in ("nerf_coarse", "nerf_skin", "nerf_feat"):
            if k in out:
                out[k] = _freeze_coarse_component(out[k])
        for k in ("bones", "skin_aux", "nerf_vis"):
            if k in out:
                out[k] = mask(out[k], 0.0)
    return out


def reject_nonfinite(grads: Params) -> Tuple[Params, jnp.ndarray]:
    """Zero the whole step if any grad is non-finite (train_utils.py:1181-1187,
    1310-1311). Returns (grads, is_finite flag)."""
    leaves = jax.tree_util.tree_leaves(grads)
    finite = jnp.asarray(True)
    for x in leaves:
        finite = finite & jnp.isfinite(x).all()
    return (
        jax.tree_util.tree_map(lambda x: jnp.where(finite, x, jnp.zeros_like(x)), grads),
        finite,
    )

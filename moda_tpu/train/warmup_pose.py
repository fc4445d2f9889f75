"""Pose-CNN warmup: self-supervised camera initialization.

Re-design of the reference's warmup_pose pipeline
(train_utils.py:871-921 + moda.py:812-848, 931-1022):

1. ``render_pose_batch``: rasterize the canonical prior mesh with its
   16-d surface embeddings from random SE(3) cameras (host, native
   z-buffer rasterizer standing in for SoftRas — all reference call sites
   run under no_grad) into 112x112 feature crops;
2. train the PoseCNN to regress the rotation (translation detached, as in
   moda.py:841);
3. ``extract_cams``: run the CNN on each frame's observed CSE features to
   produce per-frame camera initializations (eval_cam,
   train_utils.py:393-453), with optional CSE forward-backward OOD
   filtering + nearest-valid substitution (save_cams, 732-791).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from moda_tpu.core import quat as Q
from moda_tpu.fields.cnn import PoseCNN
from moda_tpu.native import rasterize

CROP = 112


def render_pose_batch(verts: np.ndarray, faces: np.ndarray, embeds: np.ndarray,
                      d_mean: float, bs: int, rng: np.random.Generator,
                      img_size: int = 256):
    """Random-camera feature renderings (render_dp, moda.py:931-1022).

    verts: unit prior mesh [V,3]; embeds [V,16]. Returns
    (feats [bs,112,112,16], rtk [bs,4,4])."""
    from scipy.spatial.transform import Rotation as R

    std_rot, std_dep, focal = 6.28, 0.5, 2.0
    v = verts / 3.0 * d_mean
    feats_out = np.zeros((bs, CROP, CROP, embeds.shape[1]), np.float32)
    rtk_out = np.zeros((bs, 4, 4), np.float32)
    f_px = focal * img_size / 2.0
    for b in range(bs):
        Rmat = R.from_rotvec(rng.normal(0, std_rot, 3)).as_matrix()
        d_obj = max(d_mean * (1 + rng.normal(0, std_dep)), 1.2 * d_mean / 3)
        T = np.asarray([0.0, 0.0, d_obj])
        cam = v @ Rmat.T + T
        x = cam[:, 0] / cam[:, 2] * f_px + img_size / 2
        y = cam[:, 1] / cam[:, 2] * f_px + img_size / 2
        img, _, mask = rasterize(np.stack([x, y, cam[:, 2]], -1), faces, embeds,
                                 img_size, img_size)
        ys, xs = np.where(mask > 0)
        if len(xs) < 4:
            feats = np.zeros((CROP, CROP, embeds.shape[1]), np.float32)
        else:
            cx, cy = (xs.max() + xs.min()) // 2, (ys.max() + ys.min()) // 2
            lx = max((xs.max() - xs.min()) // 2, 8)
            ly = max((ys.max() - ys.min()) // 2, 8)
            x0, x1 = max(cx - lx, 0), min(cx + lx, img_size)
            y0, y1 = max(cy - ly, 0), min(cy + ly, img_size)
            import cv2
            crop = img[y0:y1, x0:x1]
            feats = cv2.resize(crop, (CROP, CROP), interpolation=cv2.INTER_LINEAR)
            # random mask augmentation (geom_utils.py:1369-1379)
            if rng.random() < 0.5:
                sx = int(rng.uniform(0.1, 0.3) * CROP)
                sy = int(rng.uniform(0.1, 0.3) * CROP)
                cx2 = int(rng.uniform(sx, CROP - sx))
                cy2 = int(rng.uniform(sy, CROP - sy))
                feats[cy2 - sy:cy2 + sy, cx2 - sx:cx2 + sx] = feats.mean((0, 1))
        n = np.linalg.norm(feats, axis=-1, keepdims=True)
        feats_out[b] = feats / np.maximum(n, 1e-9)
        rtk_out[b, :3, :3] = Rmat
        rtk_out[b, :3, 3] = T
        rtk_out[b, 3] = [f_px, f_px, img_size / 2, img_size / 2]
    return feats_out, rtk_out


class PoseWarmup:
    def __init__(self, verts: np.ndarray, faces: np.ndarray, embeds: np.ndarray,
                 d_mean: float, lr: float = 3e-4, seed: int = 0,
                 total_steps: int = 2000):
        self.verts, self.faces, self.embeds = verts, faces, embeds
        self.d_mean = d_mean
        self.net = PoseCNN()
        self.rng = np.random.default_rng(seed)
        self.params = self.net.init(jax.random.key(seed),
                                    jnp.zeros((1, CROP, CROP, embeds.shape[1])))["params"]
        # cosine decay over the full warmup (the reference reuses its
        # OneCycle init_training for the warmup phase, train_utils.py:886)
        self.opt = optax.adamw(
            optax.cosine_decay_schedule(lr, max(total_steps, 1), alpha=0.05),
            weight_decay=1e-4)
        self.opt_state = self.opt.init(self.params)

        @jax.jit
        def step(params, opt_state, feats, rtk_gt):
            def loss_fn(p):
                rts = self.net.apply({"params": p}, feats)
                rmat_d = rts[:, :9].reshape(-1, 3, 3)
                # compose with the canonical base (identity R, z=0.3)
                rmat = rmat_d
                rot_loss = Q.rot_angle(rmat @ jnp.swapaxes(rtk_gt[:, :3, :3], -1, -2)).mean()
                return 0.01 * rot_loss, rot_loss

            (loss, rot), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, rot

        self._step = step

    def train(self, steps: int, bs: int = 16, log_every: int = 50):
        # dispatch-async loop: the host rasterizes batch i+1 while the
        # device runs step i; forcing rot to a python float every step
        # serializes on the remote-TPU tunnel round trip (~0.5 s/step —
        # the r4 warmup budget was cut 10x to hide exactly this cost)
        rots = []
        for i in range(steps):
            feats, rtk = render_pose_batch(self.verts, self.faces, self.embeds,
                                           self.d_mean, bs, self.rng)
            self.params, self.opt_state, rot = self._step(
                self.params, self.opt_state, jnp.asarray(feats), jnp.asarray(rtk))
            rots.append(rot)
        return [float(r) for r in rots]

    def save(self, path: str):
        """Persist the pose CNN (pose_cnn_path artifact equivalent)."""
        from moda_tpu.train.ckpt import _flatten
        np.savez(path, **_flatten({"cnn": self.params}))

    def load(self, path: str):
        """npz: self-trained PoseCNN. .pth: the reference's pretrained
        posenet checkpoint (template.sh --pose_cnn_path route,
        train_utils.py:899-904), converted to the RefPoseNet port."""
        if path.endswith(".pth"):
            from moda_tpu.preproc.posenet import load_posenet
            self.ref_params = load_posenet(path)
        else:
            from moda_tpu.train.ckpt import _unflatten
            self.params = _unflatten(dict(np.load(path)))["cnn"]

    def predict(self, feats: np.ndarray) -> np.ndarray:
        """feats [N,112,112,16] -> rtk [N,4,4].

        Pretrained route (ref_params set): full CNN delta (rotation +
        translation) composed with the base, as refine_rt does. Self-trained
        route: rotation only (base z=0.3 translation), since the from-scratch
        warmup trains the rotation loss (moda.py:841)."""
        if getattr(self, "ref_params", None) is not None:
            from moda_tpu.preproc.posenet import predict_rtk
            return predict_rtk(self.ref_params, feats)
        rts = np.asarray(self.net.apply({"params": self.params}, jnp.asarray(feats)))
        out = np.zeros((len(feats), 4, 4), np.float32)
        out[:, :3, :3] = rts[:, :9].reshape(-1, 3, 3)
        out[:, :3, 3] = [0, 0, 0.3]
        return out


def ood_check_features(dp_feats: np.ndarray, dp_embed: np.ndarray,
                       dp_idx: np.ndarray, err_threshold: float = 12.0
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """CSE forward-backward consistency check (ood_check_cse,
    geom_utils.py:1610-1663). dp_feats [bs,16,h,w]; dp_embed [N,16];
    dp_idx [bs,h,w] vertex assignment. Returns (valid [bs], err [bs])."""
    bs, C, h, w = dp_feats.shape
    valid, errs = [], []
    xs, ys = np.meshgrid(range(w), range(h))
    for i in range(bs):
        cost = dp_embed @ dp_feats[i].reshape(C, -1)  # [N, h*w]
        max_idx = cost.argmax(-1)  # best pixel per vertex
        rpj = max_idx[dp_idx[i]]
        rx, ry = rpj % w, rpj // w
        err = np.sqrt((rx - xs) ** 2 + (ry - ys) ** 2)
        m = dp_idx[i] != 0
        mean_err = err[m].mean() if m.any() else 1e9
        errs.append(mean_err)
        valid.append(mean_err < err_threshold)
    return np.asarray(valid), np.asarray(errs)


def nearest_valid_substitution(rtks: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Replace invalid rotations by the nearest valid frame's
    (save_cams, train_utils.py:752-761)."""
    out = rtks.copy()
    idx_valid = np.where(valid)[0]
    if len(idx_valid) == 0:
        return out
    for i in range(len(rtks)):
        if not valid[i]:
            j = idx_valid[np.abs(idx_valid - i).argmin()]
            out[i, :3, :3] = rtks[j, :3, :3]
    return out


def process_so3_seq(scores: np.ndarray, grid: np.ndarray,
                    smooth: bool = True, sigma: float = 0.4) -> np.ndarray:
    """Temporally-smoothed rotation decoding from per-frame score
    distributions (geom_utils.py:1381-1461). The reference uses a dense
    CRF (pydensecrf); here: forward-backward message passing on the frame
    chain with a rotation-distance pairwise potential — same maximum-a-
    posteriori intent, dependency-free.

    scores [T, N]; grid [N, 3, 3] -> rotations [T, 3, 3]."""
    import jax.numpy as jnp
    from moda_tpu.core import quat as Q

    T, N = scores.shape
    logp = scores - scores.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    if smooth and T > 1:
        drot = np.asarray(Q.rot_angle(
            jnp.asarray(grid)[None] @ jnp.swapaxes(jnp.asarray(grid)[:, None], -1, -2)))
        trans = -0.5 * (drot / sigma) ** 2  # [N, N] transition log-potential
        # forward pass
        alpha = logp.copy()
        for t in range(1, T):
            m = alpha[t - 1][:, None] + trans
            alpha[t] += m.max(0)
        # backtrack
        idx = np.zeros(T, int)
        idx[-1] = alpha[-1].argmax()
        for t in range(T - 2, -1, -1):
            idx[t] = (alpha[t] + trans[:, idx[t + 1]]).argmax()
    else:
        idx = logp.argmax(-1)
    return grid[idx]

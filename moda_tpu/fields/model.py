"""Model assembly: builds the full network zoo and owns the param pytree.

This replaces the reference's mutable ``moda(nn.Module)`` construction
(moda.py:179-476) with a functional design:

- ``MoDAModel`` holds *static* module definitions + config;
- ``init(key)`` returns ``(params, mvars)``:
    * ``params``: dict[str, pytree] — one entry per optimizer group
      (mirrors the 22 param groups of train_utils.py:148-291);
    * ``mvars``:  non-optimized device state (near_far, embedding alpha,
      obj_bound, vis stats) — the reference keeps these as nn.Parameters
      it never optimizes, plus host numpy state.
- apply methods are pure functions of (params, inputs).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moda_tpu.config import DataInfo, MoDAConfig
from moda_tpu.core import skinning as SK
from moda_tpu.core.embedding import embed_dim, positional_embed
from moda_tpu.fields import nets

Params = Dict[str, Any]

NUM_FREQS = 10
IN_XYZ = embed_dim(3, NUM_FREQS)  # 63
IN_DIR = embed_dim(3, 4)  # 27
ENV_DIM = 64
APP_DIM = 128
VID_DIM = 32
NUM_FEAT = 16


@dataclass
class ModelVars:
    """Non-optimized device-side state (a pytree)."""

    near_far: jnp.ndarray  # [num_fr, 2]
    alpha: jnp.ndarray  # scalar embedding window
    obj_bound: jnp.ndarray  # [3]
    vis_min: jnp.ndarray  # [3]
    vis_len: jnp.ndarray  # [3]
    beta_is_active: jnp.ndarray  # scalar bool surrogate (unused placeholder)


jax.tree_util.register_dataclass(
    ModelVars,
    data_fields=["near_far", "alpha", "obj_bound", "vis_min", "vis_len", "beta_is_active"],
    meta_fields=[],
)


class MoDAModel:
    def __init__(self, cfg: MoDAConfig, data_info: DataInfo):
        self.cfg = cfg
        self.data_info = data_info
        self.num_fr = data_info.num_fr
        self.num_vid = data_info.num_vid
        self.max_ts = data_info.max_ts
        self.offset = tuple(int(o) for o in data_info.offset)

        dir_extra = (ENV_DIM if cfg.env_code else 0) + (APP_DIM if cfg.appearance_code else 0)
        # field-MLP compute dtype: bfloat16 keeps matmuls on the MXU's native
        # path (params stay fp32; flax Dense casts per-op; outputs are cast
        # back to fp32 before density transform / compositing)
        cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.nerf_coarse = nets.NeRFMLP(
            D=8, W=256, in_channels_xyz=IN_XYZ, in_channels_dir=IN_DIR + dir_extra,
            out_channels=3, raw_feat=False, dtype=cdt,
        )
        self.nerf_feat = nets.NeRFMLP(
            D=5, W=128, in_channels_xyz=IN_XYZ, in_channels_dir=0,
            out_channels=NUM_FEAT, raw_feat=True, dtype=cdt,
        )
        self.nerf_vis = nets.NeRFMLP(
            D=5, W=64, in_channels_xyz=IN_XYZ, in_channels_dir=0,
            out_channels=1, raw_feat=True, dtype=cdt,
        )
        self.nerf_unc = nets.NeRFMLP(
            D=8, W=256, in_channels_xyz=IN_XYZ, in_channels_dir=VID_DIM,
            out_channels=1, raw_feat=True, dtype=cdt,
        )
        self.nerf_skin = nets.NeRFMLP(
            D=5, W=64, in_channels_xyz=IN_XYZ + cfg.t_embed_dim, in_channels_dir=0,
            out_channels=cfg.num_bones, raw_feat=True, dtype=cdt,
        )
        self.nerf_dis = nets.NeRFMLP(
            D=5, W=128, in_channels_xyz=IN_XYZ + cfg.t_embed_dim, in_channels_dir=0,
            out_channels=3, raw_feat=True, dtype=cdt,
        )
        # 3D flow fields (flowbw mode, moda.py:285-299)
        self.nerf_flowbw = nets.Transhead(in_channels_xyz=IN_XYZ + cfg.t_embed_dim)
        self.nerf_flowfw = nets.Transhead(in_channels_xyz=IN_XYZ + cfg.t_embed_dim)

        self.pose_code = nets.FrameCode(
            num_freq=NUM_FREQS, embedding_dim=cfg.t_embed_dim, vid_offset=self.offset
        )
        self.env_code_net = nets.FrameCode(
            num_freq=NUM_FREQS, embedding_dim=ENV_DIM, vid_offset=self.offset
        )
        self.appearance_code_net = nets.FrameCode(
            num_freq=NUM_FREQS, embedding_dim=APP_DIM, vid_offset=self.offset
        )
        self.rest_pose_code = nets.EmbedCode(num=1, dim=cfg.t_embed_dim)
        self.vid_code = nets.EmbedCode(num=self.num_vid, dim=VID_DIM)

        if cfg.neudbs:
            self.body_head = nets.DQRTHead(num_bodies=cfg.num_bones, in_channels=cfg.t_embed_dim)
        else:
            self.body_head = nets.RTHead(
                num_bodies=cfg.num_bones, use_quat=False, in_channels=cfg.t_embed_dim
            )
        self.root_rts_net = nets.RTExpMLP(
            max_t=self.num_fr, num_freqs=NUM_FREQS, t_embed_dim=cfg.t_embed_dim,
            vid_offset=self.offset, delta=cfg.use_cam,
        )

        if cfg.ft_cse:
            from moda_tpu.fields.cse import CSENet
            self.csenet = CSENet()

        # scale bookkeeping (moda.py:232-247): near/far starts at [0, 6],
        # obj_scale normalizes the scene to bound ~0.3
        near_far0 = np.zeros((self.num_fr, 2), np.float32)
        near_far0[:, 1] = 6.0
        self.obj_scale = float((near_far0[:, 1] - near_far0[:, 0]).mean() / 2.0) / 0.3
        self.near_far_init = near_far0 / self.obj_scale

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array) -> Tuple[Params, ModelVars]:
        """Initialize all component params in ONE jitted program (the many
        tiny per-module init compiles would each pay full TPU compile
        latency otherwise)."""
        return jax.jit(self._init_impl)(key)

    def _init_impl(self, key: jax.Array) -> Tuple[Params, ModelVars]:
        cfg = self.cfg
        keys = iter(jax.random.split(key, 24))
        fid = jnp.zeros((2,), jnp.int32)
        xyz_e = jnp.zeros((2, IN_XYZ))
        dir_extra = (ENV_DIM if cfg.env_code else 0) + (APP_DIM if cfg.appearance_code else 0)

        params: Params = {}
        params["nerf_coarse"] = self.nerf_coarse.init(
            next(keys), jnp.zeros((2, IN_XYZ + IN_DIR + dir_extra))
        )["params"]
        params["nerf_beta"] = jnp.asarray([cfg.init_beta], jnp.float32)

        if cfg.use_embed:
            params["nerf_feat"] = self.nerf_feat.init(next(keys), xyz_e)["params"]
            params["nerf_beta_feat"] = jnp.asarray([1.0], jnp.float32)
        if cfg.nerf_vis:
            params["nerf_vis"] = self.nerf_vis.init(next(keys), xyz_e)["params"]
        if cfg.use_unc:
            params["nerf_unc"] = self.nerf_unc.init(
                next(keys), jnp.zeros((2, IN_XYZ + VID_DIM))
            )["params"]
            params["vid_code"] = self.vid_code.init(next(keys), fid)["params"]

        if cfg.flowbw:
            params["nerf_flowbw"] = self.nerf_flowbw.init(
                next(keys), jnp.zeros((2, IN_XYZ + cfg.t_embed_dim))
            )["params"]
            params["nerf_flowfw"] = self.nerf_flowfw.init(
                next(keys), jnp.zeros((2, IN_XYZ + cfg.t_embed_dim))
            )["params"]
            params["pose_code"] = self.pose_code.init(next(keys), fid)["params"]
        elif cfg.lbs or cfg.neudbs:
            params["bones"] = SK.generate_bones(cfg.num_bones, cfg.num_bones, 0.0)
            params["skin_aux"] = jnp.asarray([0.0, self.obj_scale], jnp.float32)
            params["pose_code"] = self.pose_code.init(next(keys), fid)["params"]
            params["nerf_body_rts"] = self.body_head.init(
                next(keys), jnp.zeros((2, cfg.t_embed_dim))
            )["params"]
            params["rest_pose_code"] = self.rest_pose_code.init(next(keys), fid)["params"]
            if cfg.nerf_skin:
                params["nerf_skin"] = self.nerf_skin.init(
                    next(keys), jnp.zeros((2, IN_XYZ + cfg.t_embed_dim))
                )["params"]
            if cfg.nerf_dis:
                params["nerf_dis"] = self.nerf_dis.init(
                    next(keys), jnp.zeros((2, IN_XYZ + cfg.t_embed_dim))
                )["params"]

        if cfg.env_code:
            params["env_code"] = self.env_code_net.init(next(keys), fid)["params"]
        if cfg.appearance_code:
            params["appearance_code"] = self.appearance_code_net.init(next(keys), fid)["params"]
        if cfg.root_opt:
            params["nerf_root_rts"] = self.root_rts_net.init(next(keys), fid)["params"]
        if cfg.ft_cse:
            params["csenet"] = self.csenet.init(
                next(keys), jnp.zeros((1, 32, 32, 3)))["params"]
        if cfg.ks_opt:
            params["ks_param"] = jnp.asarray(self.data_info.intrinsics, jnp.float32)

        bound = float((self.near_far_init[:, 1] - self.near_far_init[:, 0]).mean() / 2.0)
        mvars = ModelVars(
            near_far=jnp.asarray(self.near_far_init),
            alpha=jnp.asarray(float(cfg.alpha)),
            obj_bound=jnp.full((3,), bound, jnp.float32),
            vis_min=jnp.zeros((3,), jnp.float32),
            vis_len=jnp.full((3,), bound / 2.0, jnp.float32),
            beta_is_active=jnp.asarray(0.0),
        )
        return params, mvars

    # -------------------------------------------------------------- applies
    def embed_xyz(self, xyz: jnp.ndarray, alpha=None) -> jnp.ndarray:
        return positional_embed(xyz, NUM_FREQS, alpha=alpha)

    def embed_dir(self, d: jnp.ndarray, alpha=None) -> jnp.ndarray:
        return positional_embed(d, 4, alpha=alpha)

    def precise(self):
        """A view of this model with the Pallas bf16 kernels disabled —
        the fp32/XLA path used by eval/extraction (SURVEY §7 bit-compat:
        the eval path stays fp32; training may run reduced precision)."""
        import copy
        from dataclasses import replace
        m = copy.copy(self)
        m.cfg = replace(self.cfg, use_pallas=False)
        return m

    def _apply_mlp(self, mod: nets.NeRFMLP, p, x: jnp.ndarray,
                   sigma_only: bool = False, code_trunk=None, code_dir=None,
                   need_dx: bool = True, embed_raw: bool = False,
                   embed_alpha=None):
        """Route an NeRFMLP through the fused Pallas kernel on TPU
        (training hot path) or the flax module elsewhere.

        code_trunk/code_dir: per-ray codes [R, c] for [R, S, C]-shaped x —
        broadcast + concatenated inside the kernel (HBM never sees the
        widened input). embed_raw: x is RAW [..., 3] points and the
        NUM_FREQS positional embed runs inside the kernel too (the XLA
        embed chain materializes minor-dim-3/60 arrays that pad to 128
        lanes). sigma_only stays on flax: those call sites pass
        trunk-width inputs and the eikonal loss needs grad-of-grad, which
        a custom_vjp kernel cannot provide (losses.py:40-70)."""
        # Kernel route: real TPU, or MODA_FORCE_PALLAS=1 (CI runs the
        # kernels in pallas interpret mode on CPU — without this override
        # the flax fallback hides kernel-routing regressions from every
        # pipeline-level test; that is exactly how the round-3 apply_unc
        # layout bug shipped). MODA_PALLAS_F32=1 additionally forces fp32
        # kernel compute so parity vs the fp32 flax path is exact.
        force = os.environ.get("MODA_FORCE_PALLAS") == "1"
        if self.cfg.use_pallas and not sigma_only \
                and (force or jax.default_backend() == "tpu"):
            from moda_tpu.core.embedding import window_vec
            from moda_tpu.ops.fused_mlp import nerf_mlp_pallas
            S = x.shape[1] if (x.ndim == 3 and
                               (code_trunk is not None or code_dir is not None)) else 1
            ef, ew = 0, None
            if embed_raw:
                ef = NUM_FREQS
                ew = window_vec(NUM_FREQS, x.shape[-1], embed_alpha)
            cdt = (jnp.float32 if os.environ.get("MODA_PALLAS_F32") == "1"
                   else jnp.bfloat16)
            return nerf_mlp_pallas(
                p, x, D=mod.D, in_xyz=mod.in_channels_xyz,
                in_dir=mod.in_channels_dir, skips=tuple(mod.skips),
                raw_feat=mod.raw_feat, sigma_only=sigma_only,
                code_trunk=code_trunk, code_dir=code_dir,
                samples_per_ray=S, need_dx=need_dx,
                embed_freqs=ef, embed_window=ew, compute_dtype=cdt)
        if embed_raw:
            x = positional_embed(x, NUM_FREQS, alpha=embed_alpha)
        # flax fallback: rebuild the reference's concatenated layout
        if code_trunk is not None:
            cb = (code_trunk if x.ndim == code_trunk.ndim else
                  jnp.broadcast_to(code_trunk[:, None, :],
                                   x.shape[:-1] + (code_trunk.shape[-1],)))
            x = jnp.concatenate([x, cb], -1)
        if code_dir is not None:
            cb = (code_dir if x.ndim == code_dir.ndim else
                  jnp.broadcast_to(code_dir[:, None, :],
                                   x.shape[:-1] + (code_dir.shape[-1],)))
            x = jnp.concatenate([x, cb], -1)
        return mod.apply({"params": p}, x, sigma_only=sigma_only)

    def apply_coarse(self, params: Params, x: jnp.ndarray, sigma_only: bool = False,
                     code_dir=None, embed_raw: bool = False, embed_alpha=None):
        return self._apply_mlp(self.nerf_coarse, params["nerf_coarse"], x,
                               sigma_only=sigma_only, code_dir=code_dir,
                               embed_raw=embed_raw, embed_alpha=embed_alpha)

    def apply_feat(self, params: Params, xyz_e: jnp.ndarray,
                   need_dx: bool = True,
                   embed_raw: bool = False, embed_alpha=None):
        return self._apply_mlp(self.nerf_feat, params["nerf_feat"], xyz_e,
                               need_dx=need_dx,
                               embed_raw=embed_raw, embed_alpha=embed_alpha)

    def apply_coarse_feat(self, params: Params, x: jnp.ndarray,
                          code_dir=None, embed_raw: bool = False,
                          embed_alpha=None):
        """Coarse rgb/sigma AND the CSE feature head at the same sample
        points (rendering.py:124-166). On the Pallas route both nets ride
        ONE fused launch — the block DMA, in-kernel positional embed, and
        grid sequencing are paid once; the narrow feat net's matmuls are
        nearly free on the trunk's grid (~3 ms/step at the recipe bundle
        vs separate launches). Returns (coarse [..,4], feat [..,NUM_FEAT])."""
        force = os.environ.get("MODA_FORCE_PALLAS") == "1"
        if self.cfg.use_pallas and (force or jax.default_backend() == "tpu"):
            from moda_tpu.core.embedding import window_vec
            from moda_tpu.ops.fused_mlp import nerf_mlp_pallas_multi
            S = x.shape[1] if (x.ndim == 3 and code_dir is not None) else 1
            ef, ew = 0, None
            if embed_raw:
                ef = NUM_FREQS
                ew = window_vec(NUM_FREQS, x.shape[-1], embed_alpha)
            cdt = (jnp.float32 if os.environ.get("MODA_PALLAS_F32") == "1"
                   else jnp.bfloat16)
            mc, mf = self.nerf_coarse, self.nerf_feat
            out, feat = nerf_mlp_pallas_multi(
                [dict(params=params["nerf_coarse"], D=mc.D,
                      in_xyz=mc.in_channels_xyz, in_dir=mc.in_channels_dir,
                      skips=tuple(mc.skips), raw_feat=mc.raw_feat,
                      use_cd=True),
                 dict(params=params["nerf_feat"], D=mf.D,
                      in_xyz=mf.in_channels_xyz, in_dir=0,
                      skips=tuple(mf.skips), raw_feat=mf.raw_feat)],
                x, code_dir=code_dir, samples_per_ray=S,
                embed_freqs=ef, embed_window=ew, compute_dtype=cdt)
            return out, feat
        out = self.apply_coarse(params, x, code_dir=code_dir,
                                embed_raw=embed_raw, embed_alpha=embed_alpha)
        feat = self.apply_feat(params, x, embed_raw=embed_raw,
                               embed_alpha=embed_alpha)
        return out, feat

    def apply_vis(self, params: Params, xyz_e: jnp.ndarray, need_dx: bool = True,
                  embed_raw: bool = False, embed_alpha=None):
        return self._apply_mlp(self.nerf_vis, params["nerf_vis"], xyz_e,
                               need_dx=need_dx, embed_raw=embed_raw,
                               embed_alpha=embed_alpha)

    def apply_unc(self, params: Params, xyt_code: jnp.ndarray, code_dir=None,
                  embed_raw: bool = False, embed_alpha=None):
        """Uncertainty MLP (reference nerf.py:502-511 / rendering.py:501-516).

        The vid code belongs on the DIR branch (nerf_unc is declared with
        in_channels_dir=VID_DIM at __init__): pass it as code_dir, either
        pre-concatenated into xyt_code (legacy layout, rays.py:91) or as a
        separate per-ray code here."""
        return self._apply_mlp(self.nerf_unc, params["nerf_unc"], xyt_code,
                               code_dir=code_dir, embed_raw=embed_raw,
                               embed_alpha=embed_alpha)

    def apply_csenet(self, params: Params, imgs: jnp.ndarray):
        """[N,H,W,3] crop images -> [N,H/2,W/2,16] unit embeddings (the
        trainable ft_cse net, nnutils/cse.py:20-78 equivalent)."""
        return self.csenet.apply({"params": params["csenet"]}, imgs)

    def apply_skin(self, params: Params, x: jnp.ndarray, code_trunk=None,
                   embed_raw: bool = False, embed_alpha=None):
        return self._apply_mlp(self.nerf_skin, params["nerf_skin"], x,
                               code_trunk=code_trunk, embed_raw=embed_raw,
                               embed_alpha=embed_alpha)

    def apply_dis(self, params: Params, x: jnp.ndarray, code_trunk=None,
                  embed_raw: bool = False, embed_alpha=None):
        return self._apply_mlp(self.nerf_dis, params["nerf_dis"], x,
                               code_trunk=code_trunk, embed_raw=embed_raw,
                               embed_alpha=embed_alpha)

    def apply_pose_code(self, params: Params, fid: jnp.ndarray):
        return self.pose_code.apply({"params": params["pose_code"]}, fid)

    def apply_env_code(self, params: Params, fid: jnp.ndarray):
        return self.env_code_net.apply({"params": params["env_code"]}, fid)

    def apply_appearance_code(self, params: Params, fid: jnp.ndarray):
        return self.appearance_code_net.apply({"params": params["appearance_code"]}, fid)

    def apply_vid_code(self, params: Params, vid: jnp.ndarray):
        return self.vid_code.apply({"params": params["vid_code"]}, vid)

    def apply_rest_pose_code(self, params: Params, idx: jnp.ndarray):
        return self.rest_pose_code.apply({"params": params["rest_pose_code"]}, idx)

    def body_rts(self, params: Params, fid: jnp.ndarray) -> jnp.ndarray:
        """frame ids [N] -> bone transforms [N, B, 8] (neudbs) or [N, B, 12]."""
        code = self.apply_pose_code(params, fid)
        return self.body_head.apply({"params": params["nerf_body_rts"]}, code)

    def body_rts_rest(self, params: Params) -> jnp.ndarray:
        """Rest-pose bone transforms Jb* [1, B, 8/12] (correct_bones input)."""
        code = self.apply_rest_pose_code(params, jnp.zeros((1,), jnp.int32))
        return self.body_head.apply({"params": params["nerf_body_rts"]}, code)

    def root_rts(self, params: Params, fid: jnp.ndarray) -> jnp.ndarray:
        """frame ids [N] -> root delta SE3 [N, 1, 12]."""
        return self.root_rts_net.apply({"params": params["nerf_root_rts"]}, fid)

    def compute_rts(self, params: Params, base_rt: jnp.ndarray | None = None) -> jnp.ndarray:
        """Root poses for ALL frames [num_fr, 3, 4] (moda.py:1468-1495).

        base_rt: optional [num_fr, 3, 4] prior cameras (use_cam path,
        already divided by obj_scale); None -> canonical base (z=0.3).
        """
        fid = jnp.arange(self.num_fr)
        if base_rt is None:
            base_rt = create_base_se3(self.num_fr)
        rt = base_rt
        if self.cfg.root_opt:
            delta = self.root_rts(params, fid)
            rmat_d = delta[:, 0, :9].reshape(-1, 3, 3)
            tmat_d = delta[:, 0, 9:12]
            tmat = rt[:, :3, 3] + (rt[:, :3, :3] @ tmat_d[..., None])[..., 0]
            rmat = rt[:, :3, :3] @ rmat_d
            rt = jnp.concatenate([rmat, tmat[..., None]], -1)
        return rt


def create_base_se3(bs: int) -> jnp.ndarray:
    """Canonical base camera: identity R, T=(0,0,0.3) (moda.py:1024-1033)."""
    rt = jnp.zeros((bs, 3, 4))
    rt = rt.at[:, :3, :3].set(jnp.eye(3))
    rt = rt.at[:, 2, 3].set(0.3)
    return rt

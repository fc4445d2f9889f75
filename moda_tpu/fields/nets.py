"""Network zoo (flax.linen), TPU-first re-design of nnutils/nerf.py.

Differences from the reference are intentional and idiomatic:
- modules are pure flax (params as pytrees, no mutable state);
- positional embedding lives in core.embedding (functional, windowed);
- pose heads return structured outputs (dqs [.., B, 8] / rts [.., B, 12])
  instead of flattened buffers.

Reference parity notes (file:line into /root/reference):
- NeRF trunk: nerf.py:83-198 (D=8, W=256, skip@4, sigma head + dir branch)
- Transhead/SE3head: nerf.py:200-237
- DQ_RTHead: nerf.py:239-279 ; RTHead: nerf.py:307-344
- FrameCode: nerf.py:346-380 ; RTExplicit: nerf.py:382-427
- RTExpMLP (base*delta, 10x grad trick): nerf.py:429-470
- NeRFUnc: nerf.py:502-511
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from moda_tpu.core import dualquat as DQ
from moda_tpu.core import quat as Q
from moda_tpu.core.embedding import embed_dim, positional_embed


class NeRFMLP(nn.Module):
    """The shared MLP trunk: embedded xyz (+optional code) -> sigma & rgb/feat.

    Forward contract (matches reference semantics):
      __call__(x, sigma_only=False) where x = [xyz_embed | dir_embed+codes].
      raw_feat=True  -> returns rgb branch raw (used for feature/flow heads)
      raw_feat=False -> returns [sigmoid(rgb), sigma] concat.
    """

    D: int = 8
    W: int = 256
    in_channels_xyz: int = 63
    in_channels_dir: int = 27
    out_channels: int = 3
    skips: Sequence[int] = (4,)
    raw_feat: bool = False
    init_beta: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, sigma_only: bool = False) -> jnp.ndarray:
        in_xyz = self.in_channels_xyz
        input_xyz = x[..., :in_xyz]
        h = input_xyz
        for i in range(self.D):
            if i in self.skips:
                h = jnp.concatenate([input_xyz, h], -1)
            h = nn.Dense(self.W, name=f"xyz_{i+1}", dtype=self.dtype)(h)
            h = nn.relu(h)
        sigma = nn.Dense(1, name="sigma", dtype=self.dtype)(h)
        if sigma_only:
            return sigma.astype(jnp.float32)

        input_dir = x[..., in_xyz:in_xyz + self.in_channels_dir]
        h_final = nn.Dense(self.W, name="xyz_final", dtype=self.dtype)(h)
        h_dir = jnp.concatenate([h_final, input_dir], -1)
        h_dir = nn.Dense(self.W // 2, name="dir", dtype=self.dtype)(h_dir)
        h_dir = nn.relu(h_dir)
        rgb = nn.Dense(self.out_channels, name="rgb", dtype=self.dtype)(h_dir)
        if self.raw_feat:
            return rgb.astype(jnp.float32)
        rgb = nn.sigmoid(rgb)
        return jnp.concatenate([rgb, sigma], -1).astype(jnp.float32)

    def beta_init(self):
        return jnp.asarray([self.init_beta], dtype=jnp.float32)


class Transhead(nn.Module):
    """Translation field head: NeRF trunk output * 0.1 (nerf.py:200-210)."""

    D: int = 5
    W: int = 128
    in_channels_xyz: int = 63
    out_channels: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        flow = NeRFMLP(
            D=self.D, W=self.W, in_channels_xyz=self.in_channels_xyz,
            in_channels_dir=0, out_channels=self.out_channels, raw_feat=True,
            name="trunk",
        )(x)
        return flow * 0.1


class SE3Head(nn.Module):
    """Per-point rigid-motion field (Nerfies-style, nerf.py:212-237)."""

    D: int = 5
    W: int = 128
    in_channels_xyz: int = 63

    @nn.compact
    def __call__(self, x: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
        out = NeRFMLP(
            D=self.D, W=self.W, in_channels_xyz=self.in_channels_xyz,
            in_channels_dir=0, out_channels=9, raw_feat=True, name="trunk",
        )(x)
        rotation, pivot, translation = jnp.split(out, 3, axis=-1)
        pivot = pivot * 0.1
        translation = translation * 0.1
        warped = xyz + pivot
        rmat = Q.so3_exp(rotation)
        warped = (rmat @ warped[..., None])[..., 0]
        warped = warped - pivot + translation
        return warped - xyz


class RTHead(nn.Module):
    """Code -> B rigid transforms as 12-vectors (nerf.py:307-344).

    use_quat=True: quat param; False: so3 exp-map param.
    Biases init to zero -> near-identity output at init.
    """

    num_bodies: int = 1
    use_quat: bool = True
    D: int = 8
    W: int = 256
    in_channels: int = 128

    @nn.compact
    def __call__(self, code: jnp.ndarray) -> jnp.ndarray:
        per = 7 if self.use_quat else 6
        out = NeRFMLP(
            D=self.D, W=self.W, in_channels_xyz=self.in_channels,
            in_channels_dir=0, out_channels=per * self.num_bodies, raw_feat=True,
            name="trunk",
        )(code)
        rts = out.reshape(code.shape[:-1] + (self.num_bodies, per))
        tmat = rts[..., 0:3] * 0.1
        if self.use_quat:
            rquat = Q.q_normalize(rts[..., 3:7])
            rmat = Q.q_to_matrix(rquat)
        else:
            rmat = Q.so3_exp(rts[..., 3:6])
        rvec = rmat.reshape(rts.shape[:-1] + (9,))
        return jnp.concatenate([rvec, tmat], -1)  # [..., B, 12]


class DQRTHead(nn.Module):
    """Code -> B dual-quaternion bone transforms (nerf.py:239-279)."""

    num_bodies: int = 25
    D: int = 8
    W: int = 256
    in_channels: int = 128

    @nn.compact
    def __call__(self, code: jnp.ndarray) -> jnp.ndarray:
        out = NeRFMLP(
            D=self.D, W=self.W, in_channels_xyz=self.in_channels,
            in_channels_dir=0, out_channels=7 * self.num_bodies, raw_feat=True,
            name="trunk",
        )(code)
        rts = out.reshape(code.shape[:-1] + (self.num_bodies, 7))
        tmat = rts[..., 0:3] * 0.1
        rquat = Q.q_normalize(rts[..., 3:7])
        return DQ.rt_to_dq(rquat, tmat)  # [..., B, 8]


class FrameCode(nn.Module):
    """(video id, relative frame id) -> latent code (nerf.py:346-380).

    Fourier-embeds the normalized time index, one-hot scatters it into a
    per-video slot, and linearly mixes.
    """

    num_freq: int = 10
    embedding_dim: int = 128
    vid_offset: tuple = (0, 1)  # static python tuple of ints, len = num_vids+1
    scale: float = 1.0

    @nn.compact
    def __call__(self, fid: jnp.ndarray) -> jnp.ndarray:
        """fid: integer absolute frame ids [N] -> [N, embedding_dim]."""
        offset = jnp.asarray(self.vid_offset)
        num_vids = len(self.vid_offset) - 1
        vid, tid = fid_reindex(fid, offset)
        tid = tid * self.scale
        coeff = positional_embed(tid[:, None], self.num_freq, alpha=self.num_freq)
        one_hot = jax.nn.one_hot(vid, num_vids, dtype=coeff.dtype)
        # [N, C, V] -> [N, C*V]
        mixed = (coeff[..., None] * one_hot[:, None, :]).reshape(fid.shape[0], -1)
        return nn.Dense(self.embedding_dim, name="basis")(mixed)


def fid_reindex(fid: jnp.ndarray, vid_offset: jnp.ndarray):
    """Absolute frame id -> (video id, normalized relative time).

    tid = (t_rel - dur/2) / max_ts * 2 (geom_utils.py:1759-1778).
    """
    num_vids = vid_offset.shape[0] - 1
    fidf = fid.astype(jnp.float32)
    max_ts = jnp.max(vid_offset[1:] - vid_offset[:-1]).astype(jnp.float32)
    vid = jnp.clip(jnp.searchsorted(vid_offset[1:], fid, side="right"), 0, num_vids - 1)
    start = vid_offset[vid].astype(jnp.float32)
    dur = (vid_offset[vid + 1] - vid_offset[vid]).astype(jnp.float32)
    tid = (fidf - start - dur / 2.0) / max_ts * 2.0
    return vid, tid


class RTExplicit(nn.Module):
    """Per-frame explicit SE(3) dictionary (nerf.py:382-427)."""

    max_t: int = 1
    delta: bool = False  # True: so3 param, False: quat param (identity init)

    @nn.compact
    def __call__(self, fid: jnp.ndarray) -> jnp.ndarray:
        per = 6 if self.delta else 7

        def init_fn(key):
            se3 = jnp.zeros((self.max_t, per))
            if not self.delta:
                se3 = se3.at[:, 3].set(1.0)  # identity quaternion (rand=False path)
            return se3

        se3 = self.param("se3", init_fn)
        rts = se3[fid]
        tmat = rts[..., 0:3] * 0.1
        if self.delta:
            rmat = Q.so3_exp(rts[..., 3:6])
        else:
            rmat = Q.q_to_matrix(Q.q_normalize(rts[..., 3:7]))
        rvec = rmat.reshape(rts.shape[:-1] + (9,))
        return jnp.concatenate([rvec, tmat], -1)[..., None, :]  # [N, 1, 12]


class RTExpMLP(nn.Module):
    """Root pose: explicit base table x MLP delta (nerf.py:429-470).

    base grads magnified 10x via base*10 - stop_grad(base*9).
    """

    max_t: int = 1
    num_freqs: int = 10
    t_embed_dim: int = 128
    vid_offset: tuple = (0, 1)
    delta: bool = False

    @nn.compact
    def __call__(self, fid: jnp.ndarray) -> jnp.ndarray:
        base = RTExplicit(max_t=self.max_t, delta=self.delta, name="base_rt")(fid)
        code = FrameCode(
            num_freq=self.num_freqs, embedding_dim=self.t_embed_dim,
            vid_offset=self.vid_offset, scale=0.1, name="root_code",
        )(fid)
        delt = RTHead(
            num_bodies=1, use_quat=False, in_channels=self.t_embed_dim, name="mlp_rt",
        )(code)

        base = base * 10.0 - jax.lax.stop_gradient(base * 9.0)

        rmat = base[:, 0, :9].reshape(-1, 3, 3)
        tmat = base[:, 0, 9:12]
        d_rmat = delt[:, 0, :9].reshape(-1, 3, 3)
        d_tmat = delt[:, 0, 9:12]
        tmat = tmat + (rmat @ d_tmat[..., None])[..., 0]
        rmat = rmat @ d_rmat
        return jnp.concatenate([rmat.reshape(-1, 9), tmat], -1)[:, None, :]  # [N,1,12]


class EmbedCode(nn.Module):
    """Plain embedding table (nn.Embedding equivalent)."""

    num: int = 1
    dim: int = 128

    @nn.compact
    def __call__(self, idx: jnp.ndarray) -> jnp.ndarray:
        table = self.param("weight", nn.initializers.normal(1.0), (self.num, self.dim))
        return table[idx]


def so3_grid(n: int = 576) -> jnp.ndarray:
    """Quasi-uniform SO(3) rotation grid [n, 3, 3].

    Replaces the healpix grid of the reference's ScoreHead
    (nerf.py:472-500): a deterministic low-discrepancy quaternion set
    (generalized Fibonacci points on S^3)."""
    i = np.arange(n) + 0.5
    # 3 irrational multipliers spread points over S^3 angles
    t0 = i / n
    t1 = (i * 0.7548776662466927) % 1.0
    t2 = (i * 0.5698402909980532) % 1.0
    # Shoemake uniform quaternion sampling with stratified inputs
    r1 = np.sqrt(1.0 - t0)
    r2 = np.sqrt(t0)
    q = np.stack([
        r1 * np.sin(2 * np.pi * t1), r1 * np.cos(2 * np.pi * t1),
        r2 * np.sin(2 * np.pi * t2), r2 * np.cos(2 * np.pi * t2)], -1)
    return Q.q_to_matrix(jnp.asarray(q, jnp.float32))


class ScoreHead(nn.Module):
    """Code -> per-rotation-bin scores over an SO(3) grid (nerf.py:472-500),
    used by the CNN root-pose basis to output a rotation distribution."""

    num_scores: int = 576
    in_channels: int = 128

    @nn.compact
    def __call__(self, code: jnp.ndarray) -> jnp.ndarray:
        out = NeRFMLP(D=1, W=256, in_channels_xyz=self.in_channels,
                      in_channels_dir=0, out_channels=self.num_scores + 3,
                      raw_feat=True, name="trunk")(code)
        return out[..., 3:]  # scores (tmat outputs unused, as in reference)

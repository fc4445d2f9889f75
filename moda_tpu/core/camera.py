"""Pinhole camera math + ray casting, pure JAX.

Functional equivalents of geom_utils.py:596-673 (K2mat/mat2K/Kmatinv/K2inv/
pinhole_cam), obj_to_cam (567-581), raycast (746-794) and
moda.prepare_ray_cams (moda.py:1035-1046). All static-shape, broadcasting
over leading batch dims.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


def K2mat(K: jnp.ndarray) -> jnp.ndarray:
    """Intrinsics 4-vector [..., 4] (fx,fy,px,py) -> [..., 3, 3]."""
    fx, fy, px, py = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    row0 = jnp.stack([fx, z, px], -1)
    row1 = jnp.stack([z, fy, py], -1)
    row2 = jnp.stack([z, z, o], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat2K(Kmat: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> 4-vector (fx,fy,px,py)."""
    return jnp.stack(
        [Kmat[..., 0, 0], Kmat[..., 1, 1], Kmat[..., 0, 2], Kmat[..., 1, 2]], axis=-1
    )


def K2inv(K: jnp.ndarray) -> jnp.ndarray:
    """Inverse intrinsics matrix from 4-vector."""
    fx, fy, px, py = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    row0 = jnp.stack([1.0 / fx, z, -px / fx], -1)
    row1 = jnp.stack([z, 1.0 / fy, -py / fy], -1)
    row2 = jnp.stack([z, z, o], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def Kmatinv(Kmat: jnp.ndarray) -> jnp.ndarray:
    """Invert an intrinsics matrix [..., 3, 3]."""
    return K2inv(mat2K(Kmat))


def obj_to_cam(verts: jnp.ndarray, Rmat: jnp.ndarray, Tmat: jnp.ndarray) -> jnp.ndarray:
    """Object -> camera coords.

    verts: [..., N, 3]; Rmat: [..., 3, 3]; Tmat: [..., 3].
    v_cam = v @ R^T + T (right-multiply form of geom_utils.py:567-581).
    """
    return verts @ jnp.swapaxes(Rmat, -1, -2) + Tmat[..., None, :]


def pinhole_cam(verts: jnp.ndarray, K: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Project camera-space points [..., N, 3] with K 4-vector [..., 4].

    Returns (x_px, y_px, Z) keeping depth in the last channel
    (geom_utils.py:654-673).
    """
    Kmat = K2mat(K)
    v = verts @ jnp.swapaxes(Kmat, -1, -2)
    z = v[..., 2:3]
    xy = v[..., :2] / (eps + z)
    return jnp.concatenate([xy, z], axis=-1)


class Rays(NamedTuple):
    """Static-shape ray bundle. All arrays lead with [..., N] pixels."""

    rays_o: jnp.ndarray  # [..., N, 3] origins (object/root coords)
    rays_d: jnp.ndarray  # [..., N, 3] directions (un-normalized)
    near: jnp.ndarray    # [..., N, 1]
    far: jnp.ndarray     # [..., N, 1]
    rtk_vec: jnp.ndarray  # [..., N, 21] (R 9, T 3, Kinv 9)
    xys: jnp.ndarray     # [..., N, 2] pixel coords


def raycast(
    xys: jnp.ndarray,
    Rmat: jnp.ndarray,
    Tmat: jnp.ndarray,
    Kinv: jnp.ndarray,
    near_far: Optional[jnp.ndarray],
) -> Rays:
    """Cast rays through pixels (geom_utils.py:746-794).

    xys:      [B, N, 2] pixel coordinates
    Rmat:     [B, 3, 3] object-to-camera rotation
    Tmat:     [B, 3]    object-to-camera translation
    Kinv:     [B, 3, 3] inverse intrinsics
    near_far: [B, 2] or None (None -> Tz +- 1.5 bounds)
    """
    B, N = xys.shape[0], xys.shape[1]
    xy1 = jnp.concatenate([xys, jnp.ones_like(xys[..., :1])], axis=-1)
    xyz3d = xy1 @ jnp.swapaxes(Kinv, -1, -2)
    rays_d = xyz3d @ Rmat  # right-multiply == R^T-left-multiply
    rays_o = -(Tmat[:, None, :] @ Rmat)  # [B, 1, 3]
    rays_o = jnp.broadcast_to(rays_o, (B, N, 3))

    if near_far is not None:
        znear = jnp.broadcast_to(near_far[:, 0, None, None], (B, N, 1))
        zfar = jnp.broadcast_to(near_far[:, 1, None, None], (B, N, 1))
    else:
        tz = Tmat[:, None, 2:3]
        znear = jnp.broadcast_to(jnp.maximum(tz - 1.5, 1e-5), (B, N, 1))
        zfar = jnp.broadcast_to(tz + 1.5, (B, N, 1))

    rtk_vec = jnp.concatenate(
        [
            Rmat.reshape(B, 1, 9),
            Tmat.reshape(B, 1, 3),
            Kinv.reshape(B, 1, 9),
        ],
        axis=-1,
    )
    rtk_vec = jnp.broadcast_to(rtk_vec, (B, N, 21))
    return Rays(rays_o=rays_o, rays_d=rays_d, near=znear, far=zfar, rtk_vec=rtk_vec, xys=xys)


def prepare_ray_cams(rtk: jnp.ndarray, kaug: jnp.ndarray):
    """rtk [B,4,4] (rows 0-2 SE3, row 3 intrinsics 4vec) + crop aug kaug [B,4]
    -> (Rmat [B,3,3], Tmat [B,3], Kinv [B,3,3]).  (moda.py:1035-1046)
    """
    Rmat = rtk[:, :3, :3]
    Tmat = rtk[:, :3, 3]
    Kmat = K2mat(rtk[:, 3, :])
    Kaug = K2inv(kaug)  # p_crop = Kaug @ Kmat @ P
    Kinv = Kmatinv(Kaug @ Kmat)
    return Rmat, Tmat, Kinv

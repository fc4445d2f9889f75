"""Offline mesh-sequence rendering (gifs / turntables / bone views).

Re-design of scripts/visualize/render_vis.py:85-538 minus the CUDA
dependencies: meshes are projected with the saved cameras and drawn by the
native z-buffer rasterizer with simple lambertian shading; bones render as
ellipsoid meshes (utils/io.py save_bones equivalent).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from moda_tpu.extract.mesh import Mesh
from moda_tpu.native import rasterize


def unit_sphere(subdiv: int = 1):
    """Icosphere (for bone ellipsoids)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.asarray([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    f = np.asarray([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int32)
    for _ in range(subdiv):
        mid = {}
        nv = list(v)
        nf = []

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = (v[a] + v[b]) / 2
                m = m / np.linalg.norm(m)
                mid[key] = len(nv)
                nv.append(m)
            return mid[key]

        for (a, b, c) in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(nv, np.float32)
        f = np.asarray(nf, np.int32)
    return v, f


def bones_to_mesh(bones: np.ndarray, radius: float = 0.025) -> Mesh:
    """Bone 10-vectors -> colored ellipsoid mesh (utils/io.py:51-78)."""
    from scipy.spatial.transform import Rotation as R

    sv, sf = unit_sphere(1)
    verts, faces, colors = [], [], []
    rng = np.random.default_rng(0)
    for i, b in enumerate(bones):
        center, q, logs = b[:3], b[3:7], b[7:10]
        q = q / max(np.linalg.norm(q), 1e-9)
        rot = R.from_quat(q[[1, 2, 3, 0]]).as_matrix()
        # scale convention: larger exp(logs) = tighter gaussian; draw fixed radius
        v = (sv * radius) @ rot.T + center
        faces.append(sf + i * len(sv))
        verts.append(v)
        colors.append(np.tile(rng.uniform(0.2, 1.0, 3), (len(sv), 1)))
    return Mesh(np.concatenate(verts).astype(np.float32),
                np.concatenate(faces).astype(np.int32),
                np.concatenate(colors).astype(np.float32))


def render_mesh_view(mesh: Mesh, rtk: np.ndarray, size: int = 256,
                     shade: bool = True) -> np.ndarray:
    """Project mesh with rtk ([R|T] rows 0-2, intrinsics row 3) and draw."""
    if len(mesh.vertices) == 0:
        return np.ones((size, size, 3), np.float32)
    R_ = rtk[:3, :3]
    T = rtk[:3, 3]
    K = rtk[3]
    cam = mesh.vertices @ R_.T + T
    x = cam[:, 0] / np.maximum(cam[:, 2], 1e-6) * K[0] + K[2]
    y = cam[:, 1] / np.maximum(cam[:, 2], 1e-6) * K[1] + K[3]
    verts_px = np.stack([x, y, cam[:, 2]], -1)

    colors = mesh.colors if mesh.colors is not None else np.full_like(mesh.vertices, 0.7)
    if shade:
        # per-vertex normal-based lambertian toning
        n = vertex_normals(mesh)
        n_cam = n @ R_.T
        light = np.clip(-n_cam[:, 2], 0.0, 1.0)[:, None]
        colors = colors * (0.4 + 0.6 * light)
    img, depth, mask = rasterize(verts_px, mesh.faces, colors, size, size)
    img = np.where(mask[..., None] > 0, img, 1.0)
    return img.astype(np.float32)


def mesh_silhouette(mesh: Mesh, rtk: np.ndarray, height: int, width: int) -> np.ndarray:
    """Binary mesh silhouette at (height, width) with camera rtk — the
    reference's refsil export source (render_vis.py:490,531-535 uses the
    pyrender depth mask; here the native z-buffer's coverage mask)."""
    if len(mesh.vertices) == 0:
        return np.zeros((height, width), np.float32)
    R_ = rtk[:3, :3]
    T = rtk[:3, 3]
    K = rtk[3]
    cam = mesh.vertices @ R_.T + T
    x = cam[:, 0] / np.maximum(cam[:, 2], 1e-6) * K[0] + K[2]
    y = cam[:, 1] / np.maximum(cam[:, 2], 1e-6) * K[1] + K[3]
    verts_px = np.stack([x, y, cam[:, 2]], -1)
    _, _, mask = rasterize(verts_px, mesh.faces,
                           np.ones((len(mesh.vertices), 1), np.float32),
                           height, width)
    return (mask > 0).astype(np.float32)


def vertex_normals(mesh: Mesh) -> np.ndarray:
    v, f = mesh.vertices, mesh.faces
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    n = np.zeros_like(v)
    for i in range(3):
        np.add.at(n, f[:, i], fn)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)


def render_turntable(mesh: Mesh, num_views: int = 36, size: int = 256,
                     cam_dist: Optional[float] = None) -> List[np.ndarray]:
    if len(mesh.vertices) == 0:
        return [np.ones((size, size, 3), np.float32)] * num_views
    center = mesh.vertices.mean(0)
    radius = np.linalg.norm(mesh.vertices - center, axis=-1).max()
    d = cam_dist or 3.0 * radius
    f = size  # ~53 deg fov
    frames = []
    for i in range(num_views):
        ang = 2 * np.pi * i / num_views
        c, s = np.cos(ang), np.sin(ang)
        R_ = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        T = -R_ @ center + np.asarray([0, 0, d], np.float32)
        rtk = np.zeros((4, 4), np.float32)
        rtk[:3, :3] = R_
        rtk[:3, 3] = T
        rtk[3] = [f, f, size / 2, size / 2]
        frames.append(render_mesh_view(mesh, rtk, size))
    return frames


def save_gif(path: str, frames: List[np.ndarray], fps: int = 10):
    import imageio

    imgs = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames]
    imageio.mimsave(path, imgs, duration=1000.0 / fps)


def draw_cams(rtks: np.ndarray, axis_len: float = 0.05) -> Mesh:
    """Camera-trajectory visualization mesh (utils/io.py:190-240 role):
    one small pyramid per camera at its center, colored by time."""
    verts, faces, colors = [], [], []
    n = len(rtks)
    for i, rtk in enumerate(rtks):
        R_ = rtk[:3, :3]
        T = rtk[:3, 3]
        center = -R_.T @ T
        # frustum: apex at center, base towards viewing dir (-z row of R)
        fwd = R_[2]
        up = R_[1]
        right = R_[0]
        base = center + fwd * axis_len * 2
        s = axis_len
        quad = [base + s * (up + right), base + s * (up - right),
                base + s * (-up - right), base + s * (-up + right)]
        vs = [center] + quad
        off = sum(len(v) for v in verts)
        verts.append(np.stack(vs))
        f = np.asarray([[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 1], [1, 2, 3], [1, 3, 4]])
        faces.append(f + off)
        t = i / max(n - 1, 1)
        col = np.asarray([t, 0.2, 1.0 - t])
        colors.append(np.tile(col, (5, 1)))
    return Mesh(np.concatenate(verts).astype(np.float32),
                np.concatenate(faces).astype(np.int32),
                np.concatenate(colors).astype(np.float32))

"""Mesh extraction: TPU grid SDF query -> host marching cubes -> cleanup,
plus forward/backward warping of meshes through the deformation model.

Re-design of train_utils.extract_mesh (train_utils.py:1364-1476) and the
warp helpers warp_bw/warp_fw (geom_utils.py:974-1073):
- the dense 3D grid is evaluated in one jitted, batched call (no 32k-point
  host chunking);
- marching cubes runs in the native C++ extension (moda_tpu/native);
- connected components use scipy's sparse graph tools instead of trimesh.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from moda_tpu.core import skinning as SK
from moda_tpu.fields.model import MoDAModel, ModelVars, Params
from moda_tpu.native import marching_cubes
from moda_tpu.render.rays import compute_bone_rts


@dataclass
class Mesh:
    """Minimal host-side triangle mesh (replaces trimesh for our needs)."""

    vertices: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    faces: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.int32))
    colors: Optional[np.ndarray] = None  # [V,3] float 0..1
    # density-grid diagnostic from extraction ("fraction occupied" print,
    # train_utils.py:1435-1440): share of grid cells above threshold
    frac_occupied: float = 0.0

    def export_obj(self, path: str):
        # vectorized text formatting: the per-line f-string loop cost
        # seconds per 10k-vert mesh on a 1-vCPU host (it runs every epoch
        # and once per frame at extraction)
        with open(path, "w") as f:
            if self.colors is not None:
                rows = np.concatenate(
                    [self.vertices, self.colors.astype(np.float32)], 1)
            else:
                rows = self.vertices
            np.savetxt(f, rows, fmt="v" + " %.6g" * rows.shape[1])
            if len(self.faces):
                np.savetxt(f, np.asarray(self.faces) + 1, fmt="f %d %d %d")

    @property
    def bounds(self) -> np.ndarray:
        if len(self.vertices) == 0:
            return np.zeros((2, 3), np.float32)
        return np.stack([self.vertices.min(0), self.vertices.max(0)])

    def copy(self) -> "Mesh":
        return Mesh(self.vertices.copy(), self.faces.copy(),
                    None if self.colors is None else self.colors.copy())


def largest_component(mesh: Mesh) -> Mesh:
    """Keep the largest connected component (use_cc, train_utils.py:1447-1451)."""
    if len(mesh.faces) == 0:
        return mesh
    V = len(mesh.vertices)
    e = np.concatenate([mesh.faces[:, [0, 1]], mesh.faces[:, [1, 2]], mesh.faces[:, [2, 0]]])
    adj = sp.coo_matrix((np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(V, V))
    n_comp, labels = csgraph.connected_components(adj, directed=False)
    if n_comp <= 1:
        return mesh
    keep = np.argmax(np.bincount(labels, minlength=n_comp))
    vmask = labels == keep
    remap = -np.ones(V, np.int64)
    remap[vmask] = np.arange(vmask.sum())
    fmask = vmask[mesh.faces].all(-1)
    return Mesh(
        vertices=mesh.vertices[vmask],
        faces=remap[mesh.faces[fmask]].astype(np.int32),
        colors=None if mesh.colors is None else mesh.colors[vmask],
    )


def make_grid_query(model: MoDAModel):
    """Jitted dense SDF(+visibility) evaluation over a [G^3,3] point set."""
    model = model.precise()  # extraction is fp32/XLA (bit-compat eval path)

    @partial(jax.jit, static_argnames=("symm",))
    def query(params: Params, pts: jnp.ndarray, symm: bool = False):
        if symm:
            pts_in = jnp.concatenate([jnp.abs(pts[..., :1]), pts[..., 1:]], -1)
        else:
            pts_in = pts
        e = model.embed_xyz(pts_in)
        raw = model.apply_coarse(params, e, sigma_only=True)[..., 0]
        vis = jax.nn.sigmoid(model.apply_vis(params, model.embed_xyz(pts))[..., 0]) \
            if model.cfg.nerf_vis else jnp.ones_like(raw)
        return raw, vis

    return query


def extract_mesh(model: MoDAModel, params: Params, obj_bound: np.ndarray,
                 grid_size: int, threshold: float, use_vis: bool = True,
                 query=None, mesh=None) -> Mesh:
    """Canonical-shape extraction (train_utils.py:1364-1465). mesh: an
    optional jax device mesh with a 'data' axis; the [G^3] grid-point axis
    is sharded over it (multi-device extraction, VERDICT r4 #9)."""
    if query is None:
        query = make_grid_query(model)
    b = np.asarray(obj_bound, np.float32)
    axes = [np.linspace(-b[i], b[i], grid_size, dtype=np.float32) for i in range(3)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    pts_dev = jnp.asarray(pts)
    if mesh is not None and pts.shape[0] % mesh.size == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P
        pts_dev = jax.device_put(pts_dev, NamedSharding(mesh, P("data")))
    raw, vis = query(params, pts_dev, symm=model.cfg.symm_shape)
    vol = np.asarray(raw).reshape(grid_size, grid_size, grid_size)
    if use_vis and model.cfg.nerf_vis:
        visv = np.asarray(vis).reshape(vol.shape)
        vol = np.where(visv < 0.5, -1.0, vol)

    frac = float((vol > threshold).mean())
    verts, tris = marching_cubes(vol.astype(np.float32), float(threshold))
    if len(verts) == 0:
        return Mesh(frac_occupied=frac)
    # voxel -> object coords (matching (v - G/2)/G * 2 * bound)
    verts = (verts - grid_size / 2.0) / grid_size * 2.0 * b[None, :]
    mesh = Mesh(vertices=verts.astype(np.float32), faces=tris,
                frac_occupied=frac)
    if model.cfg.use_cc:
        mesh = largest_component(mesh)
        mesh.frac_occupied = frac
    # canonical-location colors (train_utils.py:1453-1465)
    if len(mesh.vertices) > 0:
        vmin = mesh.vertices.min(0, keepdims=True)
        vlen = np.maximum(mesh.vertices.max(0, keepdims=True) - vmin, 1e-9)
        mesh.colors = (mesh.vertices - vmin) / vlen
    return mesh


def make_warp_fw(model: MoDAModel):
    """Jitted canonical->frame vertex warp (warp_fw, geom_utils.py:1029-1073)."""

    @jax.jit
    def warp(params: Params, verts: jnp.ndarray, frameid: jnp.ndarray):
        bones_rst, bone_rts = compute_bone_rts(model, params, frameid[None])
        rest_code = model.apply_rest_pose_code(params, jnp.zeros((1,), jnp.int32))
        pts = verts[None]  # [1,V,3]
        skin_aux = params["skin_aux"]
        xyz_e = model.embed_xyz(pts)
        dskin = None
        if model.cfg.nerf_skin:
            code = jnp.broadcast_to(rest_code[:, None, :], pts.shape[:-1] + (rest_code.shape[-1],))
            dskin = model.apply_skin(params, jnp.concatenate([xyz_e, code], -1))
        skin_fw = SK.skinning_weights(bones_rst[None], pts, dskin, skin_aux[0])
        if model.cfg.neudbs:
            out, bones_dfm = SK.neu_dbs(bones_rst[None], bone_rts, skin_fw, pts, backward=False)
        else:
            out, bones_dfm = SK.lbs(bones_rst[None], bone_rts, skin_fw, pts, backward=False)
        return out[0], bones_dfm[0]

    return warp


def make_warp_fw_frames(model: MoDAModel, mesh=None):
    """Frame-parallel canonical->frame vertex warp: one jitted call warps
    the rest mesh to F frames at once, with the frame axis sharded over the
    device mesh when one is given (SURVEY §2.3 "pmap over frames"; the
    reference parallelizes extraction only by pinning one GPU per process,
    scripts/render_mgpu.sh). Returns warp(params, verts [V,3],
    frameids [F]) -> (verts_dfm [F,V,3], bones_dfm [F,B,10|...])."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("data")) if mesh is not None else None

    @jax.jit
    def warp(params: Params, verts: jnp.ndarray, frameids: jnp.ndarray):
        bones_rst, bone_rts = compute_bone_rts(model, params, frameids)
        rest_code = model.apply_rest_pose_code(params, jnp.zeros((1,), jnp.int32))
        F = frameids.shape[0]
        pts = jnp.broadcast_to(verts[None], (F,) + verts.shape)  # [F,V,3]
        skin_aux = params["skin_aux"]
        dskin = None
        if model.cfg.nerf_skin:
            xyz_e = model.embed_xyz(pts)
            code = jnp.broadcast_to(rest_code[:, None, :],
                                    pts.shape[:-1] + (rest_code.shape[-1],))
            dskin = model.apply_skin(params, jnp.concatenate([xyz_e, code], -1))
        bones_rst_f = jnp.broadcast_to(bones_rst[None], (F,) + bones_rst.shape)
        skin_fw = SK.skinning_weights(bones_rst_f, pts, dskin, skin_aux[0])
        if model.cfg.neudbs:
            out, bones_dfm = SK.neu_dbs(bones_rst_f, bone_rts, skin_fw, pts,
                                        backward=False)
        else:
            out, bones_dfm = SK.lbs(bones_rst_f, bone_rts, skin_fw, pts,
                                    backward=False)
        return out, bones_dfm

    if shard is None:
        return warp

    def warp_sharded(params, verts, frameids):
        frameids = jax.device_put(jnp.asarray(frameids), shard)
        return warp(params, verts, frameids)

    return warp_sharded


def make_warp_bw(model: MoDAModel):
    """Jitted frame->canonical point warp (warp_bw, geom_utils.py:974-1027)."""

    @jax.jit
    def warp(params: Params, pts_frame: jnp.ndarray, frameid: jnp.ndarray):
        bones_rst, bone_rts = compute_bone_rts(model, params, frameid[None])
        time_code = model.apply_pose_code(params, frameid[None])
        pts = pts_frame[None]
        skin_aux = params["skin_aux"]
        if model.cfg.neudbs:
            bones_dfm = SK.bone_transform_dq(bones_rst, bone_rts)
        else:
            bones_dfm = SK.bone_transform_rts(bones_rst, bone_rts)
        dskin = None
        if model.cfg.nerf_skin:
            xyz_e = model.embed_xyz(pts)
            code = jnp.broadcast_to(time_code[:, None, :], pts.shape[:-1] + (time_code.shape[-1],))
            dskin = model.apply_skin(params, jnp.concatenate([xyz_e, code], -1))
        skin_bw = SK.skinning_weights(bones_dfm, pts, dskin, skin_aux[0])
        if model.cfg.neudbs:
            out, _ = SK.neu_dbs(bones_rst[None], bone_rts, skin_bw, pts, backward=True)
        else:
            out, _ = SK.lbs(bones_rst[None], bone_rts, skin_bw, pts, backward=True)
        return out[0]

    return warp


def skin_colors(model: MoDAModel, params: Params, mesh: Mesh) -> np.ndarray:
    """Color rest mesh by argmax skinning weight (train_utils.py:567-591)."""
    bones_rst, _ = compute_bone_rts(model, params, jnp.zeros((1,), jnp.int32))
    rest_code = model.apply_rest_pose_code(params, jnp.zeros((1,), jnp.int32))
    pts = jnp.asarray(mesh.vertices)[None]
    dskin = None
    if model.cfg.nerf_skin:
        xyz_e = model.embed_xyz(pts)
        code = jnp.broadcast_to(rest_code[:, None, :], pts.shape[:-1] + (rest_code.shape[-1],))
        dskin = model.apply_skin(params, jnp.concatenate([xyz_e, code], -1))
    skin = np.asarray(SK.skinning_weights(bones_rst[None], pts, dskin, params["skin_aux"][0]))[0]
    B = skin.shape[-1]
    rng = np.random.default_rng(0)
    cmap = rng.uniform(0.1, 1.0, size=(B, 3))
    return (skin @ cmap).astype(np.float32)


def radiance_colors(model: MoDAModel, params: Params, mesh: Mesh,
                    frameid: int, view_dir: np.ndarray,
                    env_frameid: int | None = None) -> np.ndarray:
    """Vertex colors from the radiance field (ce_color=False path,
    train_utils.py:538-546 + get_vertex_colors): evaluate the coarse MLP's
    rgb branch at the canonical vertices with the frame's env code and the
    given viewing directions. view_dir [V,3] (unnormalized ok)."""
    import jax.numpy as jnp

    v = jnp.asarray(mesh.vertices)
    d = jnp.asarray(view_dir)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    xyz_e = model.embed_xyz(v)
    dir_e = model.embed_dir(d)
    feats = [xyz_e, dir_e]
    if model.cfg.env_code:
        env = model.apply_env_code(params, jnp.asarray([env_frameid or frameid]))
        feats.append(jnp.broadcast_to(env, (v.shape[0], env.shape[-1])))
    if model.cfg.appearance_code:
        app = model.apply_appearance_code(params, jnp.asarray([frameid]))
        feats.append(jnp.broadcast_to(app, (v.shape[0], app.shape[-1])))
    out = model.apply_coarse(params, jnp.concatenate(feats, -1))
    return np.asarray(out[..., :3])

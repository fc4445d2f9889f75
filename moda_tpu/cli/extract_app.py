"""Mesh/camera extraction entry point — the reference's extract.py.

Loads a checkpoint, extracts the canonical mesh, forward-warps it to each
requested frame (queryfw route, train_utils.py:1467-1473), renders eval
images and writes per-frame .obj + camera .txt files
(extract.py:24-136's save_output layout).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def parse_test_frames(spec: str, offsets) -> list:
    """test_frames syntax (utils/io.py str_to_frame): '{0,1}' = videos,
    'N' = N frames evenly spaced."""
    total = offsets[-1]
    if spec.startswith("{"):
        idx = []
        for v in spec[1:-1].split(","):
            v = int(v)
            idx += list(range(offsets[v], offsets[v + 1] - 1))
        return idx
    n = int(spec)
    return list(np.linspace(0, total - 1, min(n, total), dtype=int))


def main(argv=None):
    from moda_tpu.runtime import setup_jax
    setup_jax()

    import jax
    import jax.numpy as jnp

    from moda_tpu.cli.flags import parse_config
    from moda_tpu.config import DataInfo, load_seq_config
    from moda_tpu.data.dataset import build_datasets, data_offsets
    from moda_tpu.extract.mesh import (Mesh, extract_mesh, make_warp_fw_frames,
                                       skin_colors)
    from moda_tpu.render.evalrender import make_frame_renderer
    from moda_tpu.train.trainer import Trainer

    cfg = parse_config(argv)
    datasets = build_datasets(cfg.seqname, cfg.img_size, cfg.config_dir,
                              rtk_base=cfg.rtk_path or None)
    offsets = data_offsets(datasets)
    intrinsics = [tuple(s.ks) for s in load_seq_config(cfg.seqname, cfg.config_dir)]
    info = DataInfo(offset=offsets, intrinsics=tuple(intrinsics))

    trainer = Trainer(cfg, info, loader=None)
    assert cfg.model_path, "--model_path required for extraction"

    out_dir = os.path.join(cfg.checkpoint_dir, cfg.logname + "-export")
    os.makedirs(out_dir, exist_ok=True)

    # frame-parallel device work over all local devices (VERDICT r4 #9;
    # the reference's analogue is one-GPU-per-process render_mgpu.sh)
    dev_mesh = trainer.mesh  # 1-axis 'data' mesh, or None single-device

    mesh_rest = extract_mesh(trainer.model, trainer.params,
                             trainer.latest_vars["obj_bound"], cfg.sample_grid3d,
                             cfg.mc_threshold, use_vis=not cfg.full_mesh,
                             mesh=dev_mesh)
    mesh_rest.export_obj(os.path.join(out_dir, f"{cfg.seqname}-mesh-rest.obj"))
    if (cfg.lbs or cfg.neudbs) and len(mesh_rest.vertices) > 0:
        skin_mesh = mesh_rest.copy()
        skin_mesh.colors = skin_colors(trainer.model, trainer.params, mesh_rest)
        skin_mesh.export_obj(os.path.join(out_dir, f"{cfg.seqname}-mesh-skin.obj"))

    warp_fw_frames = make_warp_fw_frames(trainer.model, mesh=dev_mesh)
    renderer = make_frame_renderer(trainer.model, cfg.render_size, cfg.ndepth,
                                   chunk=cfg.chunk, mesh=dev_mesh)
    idx_render = parse_test_frames(cfg.test_frames, offsets)
    rs = cfg.render_size

    # warp the rest mesh to every requested frame in device-mesh-sized
    # groups: one jitted call per group, frame axis sharded over devices
    warped: dict = {}
    if cfg.queryfw and len(mesh_rest.vertices) > 0:
        G = (dev_mesh.size if dev_mesh is not None else 1) * 4
        verts_dev = jnp.asarray(mesh_rest.vertices)
        for g0 in range(0, len(idx_render), G):
            group = list(idx_render[g0:g0 + G])
            padded = group + [group[-1]] * (G - len(group))
            verts_dfm, _ = warp_fw_frames(trainer.params, verts_dev,
                                          jnp.asarray(padded, jnp.int32))
            verts_np = np.asarray(verts_dfm)
            for j, fi in enumerate(group):
                warped[fi] = verts_np[j]

    rgb_frames, sil_frames = [], []
    raw_shapes = [None] * len(datasets)
    for fi in idx_render:
        if fi in warped:
            mesh_i = Mesh(warped[fi], mesh_rest.faces, mesh_rest.colors)
        else:
            mesh_i = mesh_rest
        mesh_i.export_obj(os.path.join(out_dir, f"{cfg.seqname}-mesh-{fi:05d}.obj"))
        rtk = trainer.latest_vars["rtk"][fi].copy()
        rtk[:3, 3] *= trainer.model.obj_scale
        np.savetxt(os.path.join(out_dir, f"{cfg.seqname}-cam-{fi:05d}.txt"), rtk)
        # camera trajectory + reference silhouette for the NVS tool
        # (render_vis.py:501-535: ctraj = [R|T ; scaled K], refsil = mesh mask)
        if len(mesh_i.vertices) > 0:
            import cv2
            from moda_tpu.viz.render_vis import mesh_silhouette
            di = int(np.searchsorted(np.asarray(offsets), fi, side="right")) - 1
            sub = fi - offsets[di]
            if raw_shapes[di] is None:
                m = cv2.imread(datasets[di].reader.paths.masklist[0], 0)
                raw_shapes[di] = m.shape if m is not None else (rs, rs)
            H0, W0 = raw_shapes[di]
            sc = min(1.0, 512.0 / max(H0, W0))
            H1, W1 = max(int(H0 * sc), 1), max(int(W0 * sc), 1)
            # model-unit camera (consistent with the exported meshes and the
            # NeRF NVS renderer); row 3 = raw intrinsics rescaled to sil size
            ctraj = trainer.latest_vars["rtk"][fi].copy()
            ctraj[3] = ctraj[3] * sc
            sil = mesh_silhouette(mesh_i, ctraj, H1, W1)
            np.savetxt(os.path.join(out_dir, f"{cfg.seqname}-ctrajs-{fi:05d}.txt"), ctraj)
            cv2.imwrite(os.path.join(out_dir, f"{cfg.seqname}-refsil-{fi:05d}.png"),
                        (sil * 128).astype(np.uint8))
        # per-frame renders (extract.py save_output rgb/sil images + gifs)
        if trainer.latest_vars["idk"][fi] > 0:
            rtk_d = jnp.asarray(trainer.latest_vars["rtk"][fi])[None]
            px, py = float(rtk_d[0, 3, 2]), float(rtk_d[0, 3, 3])
            kaug = jnp.asarray([[max(2 * px / rs, 1e-6), max(2 * py / rs, 1e-6),
                                 0.0, 0.0]])
            out = renderer(trainer.params, trainer.mvars, rtk_d, kaug,
                           jnp.asarray([fi]), jnp.zeros((1,), jnp.int32))
            rgb_frames.append(np.clip(out["img_coarse"], 0, 1))
            sil_frames.append(np.repeat(np.clip(out["sil_coarse"], 0, 1), 3, -1))
    if rgb_frames:
        from moda_tpu.viz.render_vis import save_gif
        save_gif(os.path.join(out_dir, f"{cfg.seqname}-rgb.gif"), rgb_frames)
        save_gif(os.path.join(out_dir, f"{cfg.seqname}-sil.gif"), sil_frames)
    print(f"exported {len(idx_render)} frames to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])

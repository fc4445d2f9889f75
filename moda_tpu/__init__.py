"""moda_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for modeling
deformable 3D objects from casual videos.

Re-designed from scratch with the capabilities of the MoDA reference
(neural dual-quaternion blend skinning over a canonical neural SDF,
optimized from monocular RGB video), but architected TPU-first:

- ``core``     pure-JAX math: quaternions, dual quaternions, SE(3), cameras,
               positional embeddings, skinning, volume sampling/compositing.
- ``fields``   flax network zoo: NeRF MLPs, pose heads, frame codes.
- ``render``   the fused, fully-jitted ray-rendering + loss pipeline.
- ``ops``      Pallas TPU kernels and numeric ops (chamfer, k-means, sinkhorn).
- ``data``     the pixel-line data pipeline (host-side, fixed-shape batches).
- ``train``    pjit train step, 22-group optimizer, schedule engine, trainer.
- ``parallel`` device-mesh / sharding helpers.
- ``extract``  mesh extraction (TPU grid query + host marching cubes).
- ``evals``    AMA evaluation: chamfer/f-score/ICP/sim3 root-pose error.
"""

__version__ = "0.1.0"

from moda_tpu.core import quat, dualquat, se3, camera, embedding, skinning, sampling, density

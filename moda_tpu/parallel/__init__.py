from moda_tpu.parallel import mesh

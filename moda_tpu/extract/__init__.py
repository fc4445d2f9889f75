from moda_tpu.extract import mesh

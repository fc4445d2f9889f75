from moda_tpu.render import pipeline, rays, losses

from moda_tpu.ops import sinkhorn, chamfer, kmeans

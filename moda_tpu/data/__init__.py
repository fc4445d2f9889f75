from moda_tpu.data import pfm, frames, dataset, synthetic

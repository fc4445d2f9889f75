from moda_tpu.fields import nets, model

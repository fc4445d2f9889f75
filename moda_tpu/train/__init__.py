from moda_tpu.train import optim, schedule, step

from moda_tpu.evals import ama, icp, sim3

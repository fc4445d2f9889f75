import numpy as np
import jax
import jax.numpy as jnp

from moda_tpu.ops.pallas_sinkhorn import sinkhorn_lowrank


def reference_sinkhorn(feats, vol, eps=0.03, iters=20):
    K = np.exp(-(1.0 - feats @ vol.T) / eps)
    n, m = K.shape
    a = np.full((n, 1), 1.0 / n)
    for _ in range(iters):
        b = (1.0 / m) / (K.T @ a + 1e-8)
        a = (1.0 / n) / (K @ b + 1e-8)
    b = (1.0 / m) / (K.T @ a + 1e-8)
    return a, b


def test_pallas_sinkhorn_matches_dense(rng):
    N, M = 64, 200  # M not a tile multiple -> exercises padding mask
    feats = rng.normal(size=(N, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    vol = rng.normal(size=(M, 16)).astype(np.float32)
    vol /= np.linalg.norm(vol, axis=-1, keepdims=True)

    a_ref, b_ref = reference_sinkhorn(feats, vol)
    a, b = sinkhorn_lowrank(jnp.asarray(feats), jnp.asarray(vol),
                            tile_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(a), a_ref, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=2e-3)

    # transport plan rows normalize to a valid distribution
    K = np.exp(-(1.0 - feats @ vol.T) / 0.03)
    T = np.asarray(a) * K * np.asarray(b).T
    prob = T / T.sum(-1, keepdims=True)
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-5)

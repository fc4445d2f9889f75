"""Flat scatter-matmul positional embedding vs the naive [F,2,C] form
(nerf.py:13-75 transcription): identical layout, values, and gradients.
"""
import numpy as np
import jax
import jax.numpy as jnp

from moda_tpu.core import embedding as E


def test_flat_embedding_matches_naive(rng):
    x = jnp.asarray(rng.normal(size=(7, 5, 3)).astype(np.float32))
    for alpha in (None, 3.7, 10.0):
        for logscale in (True, False):
            a = E.positional_embed(x, 10, alpha=alpha, logscale=logscale)
            b = E.positional_embed_naive(x, 10, alpha=alpha, logscale=logscale)
            assert a.shape == b.shape == (7, 5, 63)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    g1 = jax.grad(lambda v: (E.positional_embed(v, 6, alpha=4.2) ** 2).sum())(x)
    g2 = jax.grad(lambda v: (E.positional_embed_naive(v, 6, alpha=4.2) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-5)


def test_flat_embedding_dim_and_passthrough(rng):
    x = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
    out = E.positional_embed(x, 4)
    assert out.shape == (4, E.embed_dim(2, 4))
    np.testing.assert_allclose(np.asarray(out[:, :2]), np.asarray(x))
    assert E.positional_embed(x, 0) is x

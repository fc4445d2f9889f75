"""Entropic optimal transport (Sinkhorn) in pure JAX.

Replaces two external dependencies of the reference:
- geomloss.SamplesLoss("sinkhorn", p=2, blur=.05) for the bone-location
  regularizer (moda.py:693-696) -> ``sinkhorn_divergence``;
- the inline 20-iteration matching OT in feat_match
  (loss_utils.py:344-381) lives in render/pipeline.py.

Log-domain updates for stability; fixed iteration counts (static shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _cost_p2(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Halved squared euclidean cost C_ij = |x_i - y_j|^2 / 2 (geomloss p=2)."""
    sq = jnp.sum(x * x, -1)[:, None] + jnp.sum(y * y, -1)[None, :] - 2.0 * x @ y.T
    return 0.5 * jnp.maximum(sq, 0.0)


def _sinkhorn_potentials(C, a_log, b_log, eps, iters):
    """Log-domain Sinkhorn; returns potentials (f [n], g [m])."""
    f = jnp.zeros(C.shape[0], C.dtype)
    g = jnp.zeros(C.shape[1], C.dtype)

    def body(_, fg):
        f, g = fg
        g = -eps * jax.nn.logsumexp((f[:, None] - C) / eps + a_log[:, None], axis=0)
        f = -eps * jax.nn.logsumexp((g[None, :] - C) / eps + b_log[None, :], axis=1)
        return f, g

    # unroll: per-trip loop bookkeeping on TPU rivals the [25,1000]
    # logsumexps themselves; 10x fewer trips, same math
    return jax.lax.fori_loop(0, iters, body, (f, g),
                             unroll=min(10, iters))


def ot_cost(x, y, eps=0.0025, iters=50):
    """<pi, C> under entropic OT with uniform marginals."""
    n, m = x.shape[0], y.shape[0]
    a_log = jnp.full((n,), -jnp.log(n))
    b_log = jnp.full((m,), -jnp.log(m))
    C = _cost_p2(x, y)
    f, g = _sinkhorn_potentials(C, a_log, b_log, eps, iters)
    return jnp.sum(jnp.exp(a_log) * f) + jnp.sum(jnp.exp(b_log) * g)


def sinkhorn_divergence(x, y, blur=0.05, iters=50):
    """Debiased sinkhorn divergence S_eps = OT(x,y) - (OT(x,x)+OT(y,y))/2.

    Matches geomloss.SamplesLoss("sinkhorn", p=2, blur) semantics closely
    enough for the bone regularizer (eps = blur^p)."""
    eps = blur ** 2
    return (
        ot_cost(x, y, eps, iters)
        - 0.5 * ot_cost(x, x, eps, iters)
        - 0.5 * ot_cost(y, y, eps, iters)
    )

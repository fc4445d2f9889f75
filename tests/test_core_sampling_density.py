import numpy as np
import jax
import jax.numpy as jnp

from moda_tpu.core import sampling as S
from moda_tpu.core import density as D


def test_stratified_zvals_bounds():
    near = jnp.full((4, 1), 1.0)
    far = jnp.full((4, 1), 5.0)
    z = np.asarray(S.stratified_zvals(near, far, 16, None, perturb=0.0))
    assert z.shape == (4, 16)
    np.testing.assert_allclose(z[:, 0], 1.0)
    np.testing.assert_allclose(z[:, -1], 5.0)
    assert (np.diff(z, axis=-1) > 0).all()

    zp = np.asarray(S.stratified_zvals(near, far, 16, jax.random.key(0), perturb=1.0))
    assert (zp >= 1.0 - 1e-5).all() and (zp <= 5.0 + 1e-5).all()
    assert (np.diff(zp, axis=-1) > 0).all()


def test_sample_pdf_uniform_weights_gives_uniform():
    n_rays, n_bins = 3, 15
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_bins + 1), (n_rays, n_bins + 1))
    weights = jnp.ones((n_rays, n_bins))
    out = np.asarray(S.sample_pdf(bins, weights, 32, None, det=True))
    # deterministic + uniform weights -> approximately evenly spaced in [0,1]
    assert out.shape == (n_rays, 32)
    assert (np.diff(out, axis=-1) >= -1e-6).all()
    np.testing.assert_allclose(out[:, 0], 0.0, atol=0.05)
    np.testing.assert_allclose(out[:, -1], 1.0, atol=0.05)


def test_sample_pdf_concentrates_on_peak():
    n_rays, n_bins = 2, 20
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_bins + 1), (n_rays, n_bins + 1))
    w = np.full((n_rays, n_bins), 1e-4, np.float32)
    w[:, 10] = 100.0  # peak near bin 10 -> z ~ 0.5
    out = np.asarray(S.sample_pdf(bins, jnp.asarray(w), 64, jax.random.key(1), det=False))
    frac_near_peak = ((out > 0.45) & (out < 0.60)).mean()
    assert frac_near_peak > 0.9


def test_sdf_to_sigma_monotone_and_midpoint():
    beta = jnp.asarray(0.1)
    raw = jnp.linspace(-5, 5, 101)  # raw = -sdf
    sigma = np.asarray(D.sdf_to_sigma(raw, beta))
    assert (np.diff(sigma) >= -1e-6).all()  # sigma increases with raw (=inside)
    # at sdf==0, sigma = 0.5 * ibeta
    mid = np.asarray(D.sdf_to_sigma(jnp.asarray(0.0), beta))
    np.testing.assert_allclose(mid, 0.5 / 0.1, rtol=1e-5)


def test_compositing_weights_opaque_surface():
    """A single huge-density sample gets all the weight."""
    sigmas = np.zeros((1, 10), np.float32)
    sigmas[0, 4] = 1e5
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 10), (1, 10))
    deltas = D.ray_deltas(z, jnp.asarray([[0.0, 0.0, 1.0]]))
    alphas, weights, vis = D.compositing_weights(jnp.asarray(sigmas), deltas)
    w = np.asarray(weights)
    assert w[0, 4] > 0.99
    assert w[0, :4].sum() < 1e-3
    # visibility drops to ~0 after the surface
    assert np.asarray(vis)[0, 5] < 1e-3


def test_compositing_weights_sum_le_one(rng):
    sigmas = jnp.asarray(np.abs(rng.normal(size=(6, 32))).astype(np.float32))
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 32), (6, 32))
    deltas = D.ray_deltas(z, jnp.ones((6, 3)))
    _, weights, _ = D.compositing_weights(sigmas, deltas)
    total = np.asarray(weights).sum(-1)
    assert (total <= 1.0 + 1e-4).all()


def test_sdf_to_sigma_beta_floor():
    """Learned beta below the sample-spacing floor must not zero the
    density field (the irrecoverable-collapse guard)."""
    import jax.numpy as jnp
    from moda_tpu.core.density import sdf_to_sigma
    raw = jnp.linspace(-0.05, 0.05, 11)
    tiny = sdf_to_sigma(raw, jnp.asarray(9e-4))
    floored = sdf_to_sigma(raw, jnp.asarray(2e-3))
    np.testing.assert_allclose(np.asarray(tiny), np.asarray(floored))
    assert float(tiny.max()) > 1.0  # inside-surface density alive (~1/beta)
    # above the floor the transform is untouched (reference parity regime)
    a = sdf_to_sigma(raw, jnp.asarray(0.05))
    ib = 1 / 0.05
    sdf = -np.asarray(raw)
    expect = (0.5 + 0.5 * np.sign(sdf) * np.expm1(-np.abs(sdf) * ib)) * ib
    np.testing.assert_allclose(np.asarray(a), expect, rtol=1e-5)


def test_sample_pdf_matches_searchsorted_oracle(rng):
    """The gather-free masked-reduction lookup must reproduce the
    reference's searchsorted+take_along_axis semantics exactly
    (rendering.py:582-623), including endpoint/tie edges."""
    N, M, NI = 33, 17, 21
    bins = np.sort(rng.uniform(0.1, 2.0, size=(N, M)).astype(np.float32), -1)
    w = rng.uniform(0.0, 1.0, size=(N, M - 1)).astype(np.float32)
    w[0] = 0.0            # all-zero weights -> uniform via eps
    w[1, :3] = 100.0      # sharp peak -> many ties in cdf after eps
    for det in (True, False):
        key = None if det else jax.random.key(3)
        got = np.asarray(S.sample_pdf(jnp.asarray(bins), jnp.asarray(w), NI, key, det=det))
        # numpy oracle (reference semantics)
        eps = 1e-5
        ww = w + eps
        pdf = ww / ww.sum(-1, keepdims=True)
        cdf = np.concatenate([np.zeros((N, 1), np.float32), np.cumsum(pdf, -1)], -1)
        if det:
            u = np.broadcast_to(np.linspace(0, 1, NI, dtype=np.float32), (N, NI))
        else:
            u = np.asarray(jax.random.uniform(key, (N, NI), dtype=jnp.float32))
        inds = np.stack([np.searchsorted(c, uu, side="right") for c, uu in zip(cdf, u)])
        below = np.clip(inds - 1, 0, M - 1)
        above = np.clip(inds, 0, M - 1)
        cdf_b = np.take_along_axis(cdf, below, -1)
        cdf_a = np.take_along_axis(cdf, above, -1)
        bins_b = np.take_along_axis(bins, np.clip(below, 0, M - 1), -1)
        bins_a = np.take_along_axis(bins, np.clip(above, 0, M - 1), -1)
        denom = cdf_a - cdf_b
        denom = np.where(denom < eps, 1.0, denom)
        want = bins_b + (u - cdf_b) / denom * (bins_a - bins_b)
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"det={det}")

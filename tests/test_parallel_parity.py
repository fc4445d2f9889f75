"""Sharded vs single-device training-step parity.

The reference's DDP all-reduces gradients across ranks
(nnutils/train_utils.py:958); the TPU-native equivalent is XLA inserting
collectives during SPMD partitioning of the jitted step. jit semantics
are device-count invariant, so the SAME step on the SAME inputs must
produce the same updated params whether the batch axis is sharded over
the 8-virtual-device mesh or everything lives on one device — up to
reduction order.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import __graft_entry__ as G
from moda_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from moda_tpu.train.optim import MoDAOptimizer
from moda_tpu.train.step import StepExtras, make_train_step


def _extras():
    return StepExtras(
        progress=jnp.asarray(0.5), loss_select=jnp.asarray(1),
        root_update=jnp.asarray(1.0), body_update=jnp.asarray(1.0),
        shape_update=jnp.asarray(0.0), cvf_update=jnp.asarray(0.0),
        sil_err_median=jnp.asarray(1e9),
        shape_samp=jnp.zeros((64, 3)), shape_samp_valid=jnp.asarray(0.0),
        embed_alpha=jnp.asarray(10.0),
    )


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU backend (conftest)")
    # ft2-shaped program: fine pass + active sampling (global top_k over
    # the sharded ray axis) + grad accumulation — the partitioning-
    # sensitive ops named in VERDICT round-2 #5
    cfg, model, params, mvars = G._tiny_setup(lineload=True)
    batch = G._tiny_batch(cfg, n_pairs=8, lineload=True, seed=3)
    opt = MoDAOptimizer(cfg, total_steps=100)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, nsample=2, ndepth=cfg.ndepth,
                           use_fine=True, use_dskin=True, use_bones=True,
                           nsample_active=2, donate=False, accu_steps=2)
    key = jax.random.key(7)
    extras = _extras()

    # single device: everything on devices[0]
    d0 = jax.devices()[0]
    put0 = lambda t: jax.tree_util.tree_map(lambda x: jax.device_put(x, d0), t)
    p1, o1, aux1, _ = step(put0(params), put0(opt_state), put0(mvars),
                           put0(batch), put0(extras), key)
    loss1 = float(aux1["total_loss"])

    # 8-device mesh: batch axis sharded, state replicated
    mesh = make_mesh(8)
    with mesh:
        p8, o8, aux8, _ = step(
            replicate(params, mesh), replicate(opt_state, mesh),
            replicate(mvars, mesh), shard_batch(batch, mesh),
            replicate(extras, mesh), key)
    loss8 = float(aux8["total_loss"])

    assert np.isfinite(loss1) and np.isfinite(loss8)
    assert abs(loss1 - loss8) <= 1e-4 * max(1.0, abs(loss1)), (loss1, loss8)

    # Per-group PRE-CLIP gradient norms (aux "*_g") are the discriminating
    # check: Adam's first step is invariant to gradient scale, so a
    # mis-scaled collective (sum-vs-mean psum, double-counted microbatch)
    # would leave updated params looking fine while the grad norms shift
    # by exactly that factor. Reduction-order noise moves norms ~1e-6 rel.
    for k in aux1:
        if not k.endswith("_g"):
            continue
        n1, n8 = float(aux1[k]), float(aux8[k])
        assert abs(n1 - n8) <= 5e-3 * max(n1, n8, 1e-3), (k, n1, n8)

    # Updated params: Adam's per-component step is bounded by ~lr (and at
    # step 1 equals lr*sign(g)), so components whose true grad is ~0 flip
    # sign under a different reduction order and land 2*lr apart — that is
    # float noise, not divergence. Gate at 4*lr absolute instead of rel.
    atol = 4.0 * float(aux1["lr"]) + 1e-7
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    assert len(flat1) == len(flat8)
    worst = 0.0
    for a, b in zip(flat1, flat8):
        worst = max(worst, float(np.abs(np.asarray(a) - np.asarray(b)).max()))
    assert worst < atol, f"params diverged: max abs diff {worst} > {atol}"

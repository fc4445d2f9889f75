"""Chunked dispatch (lax.scan over K optimizer steps) must reproduce K
sequential single-step dispatches exactly: same batches, same keys, same
per-step schedule scalars => same params. The chunk exists purely to
amortize the remote-TPU round trips (config.steps_chunk); it must not
change training semantics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import __graft_entry__ as G
from moda_tpu.train.optim import MoDAOptimizer
from moda_tpu.train.step import CHUNK_STEP_FIELDS, StepExtras, make_train_step


def _extras(progress):
    return StepExtras(
        progress=jnp.asarray(progress), loss_select=jnp.asarray(1),
        root_update=jnp.asarray(1.0), body_update=jnp.asarray(1.0),
        shape_update=jnp.asarray(0.0), cvf_update=jnp.asarray(0.0),
        sil_err_median=jnp.asarray(1e9),
        shape_samp=jnp.zeros((64, 3)), shape_samp_valid=jnp.asarray(0.0),
        embed_alpha=jnp.asarray(10.0),
    )


@pytest.mark.slow
def test_chunked_step_matches_sequential():
    K = 2
    cfg, model, params, mvars = G._tiny_setup()
    opt = MoDAOptimizer(cfg, total_steps=100)
    opt_state = opt.init(params)
    kw = dict(nsample=2, ndepth=cfg.ndepth, use_fine=False, use_dskin=True,
              use_bones=True, donate=False)
    step1 = make_train_step(model, opt, **kw)
    stepK = make_train_step(model, opt, **kw, chunk_steps=K)

    batches = [G._tiny_batch(cfg, n_pairs=2, seed=s) for s in (0, 1)]
    keys = [jax.random.key(5), jax.random.key(6)]
    progs = [0.4, 0.5]

    # sequential reference
    p, o = params, opt_state
    seq_loss, seq_lr, aux1 = [], [], None
    for b, k, pr in zip(batches, keys, progs):
        p, o, aux, _ = step1(p, o, mvars, b, _extras(pr), k)
        seq_loss.append(float(aux["total_loss"]))
        seq_lr.append(float(aux["lr"]))
        if aux1 is None:
            aux1 = {kk: float(v) for kk, v in aux.items() if np.ndim(v) == 0}

    # one chunked dispatch
    ex0 = _extras(0.0)
    per_step = {f: jnp.stack([getattr(_extras(pr), f) for pr in progs])
                for f in CHUNK_STEP_FIELDS}
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    pK, oK, auxK, _ = stepK(params, opt_state, mvars, stacked, ex0, per_step,
                            jnp.stack(keys))

    np.testing.assert_allclose(
        np.asarray(auxK["total_loss"]), np.asarray(seq_loss), rtol=1e-5)

    # per-group pre-clip grad norms are the discriminating check (see
    # test_parallel_parity): a dropped/duplicated scan step or a wrong
    # per-step extras slice moves them by O(1) factors, while benign
    # fp reassociation between the two compiled programs moves them ~1e-6
    for k in aux1:
        if not k.endswith("_g"):
            continue
        n1, nK = float(aux1[k]), float(np.asarray(auxK[k])[0])
        assert abs(n1 - nK) <= 5e-3 * max(n1, nK, 1e-3), (k, n1, nK)

    # the scheduler must advance through the scan carry: a reset opt_state
    # count would show as a wrong step-2 lr
    np.testing.assert_allclose(np.asarray(auxK["lr"]), np.asarray(seq_lr),
                               rtol=1e-6)

    # params: Adam's first steps are ~lr*sign(g) per component, so
    # components with ~zero true gradient flip sign under fp reassociation
    # between the two compiled programs and land 2*lr_group apart — float
    # noise, not divergence (losses + grad norms + lr above are the real
    # discriminators). Group lr multipliers reach 10x (optim.GROUP_TABLE),
    # two steps: gate at 2 steps * 2 flips * 10x = 40*lr absolute.
    atol = 40.0 * float(aux1["lr"]) + 1e-7
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(pK)):
        worst = max(worst, float(np.abs(np.asarray(a) - np.asarray(b)).max()))
    assert worst < atol, f"params diverged: max abs diff {worst} > {atol}"

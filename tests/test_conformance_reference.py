"""Numerical conformance against the reference implementation.

Where the reference's modules are importable without CUDA/pytorch3d (the
pure-torch dual-quaternion library), run both implementations on the same
inputs and compare — the bit-compat requirement of SURVEY §7 checked at
the math-kernel level.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/nnutils"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")


def load_ref_dualquat():
    sys.path.insert(0, REF)
    try:
        import dual_quat as ref_dq
    finally:
        sys.path.remove(REF)
    return ref_dq


def test_dq_ops_match_reference(rng):
    ref = load_ref_dualquat()
    from moda_tpu.core import dualquat as DQ

    q = rng.normal(size=(8, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(8, 3)).astype(np.float32)
    dq1 = np.asarray(DQ.rt_to_dq(jnp.asarray(q), jnp.asarray(t)))
    q2 = rng.normal(size=(8, 4)).astype(np.float32)
    q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
    t2 = rng.normal(size=(8, 3)).astype(np.float32)
    dq2 = np.asarray(DQ.rt_to_dq(jnp.asarray(q2), jnp.asarray(t2)))

    T1, T2 = torch.tensor(dq1), torch.tensor(dq2)

    np.testing.assert_allclose(
        np.asarray(DQ.dq_mul(jnp.asarray(dq1), jnp.asarray(dq2))),
        ref.dq_mul(T1, T2).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(DQ.dq_normalize(jnp.asarray(dq1 * 2.0))),
        ref.dq_normalize(T1 * 2.0).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(DQ.dq_inverse(jnp.asarray(dq1))),
        ref.dq_inverse(T1).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(DQ.dq_quaternion_conjugate(jnp.asarray(dq1))),
        ref.dq_quaternion_conjugate(T1).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(DQ.dq_combined_conjugate(jnp.asarray(dq1))),
        ref.dq_combined_conjugate(T1).numpy(), atol=1e-6)


def test_q_mul_matches_reference(rng):
    ref = load_ref_dualquat()
    from moda_tpu.core import quat as Q

    q1 = rng.normal(size=(6, 4)).astype(np.float32)
    q2 = rng.normal(size=(6, 4)).astype(np.float32)
    ours = np.asarray(Q.q_mul(jnp.asarray(q1), jnp.asarray(q2)))
    theirs = ref.q_mul(torch.tensor(q1), torch.tensor(q2)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

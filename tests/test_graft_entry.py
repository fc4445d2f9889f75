"""Driver-gate tests: the deliverable entry points must compile and run.

Covers the two functions the round driver invokes:
  - entry(): jittable single-chip forward step on the flagship model
  - dryrun_multichip(8): full train step over an 8-device data mesh
(conftest already forces CPU with 8 virtual devices, so dryrun's own
platform forcing is a no-op here — but the call path is identical.)
"""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as GE  # noqa: E402


@pytest.mark.slow
def test_entry_jits_and_runs():
    fn, args = GE.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


@pytest.mark.slow
def test_dryrun_multichip_8():
    assert len(jax.devices("cpu")) >= 8
    GE.dryrun_multichip(8)  # raises on failure

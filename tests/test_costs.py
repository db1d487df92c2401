"""Cost-ledger accounting tests (fgt_tpu/utils/costs.py).

The reference has no cost accounting (SURVEY.md §5); these pin the
framework's own MFU bookkeeping:

  * costed() charges HLO flops/bytes per (fn, signature) to the open
    stage, once per signature.
  * Pallas kernels are invisible to XLA cost_analysis (custom calls
    report 0 flops); flash_attend credits its analytic MXU flops at
    trace time and costed() folds them into the same entry.
  * failed lookups are cached per signature (advisor round-2 finding).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgt_tpu.utils.costs import LEDGER, costed, record_traced_flops


@pytest.fixture(autouse=True)
def _costs_env(monkeypatch):
    monkeypatch.setenv("FGT_COSTS", "1")
    LEDGER.reset()
    yield
    LEDGER.reset()


def test_costed_charges_open_stage():
    fn = costed(jax.jit(lambda x: x @ x), "mm")
    x = jnp.ones((64, 64), jnp.float32)
    LEDGER.stage = "s_test"
    fn(x)
    fn(x)
    rec = LEDGER.stages["s_test"]
    # 2 calls x (2*64^3 MACs-as-flops); HLO may fold, so bound loosely
    assert rec["calls"] == 2
    assert rec["flops"] >= 2 * 64 ** 3
    assert len(fn._costs) == 1  # one signature entry, reused


def test_flash_analytic_flops_folded_in():
    """A jitted fn whose only matmuls live inside the flash Pallas kernel
    must still report attention flops via the trace-time credit."""
    from fgt_tpu.ops.flash_attention import flash_attend

    n, l, ch = 2, 128, 128
    q = jnp.asarray(np.random.RandomState(0).randn(n, l, ch), jnp.float32)

    fn = costed(jax.jit(lambda q: flash_attend(q, q, q, 0.1)), "flash")
    LEDGER.stage = "s_flash"
    fn(q)
    rec = LEDGER.stages["s_flash"]
    # analytic forward credit: 4 * n * lp_q * lp_k * ch
    assert rec["flops"] >= 4.0 * n * l * l * ch


def test_traced_flops_inactive_outside_lookup():
    # no accumulator active -> record is a no-op, never raises
    record_traced_flops(1e9)


def test_failed_lookup_cached_once():
    calls = []

    class Fake:
        def __call__(self, x):
            return x

        def lower(self, x):
            calls.append(1)
            raise RuntimeError("no backend")

    fn = costed(Fake(), "fake")
    LEDGER.stage = "s_fail"
    fn(jnp.ones(3))
    fn(jnp.ones(3))
    assert len(calls) == 1  # exception cached per signature

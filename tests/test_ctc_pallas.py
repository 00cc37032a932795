"""Parity: fused Pallas CTC kernel vs the lax.scan lattice.

Runs only on a real TPU backend (the CI suite pins JAX_PLATFORMS=cpu, where
``pallas_ctc_available`` is False and ``ctc_loss`` always takes the scan
path — itself parity-tested against torch in test_ctc.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.ops import ctc as ctc_mod

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernel is TPU-only"
)


def _scan_nll(lp, labels, ll, ul):
    os.environ["S2T_NO_PALLAS_CTC"] = "1"
    try:
        return ctc_mod.ctc_loss(lp, labels, ll, ul, reduction="none")
    finally:
        del os.environ["S2T_NO_PALLAS_CTC"]


@tpu_only
class TestPallasCTCParity:
    def _data(self, B=8, T=64, V=40, U=9, seed=0):
        rng = np.random.default_rng(seed)
        lp = jax.nn.log_softmax(
            jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
        )
        labels = np.asarray(rng.integers(4, V, size=(B, U)), np.int32)
        labels[0, 2] = labels[0, 3]  # repeated label exercises the skip rule
        ll = jnp.asarray(rng.integers(U * 2 + 2, T + 1, size=(B,)), jnp.int32)
        ul = jnp.asarray(rng.integers(1, U + 1, size=(B,)), jnp.int32)
        return lp, jnp.asarray(labels), ll, ul

    def test_forward_parity(self):
        from s2t_tpu.ops.ctc_pallas import ctc_nll_pallas

        lp, labels, ll, ul = self._data()
        a = _scan_nll(lp, labels, ll, ul)
        b = ctc_nll_pallas(lp, labels, ll, ul)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)

    def test_grad_parity(self):
        from s2t_tpu.ops.ctc_pallas import ctc_nll_pallas

        lp, labels, ll, ul = self._data(seed=1)
        ga = jax.grad(lambda q: jnp.sum(_scan_nll(q, labels, ll, ul)))(lp)
        gb = jax.grad(lambda q: jnp.sum(ctc_nll_pallas(q, labels, ll, ul)))(lp)
        # two algebraically-equal but different formulas (autodiff through
        # the scan vs the explicit alpha*beta posterior): f32-rounding-level
        # agreement
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-2, atol=1e-2)

    def test_dispatch_selects_pallas(self):
        from s2t_tpu.ops.ctc_pallas import pallas_ctc_available

        assert pallas_ctc_available(32, 250, 59)
        assert not pallas_ctc_available(256, 4000, 512)  # VMEM guard

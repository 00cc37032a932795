"""Fused VMEM-resident attention kernel vs dense attention.

CPU runs use the Pallas interpreter (no dropout — the TPU PRNG primitives
have no interpreter implementation); dropout and performance-path tests are
TPU-gated like tests/test_ctc_pallas.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.ops.attention_pallas import (
    _head_block,
    fused_attention,
    fused_attention_available,
)

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="TPU PRNG / mosaic kernel"
)


def dense_attention(q, k, v, valid):
    D = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(D)
    s = jnp.where(valid[:, None, None, :], s, -1e9)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def make_case(B=2, T=100, H=4, D=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    lengths = np.full((B,), T, np.int32)
    lengths[1:] = rng.integers(T // 2, T, size=B - 1)
    valid = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]
    return q, k, v, valid


class TestFusedAttentionInterpret:
    def test_forward_matches_dense(self):
        q, k, v, valid = make_case()
        o1 = dense_attention(q, k, v, valid)
        o2 = fused_attention(q, k, v, valid, interpret=True)
        np.testing.assert_allclose(
            np.asarray(o1), np.asarray(o2), atol=5e-4
        )

    def test_gradients_match_dense(self):
        # pin f32 matmuls (on TPU the default is bf16 passes, which would
        # swamp the tolerance in the dense reference)
        with jax.default_matmul_precision("highest"):
            self._check_gradients()

    def _check_gradients(self):
        q, k, v, valid = make_case(seed=1)
        g = jnp.asarray(
            np.random.default_rng(2).normal(size=q.shape), jnp.float32
        )

        def loss(f, *a):
            return jnp.vdot(f(*a, valid).astype(jnp.float32), g)

        d1 = jax.grad(
            lambda *a: loss(dense_attention, *a), argnums=(0, 1, 2)
        )(q, k, v)
        d2 = jax.grad(
            lambda *a: loss(
                lambda q, k, v, m: fused_attention(q, k, v, m, interpret=True),
                *a,
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(d1, d2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_availability_gate(self):
        # below min_seq or oversized working set -> unavailable
        assert not fused_attention_available(250, 64, 8)   # under crossover
        assert not fused_attention_available(2048, 64, 8)  # VMEM
        assert _head_block(8, 1024, 64) == 0
        assert _head_block(8, 512, 64) >= 1


@tpu_only
class TestFusedAttentionTPU:
    def test_long_seq_parity_bf16(self):
        q, k, v, valid = make_case(B=2, T=500, H=8, D=64)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        o1 = dense_attention(q, k, v, valid)
        o2 = jax.jit(lambda *a: fused_attention(*a, valid))(q, k, v)
        np.testing.assert_allclose(
            np.asarray(o1, np.float32), np.asarray(o2, np.float32), atol=3e-2
        )

    def test_dropout_deterministic_and_unbiased(self):
        q, k, v, valid = make_case(B=2, T=512, H=8, D=64)
        key = jax.random.PRNGKey(3)
        f = jax.jit(
            lambda *a: fused_attention(
                *a, valid, dropout_rate=0.25, dropout_rng=key
            )
        )
        o1, o2 = f(q, k, v), f(q, k, v)
        assert bool(jnp.all(o1 == o2))
        o_plain = fused_attention(q, k, v, valid)
        r = float(jnp.mean(o1) / jnp.mean(o_plain))
        assert abs(r - 1.0) < 0.15  # unbiased up to sampling noise

    def test_dropout_gradient_finite_differences(self):
        """The backward kernel regenerates the forward's dropout mask —
        checked by finite differences through the fixed-seed function."""
        with jax.default_matmul_precision("highest"):
            q, k, v, valid = make_case(B=1, T=128, H=2, D=64, seed=5)
            key = jax.random.PRNGKey(11)
            g = jnp.asarray(
                np.random.default_rng(6).normal(size=q.shape), jnp.float32
            )

            def loss(q, k, v):
                return jnp.vdot(
                    fused_attention(
                        q, k, v, valid, dropout_rate=0.2, dropout_rng=key
                    ),
                    g,
                )

            grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            eps = 1e-2
            rng = np.random.default_rng(7)
            for i in range(3):
                d = jnp.asarray(rng.normal(size=q.shape), jnp.float32)
                plus = [q, k, v]
                plus[i] = plus[i] + eps * d
                minus = [q, k, v]
                minus[i] = minus[i] - eps * d
                num = (loss(*plus) - loss(*minus)) / (2 * eps)
                ana = jnp.vdot(grads[i], d)
                assert abs(float(num - ana)) < 2e-2 * max(1.0, abs(float(num)))

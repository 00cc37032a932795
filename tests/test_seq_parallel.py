"""Sequence parallelism: ring attention over the "seq" mesh axis.

Asserts numerical equality with the dense unsharded path on an 8-virtual-CPU
mesh (SURVEY §7 new-capability goal; the reference has no sequence
parallelism, §5.7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import DistributedConfig, OptimizationConfig
from s2t_tpu.parallel.context import set_mesh
from s2t_tpu.parallel.mesh import make_mesh
from s2t_tpu.parallel.ring_attention import ring_attention


@pytest.fixture(autouse=True)
def _clear_mesh():
    yield
    set_mesh(None)


def dense_attention(q, k, v, valid):
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    scores = jnp.where(valid[:, None, None, :], scores, -1e30)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
    return jnp.where(valid[:, None, :, None].transpose(0, 2, 1, 3), out, 0.0)


class TestRingAttention:
    def test_matches_dense(self):
        mesh = make_mesh(DistributedConfig(seq_parallel=4, data_parallel=2))
        rng = np.random.default_rng(0)
        B, T, H, Dh = 4, 32, 2, 8
        q = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
        lengths = np.asarray([32, 25, 17, 9])
        valid = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])

        out_ring = ring_attention(q, k, v, valid, mesh)
        out_dense = dense_attention(q, k, v, valid)
        np.testing.assert_allclose(
            np.asarray(out_ring), np.asarray(out_dense), atol=2e-5
        )

    def test_fully_padded_shard(self):
        """A shard whose keys are ALL padding must not produce NaNs."""
        mesh = make_mesh(DistributedConfig(seq_parallel=4, data_parallel=2))
        rng = np.random.default_rng(1)
        B, T, H, Dh = 2, 32, 2, 8
        q = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
        valid = jnp.asarray(np.arange(T)[None, :] < np.asarray([5, 3])[:, None])
        out = np.asarray(ring_attention(q, k, v, valid, mesh))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(
            out, np.asarray(dense_attention(q, k, v, valid)), atol=2e-5
        )


class TestSeqParallelEncoder:
    def test_loss_equal_to_unsharded(self):
        """Full train step with seq-sharded encoder == plain DP step."""
        from s2t_tpu.criterions import build_criterion
        from s2t_tpu.models.s2t_transformer import (
            S2TTransformerConfig, S2TTransformerModel,
        )
        from s2t_tpu.trainer import Trainer

        rng = np.random.default_rng(0)
        B, T, U, V = 4, 64, 8, 32
        targets = rng.integers(4, V, size=(B, U)).astype(np.int32)
        targets[:, -1] = 2
        prev = np.roll(targets, 1, 1)
        prev[:, 0] = 2
        batch = {
            "features": jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32)),
            "feat_lengths": jnp.asarray([64, 50, 40, 33], jnp.int32),
            "prev_tokens": jnp.asarray(prev),
            "target": jnp.asarray(targets),
            "transcript": jnp.asarray(targets[:, :-1]),
            "transcript_lengths": jnp.full((B,), U - 1, jnp.int32),
            "ntokens": float(B * U),
        }

        def run(seq_par: bool):
            set_mesh(None)
            cfg = S2TTransformerConfig(
                encoder_embed_dim=32, encoder_ffn_embed_dim=64,
                encoder_layers=2, encoder_attention_heads=2,
                decoder_embed_dim=32, decoder_ffn_embed_dim=64,
                decoder_layers=1, decoder_attention_heads=2, vocab_size=V,
                subsampling_filter=32, dropout=0.0, attention_dropout=0.0,
                activation_dropout=0.0, max_target_positions=32,
                seq_parallel=seq_par,
            )
            model = S2TTransformerModel(cfg)
            criterion = build_criterion(
                "label_smoothed_cross_entropy_with_ctc",
                {"ctc": {"ctc_weight": 0.3}},
            )
            if seq_par:
                mesh = make_mesh(
                    DistributedConfig(seq_parallel=4, data_parallel=2)
                )
            else:
                mesh = make_mesh(
                    DistributedConfig(data_parallel=2), jax.devices()[:2]
                )
            trainer = Trainer(
                model, criterion,
                OptimizationConfig(lr=1e-3, warmup_updates=10), mesh=mesh,
            )
            state = trainer.init_state(batch)
            state, m = trainer.train_step(state, batch)
            return float(m["loss"]), state

        loss_sp, state_sp = run(True)
        loss_dp, state_dp = run(False)
        assert abs(loss_sp - loss_dp) < 1e-3, (loss_sp, loss_dp)
        # params after one update agree too
        for a, b in zip(jax.tree.leaves(state_sp.params),
                        jax.tree.leaves(state_dp.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

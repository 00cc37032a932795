"""Sampling decode tests (reference: fairseq/search.py Sampling :622)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.inference.sampling import _filter_topk, _filter_topp, sampling_decode

PAD, EOS = 1, 2


class TestFilters:
    def test_topk(self):
        lp = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
        out = np.asarray(_filter_topk(lp, 2))
        assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
        assert out[0, 2] < -1e8 and out[0, 3] < -1e8

    def test_topp(self):
        lp = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
        out = np.asarray(_filter_topp(lp, 0.7))
        # 0.5 + 0.3 >= 0.7 -> keep exactly the top two
        assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
        assert out[0, 2] < -1e8

    def test_topp_always_keeps_best(self):
        lp = jnp.log(jnp.asarray([[0.9, 0.1, 1e-9, 1e-9]]))
        out = np.asarray(_filter_topp(lp, 0.01))
        assert np.isfinite(out[0, 0])
        assert out[0, 1] < -1e8


class TestSamplingDecode:
    def test_deterministic_distribution(self):
        # scripted distribution: token 3 with prob ~1 for 2 steps then EOS
        NEG = -1e9
        V = 6
        t = np.full((4, V), NEG, np.float32)
        t[0, 3] = 0.0
        t[1, 4] = 0.0
        t[2, EOS] = 0.0
        t[3, EOS] = 0.0
        tables = jnp.asarray(t)

        def step(tokens, cache, i):
            lp = jax.lax.dynamic_index_in_dim(tables, i, keepdims=False)
            return jnp.broadcast_to(lp, (tokens.shape[0], V)), cache

        tokens, scores = sampling_decode(
            step, {"d": jnp.zeros((2, 1))}, jax.random.PRNGKey(0),
            batch_size=1, num_samples=2, max_len=4, eos_id=EOS, pad_id=PAD,
        )
        tokens = np.asarray(tokens)
        assert tokens[0, 0].tolist() == [3, 4, EOS, PAD]
        assert tokens[0, 1].tolist() == [3, 4, EOS, PAD]
        np.testing.assert_allclose(np.asarray(scores), 0.0, atol=1e-4)

    def test_model_sampling(self):
        from s2t_tpu.inference.generator import SequenceGenerator
        from s2t_tpu.models.s2t_transformer import (
            S2TTransformerConfig, S2TTransformerModel,
        )

        cfg = S2TTransformerConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1, decoder_attention_heads=2,
            vocab_size=20, subsampling_filter=64, dropout=0.0,
            max_target_positions=32,
        )
        model = S2TTransformerModel(cfg)
        B, T = 2, 32
        feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, 80)), jnp.float32)
        lens = jnp.full((B,), T, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, lens,
                            jnp.zeros((B, 3), jnp.int32))["params"]
        gen = SequenceGenerator(
            model, beam_size=4, max_len_b=8, sampling=True,
            sampling_topk=5, temperature=1.0,
        )
        tokens, scores, _ = gen.generate(params, {"features": feats, "feat_lengths": lens})
        assert tokens.shape[:2] == (B, 4)
        # samples sorted by score descending
        assert np.all(np.diff(np.asarray(scores), axis=1) <= 1e-5)

"""Shallow LM fusion test (reference: sequence_generator.py lm_model/lm_weight)."""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.inference.generator import SequenceGenerator
from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel
from s2t_tpu.models.transformer_lm import TransformerLM, TransformerLMConfig

V = 20


class TestLMFusion:
    def test_fused_decode_runs_and_differs(self):
        cfg = S2TTransformerConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1, decoder_attention_heads=2,
            vocab_size=V, subsampling_filter=64, dropout=0.0,
            max_target_positions=32,
        )
        model = S2TTransformerModel(cfg)
        lm_cfg = TransformerLMConfig(
            decoder_embed_dim=32, decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, vocab_size=V, dropout=0.0,
            max_target_positions=32,
        )
        lm = TransformerLM(lm_cfg)
        B, T = 2, 32
        feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, 80)), jnp.float32)
        lens = jnp.full((B,), T, jnp.int32)
        params = model.init(
            jax.random.PRNGKey(0), feats, lens, jnp.zeros((B, 3), jnp.int32)
        )["params"]
        lm_params = lm.init(jax.random.PRNGKey(7), jnp.zeros((B, 3), jnp.int32))["params"]

        plain = SequenceGenerator(model, beam_size=2, max_len_b=8)
        fused = SequenceGenerator(
            model, beam_size=2, max_len_b=8,
            lm_model=lm, lm_params=lm_params, lm_weight=5.0,
        )
        t0, s0, _ = plain.generate(params, {"features": feats, "feat_lengths": lens})
        t1, s1, _ = fused.generate(params, {"features": feats, "feat_lengths": lens})
        assert t1.shape == t0.shape
        assert np.all(np.isfinite(np.asarray(s1)))
        # a strong random LM should change the scores
        assert not np.allclose(np.asarray(s0), np.asarray(s1))

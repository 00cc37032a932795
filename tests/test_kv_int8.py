"""int8 KV-cache decode: parity with the full-precision cache.

(no reference equivalent — a serving-mode extension; the quantization is
per-(position, head) absmax int8 on the decoder self-attention cache,
modules/attention.py int8 branch, selected by generation.kv_cache_dtype.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.inference.generator import SequenceGenerator
from s2t_tpu.registry import ARCHS
from s2t_tpu.models.s2t_transformer import S2TTransformerModel


def tiny_model(vocab=40):
    name, preset = ARCHS.get("s2t_transformer_xs")
    cfg = preset(
        vocab_size=vocab, encoder_layers=2, decoder_layers=2,
        encoder_embed_dim=32, decoder_embed_dim=32,
        encoder_ffn_embed_dim=64, decoder_ffn_embed_dim=64,
        encoder_attention_heads=2, decoder_attention_heads=2,
        subsampling_filter=32, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, max_target_positions=32,
    )
    return S2TTransformerModel(cfg)


class TestKVInt8:
    def _setup(self):
        model = tiny_model()
        rng = np.random.default_rng(0)
        B, T = 3, 80
        feats = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
        lengths = jnp.asarray([80, 64, 50])
        prev = jnp.asarray(rng.integers(4, 40, size=(B, 5)), jnp.int32)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            feats, lengths, prev,
        )["params"]
        return model, params, feats, lengths

    def _gen(self, model, kv):
        return SequenceGenerator(
            model, beam_size=2, max_len_b=12, eos_id=2, pad_id=1,
            max_target_positions=16, kv_cache_dtype=kv,
        )

    def test_int8_cache_structure(self):
        model, params, feats, lengths = self._setup()
        cache = model.apply(
            {"params": params}, 4, 8, method=model.init_cache, kv_int8=True
        )
        assert cache["layer0"]["k"].dtype == jnp.int8
        assert cache["layer0"]["k_scale"].dtype == jnp.bfloat16
        assert cache["layer0"]["k_scale"].shape == (4, 8, 2)

    def test_step_logits_close_to_fp(self):
        """Per-step logits through the int8 cache stay within quantization
        tolerance of the full-precision cache."""
        model, params, feats, lengths = self._setup()
        enc = model.apply({"params": params}, feats, lengths, method=model.encode)
        from s2t_tpu.utils.masking import lengths_to_mask

        mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        B, U = 3, 6
        rng = np.random.default_rng(1)
        toks = jnp.asarray(rng.integers(4, 40, size=(B, U)), jnp.int32)
        c_fp = model.apply({"params": params}, B, U, method=model.init_cache)
        c_q = model.apply({"params": params}, B, U, method=model.init_cache,
                          kv_int8=True)
        for t in range(U):
            lf, c_fp = model.apply(
                {"params": params}, toks[:, t:t+1], c_fp,
                jnp.asarray(t, jnp.int32), enc["encoder_out"], mask,
                method=model.decode_step,
            )
            lq, c_q = model.apply(
                {"params": params}, toks[:, t:t+1], c_q,
                jnp.asarray(t, jnp.int32), enc["encoder_out"], mask,
                method=model.decode_step,
            )
            f = np.asarray(lf, np.float32)
            q = np.asarray(lq, np.float32)
            scale = np.abs(f).max() + 1e-6
            assert np.abs(f - q).max() / scale < 0.05, f"step {t}"

    def test_beam_decode_matches_fp_hypotheses(self):
        """End-to-end beam search: int8 cache produces the same hypothesis
        tokens as the fp cache on a random-init model (argmax decisions are
        robust to ~1% logit noise on these margins)."""
        model, params, feats, lengths = self._setup()
        toks_fp, scores_fp, _ = self._gen(model, "model").generate(
            params, {"features": feats, "feat_lengths": lengths}
        )
        toks_q, scores_q, _ = self._gen(model, "int8").generate(
            params, {"features": feats, "feat_lengths": lengths}
        )
        np.testing.assert_array_equal(np.asarray(toks_fp), np.asarray(toks_q))
        np.testing.assert_allclose(
            np.asarray(scores_fp), np.asarray(scores_q), rtol=0.05, atol=0.05
        )

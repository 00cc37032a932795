"""Berard LSTM and dual-stream model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.models.build import build_model

V = 20


class TestBerard:
    def test_forward(self):
        m = build_model(
            "berard",
            {"encoder_hidden": 16, "decoder_hidden": 32, "decoder_embed_dim": 8,
             "encoder_layers": 1, "decoder_layers": 1, "dropout": 0.0},
            vocab_size=V,
        )
        feats = jnp.ones((2, 40, 80))
        lens = jnp.asarray([40, 24])
        prev = jnp.zeros((2, 4), jnp.int32)
        p = m.init(jax.random.PRNGKey(0), feats, lens, prev)
        out = m.apply(p, feats, lens, prev)
        assert out["decoder_logits"].shape == (2, 4, V)
        assert np.all(np.isfinite(np.asarray(out["decoder_logits"])))

    def test_trains(self):
        from s2t_tpu.criterions.build import build_criterion

        m = build_model(
            "berard",
            {"encoder_hidden": 16, "decoder_hidden": 32, "decoder_embed_dim": 8,
             "encoder_layers": 1, "decoder_layers": 1, "dropout": 0.0},
            vocab_size=V,
        )
        crit = build_criterion("label_smoothed_cross_entropy", {"label_smoothing": 0.0})
        feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 40, 80)), jnp.float32)
        lens = jnp.asarray([40, 40])
        tgt = jnp.asarray([[4, 5, 2, 1], [6, 7, 8, 2]], jnp.int32)
        prev = jnp.asarray([[2, 4, 5, 1], [2, 6, 7, 8]], jnp.int32)
        p = m.init(jax.random.PRNGKey(0), feats, lens, prev)["params"]

        def loss(p):
            out = m.apply({"params": p}, feats, lens, prev)
            l, ss, _ = crit(out, {"target": tgt})
            return l / ss

        g = jax.grad(loss)(p)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


class TestDual:
    def _model(self):
        return build_model(
            "s2t_dual_s",
            {
                "speech_encoder_embed_dim": 32, "speech_encoder_ffn_embed_dim": 64,
                "speech_encoder_layers": 2, "speech_encoder_attention_heads": 2,
                "speech_decoder_embed_dim": 32, "speech_decoder_ffn_embed_dim": 64,
                "speech_decoder_layers": 1, "speech_decoder_attention_heads": 2,
                "speech_subsampling_filter": 32, "speech_dropout": 0.0,
                "text_encoder_layers": 1, "text_encoder_embed_dim": 32,
                "text_encoder_ffn_embed_dim": 64, "text_encoder_attention_heads": 2,
            },
            vocab_size=V,
        )

    def test_train_and_infer_streams(self):
        m = self._model()
        feats = jnp.ones((2, 40, 80))
        lens = jnp.asarray([40, 30])
        prev = jnp.zeros((2, 4), jnp.int32)
        tr = jnp.asarray([[4, 5, 6], [7, 8, 1]], jnp.int32)
        trl = jnp.asarray([3, 2])
        p = m.init(jax.random.PRNGKey(0), feats, lens, prev,
                   transcript=tr, transcript_lengths=trl)
        out = m.apply(p, feats, lens, prev, transcript=tr, transcript_lengths=trl)
        assert out["decoder_logits"].shape == (2, 4, V)
        # inference: text stream derived from CTC greedy hypothesis
        out2 = m.apply(p, feats, lens, prev)
        assert np.all(np.isfinite(np.asarray(out2["decoder_logits"])))
        # the transcript stream actually changes the output
        assert not np.allclose(
            np.asarray(out["decoder_logits"]), np.asarray(out2["decoder_logits"])
        )

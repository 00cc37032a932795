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


class TestMultiBranch:
    def test_forward_and_join_loss(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from s2t_tpu.criterions.build import build_criterion

        B, T, V = 2, 40, 24
        model = build_model(
            "s2t_multibranch_s",
            {
                "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                "encoder_attention_heads": 2, "junior_layers": 1,
                "senior_layers": 1, "textual_layers": 1, "decoder_layers": 1,
                "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
                "decoder_attention_heads": 2, "subsampling_filter": 32,
                "dropout": 0.0, "attention_dropout": 0.0,
                "activation_dropout": 0.0,
                "collaboration_direction": "both",
            },
            vocab_size=V,
        )
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
        lens = jnp.full((B,), T, jnp.int32)
        prev = jnp.zeros((B, 5), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, lens, prev)
        out = model.apply(params, feats, lens, prev)
        assert out["decoder_logits"].shape == (B, 5, V)
        assert out["ctc_logits"] is not None
        # senior stream is s1 ("encoder_out"), textual is s2 (reference
        # s2t_multibranch.py:762-766)
        assert out["s2_encoder_out"].shape == out["encoder_out"].shape

        crit = build_criterion(
            "join_speech_and_text_loss",
            {"label_smoothing": 0.1, "ctc": {"ctc_weight": 0.3}},
        )
        targets = rng.integers(4, V, size=(B, 5)).astype(np.int32)
        targets[:, -1] = 2
        batch = {
            "target": jnp.asarray(targets),
            "transcript": jnp.asarray(targets[:, :-1]),
            "transcript_lengths": jnp.full((B,), 4, jnp.int32),
            "ntokens": float(B * 5),
        }
        loss, ss, logs = crit(out, batch)
        assert np.isfinite(float(loss))
        # CE term is down-weighted: loss = (1-w)*ce + ctc_terms
        expect = 0.7 * float(logs["ce_loss"]) + 0.3 * float(logs["ctc_loss"])
        np.testing.assert_allclose(float(loss), expect, rtol=1e-5)
        assert "trans_loss" in logs


class TestLSTMMT:
    def test_forward_incremental_and_generate(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from s2t_tpu.models.lstm import LSTMConfig, LSTMModel
        from s2t_tpu.utils.masking import lengths_to_mask

        V = 18
        cfg = LSTMConfig(
            encoder_embed_dim=24, encoder_hidden_size=24, decoder_embed_dim=24,
            decoder_hidden_size=24, encoder_layers=1, decoder_layers=1,
            vocab_size=V, dropout=0.0,
        )
        model = LSTMModel(cfg)
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.integers(4, V, size=(2, 6)), jnp.int32)
        lens = jnp.asarray([6, 4], jnp.int32)
        prev = jnp.asarray([[2, 5, 6], [2, 7, 8]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), src, lens, prev)["params"]
        out = model.apply({"params": params}, src, lens, prev)
        assert out["decoder_logits"].shape == (2, 3, V)

        # incremental decode matches teacher forcing
        enc = model.apply({"params": params}, src, lens, method=LSTMModel.encode)
        em = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        cache = model.apply({"params": params}, 2, 8, method=LSTMModel.init_cache)
        tf = np.asarray(out["decoder_logits"])
        for t in range(3):
            logit, cache = model.apply(
                {"params": params}, prev[:, t : t + 1], cache, jnp.asarray(t),
                enc["encoder_out"], em, method=LSTMModel.decode_step,
            )
            np.testing.assert_allclose(np.asarray(logit), tf[:, t], atol=1e-4)

        from s2t_tpu.inference.generator import SequenceGenerator

        gen = SequenceGenerator(model, beam_size=2, max_len_b=6, eos_id=2,
                                pad_id=1, max_target_positions=16,
                                input_keys=("src_tokens", "src_lengths"))
        tokens, scores, _ = gen.generate(
            params, {"src_tokens": src, "src_lengths": lens}
        )
        assert np.isfinite(np.asarray(scores)).all()

    def test_lstm_padding_invariance(self):
        """Encoder outputs at valid positions must not depend on batch
        padding (the code-review finding: flip-based backward contaminated
        valid frames with pad history)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from s2t_tpu.models.lstm import LSTMConfig, LSTMModel

        V = 18
        cfg = LSTMConfig(
            encoder_embed_dim=24, encoder_hidden_size=24, decoder_embed_dim=24,
            decoder_hidden_size=24, vocab_size=V, dropout=0.0,
        )
        model = LSTMModel(cfg)
        src = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        lens = jnp.asarray([4], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), src, lens,
                            jnp.zeros((1, 2), jnp.int32))["params"]
        e1 = model.apply({"params": params}, src, lens,
                         method=LSTMModel.encode)["encoder_out"]
        src_padded = jnp.asarray([[5, 6, 7, 8, 1, 1, 1]], jnp.int32)
        e2 = model.apply({"params": params}, src_padded, lens,
                         method=LSTMModel.encode)["encoder_out"]
        np.testing.assert_allclose(
            np.asarray(e1), np.asarray(e2[:, :4]), atol=1e-5
        )


class TestLSTMLM:
    def test_lm_trains_and_decodes_incrementally(self, tmp_path):
        """lstm_lm (reference: models/lstm_lm.py) via the real LM task CLI,
        plus incremental/full parity for the fusion path."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from s2t_tpu.config import TrainConfig, from_dict
        from s2t_tpu.cli.train import main as train_main

        root = tmp_path / "data"
        root.mkdir(parents=True)
        lines = ["aa bb cc dd " * 8 for _ in range(16)]
        for split in ("train", "dev"):
            (root / f"{split}.txt").write_text("\n".join(lines))
        (root / "dict.txt").write_text("aa 5\nbb 5\ncc 5\ndd 5\n")
        cfg = from_dict(TrainConfig, {
            "task": "language_modeling", "arch": "lstm_lm",
            "criterion": "cross_entropy",
            "task_cfg": {"tokens_per_sample": 32},
            "model": {"decoder_embed_dim": 24, "decoder_hidden_size": 24,
                      "decoder_layers": 1, "dropout": 0.0},
            "dataset": {"data": str(root), "max_tokens": 512,
                        "max_target_positions": 32},
            "optimization": {"max_epoch": 8, "lr": 5e-3,
                             "warmup_updates": 5, "clip_norm": 2.0},
            "checkpoint": {"save_dir": str(tmp_path / "ckpt"),
                           "async_save": False},
        })
        out = train_main(cfg)
        assert out["history"][-1]["loss"] < out["history"][0]["loss"]

        model, params = out["model"], out["state"].params
        toks = jnp.asarray([[2, 4, 5, 6]], jnp.int32)
        full = np.asarray(
            model.apply({"params": params}, toks)["decoder_logits"]
        )
        cache = model.apply({"params": params}, 1, 8,
                            method=type(model).init_cache)
        for t in range(4):
            step, cache = model.apply(
                {"params": params}, toks[:, t : t + 1], cache,
                jnp.asarray(t), method=type(model).decode_step,
            )
            np.testing.assert_allclose(np.asarray(step), full[:, t], atol=1e-4)


class TestRobertaVariants:
    def test_language_specific_aliases(self):
        """camembert/gottbert/xlmr are the RoBERTa graph with variant vocab
        (reference: models/roberta/model_{camembert,gottbert,xlmr}.py)."""
        import jax
        import jax.numpy as jnp

        from s2t_tpu.models.build import build_model

        for arch in ("camembert", "gottbert", "xlmr_base"):
            m = build_model(
                arch,
                {"encoder_embed_dim": 16, "encoder_ffn_embed_dim": 32,
                 "encoder_layers": 1, "encoder_attention_heads": 2,
                 "dropout": 0.0, "attention_dropout": 0.0},
                vocab_size=30,
            )
            toks = jnp.asarray([[4, 5, 6, 1]], jnp.int32)
            p = m.init(jax.random.PRNGKey(0), toks)
            out = m.apply(p, toks)
            assert out["lm_logits"].shape == (1, 4, 30)

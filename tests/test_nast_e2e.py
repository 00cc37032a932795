"""Encoder-only CTC (NAST) end-to-end: train + non-autoregressive decode."""

import numpy as np
import pytest

from tests.test_binaries import make_tiny_corpus, tiny_train_cfg


@pytest.mark.slow
class TestNASTEndToEnd:
    def test_ctc_model_train_and_decode(self, tmp_path):
        from s2t_tpu.cli.generate import main as generate_main
        from s2t_tpu.cli.train import main as train_main

        data = make_tiny_corpus(tmp_path / "data")
        cfg = tiny_train_cfg(data, tmp_path / "ckpt", max_epoch=60)
        cfg.arch = "s2t_ctc"
        cfg.criterion = "ctc"
        cfg.criterion_cfg = {"ctc_weight": 1.0}
        cfg.model = {
            "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
            "encoder_layers": 2, "encoder_attention_heads": 2,
            "subsampling_filter": 32, "dropout": 0.0,
            "attention_dropout": 0.0, "activation_dropout": 0.0,
        }
        out = train_main(cfg)
        assert out["history"][-1]["loss"] < out["history"][0]["loss"]

        cfg.generation.results_path = str(tmp_path / "gen")
        cfg.generation.ctc_infer = True
        gen = generate_main(cfg, out["state"].params, task=out["task"])
        assert gen["n_utts"] == 12
        # non-autoregressive decode matches most references after overfit
        matches = sum(1 for r in gen["results"].values() if r["hyp"] == r["ref"])
        assert matches >= 8, [
            (r["hyp"], r["ref"]) for r in list(gen["results"].values())[:6]
        ]
        assert (tmp_path / "gen" / "translation-test.txt.ctc").exists()

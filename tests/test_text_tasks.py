"""MT and LM task tests: tiny end-to-end training + generation.

(reference: tests/test_binaries.py transformer/LM cases — real train loop on
tiny synthetic text.)
"""

from pathlib import Path

import numpy as np
import pytest

from s2t_tpu.config import TrainConfig, from_dict


def make_mt_corpus(root: Path, n=32):
    """Copy task with token remap: tgt token = src token uppercased."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    src_lines, tgt_lines = [], []
    for i in range(n):
        L = int(rng.integers(2, 5))
        toks = [vocab[int(rng.integers(len(vocab)))] for _ in range(L)]
        src_lines.append(" ".join(toks))
        tgt_lines.append(" ".join(t.upper() for t in toks))
    for split in ("train", "dev", "test"):
        (root / f"{split}.en").write_text("\n".join(src_lines))
        (root / f"{split}.de").write_text("\n".join(tgt_lines))
    syms = vocab + [v.upper() for v in vocab]
    (root / "dict.txt").write_text("\n".join(f"{s} 5" for s in syms))
    (root / "config.yaml").write_text(
        "vocab_filename: dict.txt\nsrc_lang: en\ntgt_lang: de\n"
    )
    return root


def mt_cfg(data, save, max_epoch=150):
    return from_dict(
        TrainConfig,
        {
            "task": "translation",
            "arch": "transformer",
            "criterion": "label_smoothed_cross_entropy",
            "model": {
                "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                "encoder_layers": 2, "encoder_attention_heads": 2,
                "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
                "decoder_layers": 1, "decoder_attention_heads": 2,
                "dropout": 0.0, "encoder_normalize_before": True,
                "decoder_normalize_before": True,
            },
            "criterion_cfg": {"label_smoothing": 0.0},
            "common": {"seed": 5, "log_interval": 50},
            "dataset": {
                "data": str(data), "max_tokens": 512,
                "max_source_positions": 32, "max_target_positions": 16,
                "num_buckets": 2, "required_batch_size_multiple": 2,
            },
            "optimization": {
                "max_epoch": max_epoch, "lr": 5e-3, "warmup_updates": 20,
                "warmup_init_lr": 1e-4, "clip_norm": 5.0,
            },
            "checkpoint": {"save_dir": str(save), "async_save": False},
            "generation": {"beam": 2, "max_len_b": 10, "post_process": "none"},
        },
    )


@pytest.mark.slow
class TestTranslation:
    def test_train_and_generate(self, tmp_path):
        from s2t_tpu.cli.generate import main as generate_main
        from s2t_tpu.cli.train import main as train_main

        data = make_mt_corpus(tmp_path / "data")
        cfg = mt_cfg(data, tmp_path / "ckpt")
        out = train_main(cfg)
        assert out["history"][-1]["loss"] < out["history"][0]["loss"]

        cfg.generation.results_path = str(tmp_path / "gen")
        gen = generate_main(cfg, out["state"].params, task=out["task"])
        matches = sum(1 for r in gen["results"].values() if r["hyp"] == r["ref"])
        assert matches >= len(gen["results"]) * 0.7, (
            matches, [(r["hyp"], r["ref"]) for r in list(gen["results"].values())[:4]]
        )


class TestLanguageModeling:
    def test_lm_trains(self, tmp_path):
        from s2t_tpu.cli.train import main as train_main

        root = tmp_path / "data"
        root.mkdir(parents=True)
        rng = np.random.default_rng(1)
        # highly regular text so a tiny LM learns fast
        lines = ["aa bb cc dd " * 8 for _ in range(16)]
        for split in ("train", "dev"):
            (root / f"{split}.txt").write_text("\n".join(lines))
        (root / "dict.txt").write_text("aa 5\nbb 5\ncc 5\ndd 5\n")
        cfg = from_dict(
            TrainConfig,
            {
                "task": "language_modeling",
                "arch": "transformer_lm",
                "criterion": "cross_entropy",
                "task_cfg": {"tokens_per_sample": 32},
                "model": {
                    "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
                    "decoder_layers": 1, "decoder_attention_heads": 2,
                    "dropout": 0.0,
                },
                "criterion_cfg": {"label_smoothing": 0.0},
                "dataset": {
                    "data": str(root), "max_tokens": 2048,
                    "max_source_positions": 64, "max_target_positions": 64,
                    "num_buckets": 1, "required_batch_size_multiple": 2,
                },
                "optimization": {
                    "max_epoch": 60, "lr": 5e-3, "warmup_updates": 10,
                    "warmup_init_lr": 1e-4, "clip_norm": 5.0,
                },
                "checkpoint": {"save_dir": str(tmp_path / "ckpt"), "async_save": False},
            },
        )
        out = train_main(cfg)
        hist = out["history"]
        assert hist[-1]["loss"] < hist[0]["loss"]
        # loss should approach the entropy of a near-deterministic sequence
        assert hist[-1]["loss"] < 1.0, hist

"""use_audio_input end-to-end: raw waveforms -> on-device fbank inside the
jitted step (the on-device frontend path; reference computes fbank in
DataLoader workers, audio_utils.py:82)."""

import io
import zipfile
from pathlib import Path

import numpy as np
import pytest

from s2t_tpu.config import TrainConfig, from_dict


def make_wave_corpus(root: Path, n=8, L=8000):
    rng = np.random.default_rng(0)
    root.mkdir(parents=True, exist_ok=True)
    lines = ["id\taudio\tn_frames\ttgt_text"]
    for i in range(n):
        wav = (rng.normal(scale=2000, size=L)).astype(np.float32)
        np.save(root / f"u{i}.npy", wav)
        # n_frames column = samples for raw audio input (used for batching)
        lines.append(f"u{i}\tu{i}.npy\t{L}\taa bb")
    (root / "train.tsv").write_text("\n".join(lines))
    (root / "dev.tsv").write_text("\n".join(lines))
    (root / "dict.txt").write_text("aa 5\nbb 5\n")
    (root / "config.yaml").write_text(
        "vocab_filename: dict.txt\nuse_audio_input: true\n"
    )
    return root


@pytest.mark.slow
class TestAudioInputTask:
    def test_train_from_raw_audio(self, tmp_path):
        from s2t_tpu.cli.train import main as train_main

        data = make_wave_corpus(tmp_path / "data")
        cfg = from_dict(
            TrainConfig,
            {
                "task": "speech_to_text",
                "arch": "s2t_transformer_xs",
                "criterion": "label_smoothed_cross_entropy",
                "model": {
                    "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                    "encoder_layers": 1, "encoder_attention_heads": 2,
                    "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
                    "decoder_layers": 1, "decoder_attention_heads": 2,
                    "subsampling_filter": 32, "dropout": 0.0,
                },
                "criterion_cfg": {"label_smoothing": 0.0},
                "dataset": {
                    "data": str(data), "max_tokens": 40000,
                    "max_source_positions": 9000, "max_target_positions": 8,
                    "num_buckets": 1, "required_batch_size_multiple": 2,
                },
                "optimization": {"max_epoch": 3, "lr": 1e-3, "warmup_updates": 5},
                "checkpoint": {"save_dir": str(tmp_path / "ckpt"), "async_save": False},
            },
        )
        out = train_main(cfg)
        hist = out["history"]
        assert hist[-1]["loss"] < hist[0]["loss"]

"""End-to-end binary tests on tiny synthetic data (CPU).

(reference: tests/test_binaries.py ~1800 LoC — create dummy data, run real
training for an epoch, decode, check outputs.  Same strategy here: real CLI
code paths, tiny shapes.)
"""

import io
import logging
import zipfile
from pathlib import Path

import numpy as np
import pytest

from s2t_tpu.config import TrainConfig, from_dict


def make_tiny_corpus(root: Path, n=12, T=24, vocab=("aa", "bb", "cc", "dd")):
    """Synthetic ASR data where the target is recoverable from features:
    utterance i cycles tokens; features embed the token identity as a bias in
    a feature block, so a tiny model can overfit quickly."""
    rng = np.random.default_rng(0)
    root.mkdir(parents=True, exist_ok=True)
    lines = ["id\tudio\tn_frames\ttgt_text\tsrc_text".replace("udio", "audio")]
    with zipfile.ZipFile(root / "feats.zip", "w", zipfile.ZIP_STORED) as z:
        for i in range(n):
            toks = [vocab[(i + j) % len(vocab)] for j in range(2)]
            feat = rng.normal(scale=0.1, size=(T, 80)).astype(np.float32)
            for j, tk in enumerate(toks):
                k = vocab.index(tk)
                feat[j * (T // 2) : (j + 1) * (T // 2), k * 10 : (k + 1) * 10] += 2.0
            buf = io.BytesIO()
            np.save(buf, feat)
            z.writestr(f"u{i}.npy", buf.getvalue())
    # offsets
    specs = {}
    with zipfile.ZipFile(root / "feats.zip") as z, open(root / "feats.zip", "rb") as f:
        for info in z.infolist():
            f.seek(info.header_offset)
            hdr = f.read(30)
            nl = int.from_bytes(hdr[26:28], "little")
            el = int.from_bytes(hdr[28:30], "little")
            specs[info.filename] = (
                f"feats.zip:{info.header_offset + 30 + nl + el}:{info.file_size}"
            )
    for i in range(n):
        toks = [vocab[(i + j) % len(vocab)] for j in range(2)]
        text = " ".join(toks)
        lines.append(f"u{i}\t{specs[f'u{i}.npy']}\t{T}\t{text}\t{text}")
    (root / "train.tsv").write_text("\n".join(lines))
    (root / "dev.tsv").write_text("\n".join(lines))
    (root / "test.tsv").write_text("\n".join(lines))
    (root / "dict.txt").write_text("\n".join(f"{v} 10" for v in vocab))
    (root / "config.yaml").write_text(
        "vocab_filename: dict.txt\n"
    )
    return root


def tiny_train_cfg(data_dir, save_dir, max_epoch=60):
    return from_dict(
        TrainConfig,
        {
            "task": "speech_to_text",
            "arch": "s2t_transformer_xs",
            "criterion": "label_smoothed_cross_entropy_with_ctc",
            "model": {
                "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                "encoder_layers": 2, "encoder_attention_heads": 2,
                "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
                "decoder_layers": 1, "decoder_attention_heads": 2,
                "subsampling_filter": 32, "dropout": 0.0,
                "attention_dropout": 0.0, "activation_dropout": 0.0,
            },
            "criterion_cfg": {"label_smoothing": 0.0, "ctc": {"ctc_weight": 0.3}},
            "common": {"seed": 3, "log_interval": 10},
            "dataset": {
                "data": str(data_dir), "max_tokens": 2000,
                "max_source_positions": 64, "max_target_positions": 16,
                "num_buckets": 2, "required_batch_size_multiple": 2,
            },
            "optimization": {
                "max_epoch": max_epoch, "lr": 5e-3, "warmup_updates": 10,
                "warmup_init_lr": 1e-4, "clip_norm": 5.0, "update_freq": 1,
            },
            "checkpoint": {
                "save_dir": str(save_dir), "keep_best_checkpoints": 3,
                "async_save": False,
            },
            "generation": {"beam": 2, "max_len_b": 10, "post_process": "none"},
        },
    )


class TestEndToEndFast:
    """Slim CLI train→resume→generate roundtrip that runs in the default
    suite, so `cli/train.py` + `cli/generate.py` are exercised on every
    `pytest` run (the full overfit-quality version below is slow-marked)."""

    def test_cli_roundtrip_mechanics(self, tmp_path):
        from s2t_tpu.cli.generate import main as generate_main
        from s2t_tpu.cli.train import main as train_main

        data = make_tiny_corpus(tmp_path / "data", n=6, T=16)
        save = tmp_path / "ckpt"
        cfg = tiny_train_cfg(data, save, max_epoch=2)
        out = train_main(cfg)
        assert np.isfinite(out["history"][-1]["loss"])

        cfg2 = tiny_train_cfg(data, save, max_epoch=3)
        out2 = train_main(cfg2)
        assert int(out2["state"].step) > int(out["state"].step)

        cfg2.generation.results_path = str(tmp_path / "gen")
        gen = generate_main(cfg2, out2["state"].params, task=out2["task"])
        assert gen["n_utts"] == 6
        content = (tmp_path / "gen" / "generate-test.txt").read_text()
        assert "H-0" in content and "T-0" in content and "D-0" in content


@pytest.mark.slow
class TestEndToEnd:
    def test_train_generate_roundtrip(self, tmp_path):
        from s2t_tpu.cli.generate import main as generate_main
        from s2t_tpu.cli.train import main as train_main

        data = make_tiny_corpus(tmp_path / "data")
        save = tmp_path / "ckpt"
        cfg = tiny_train_cfg(data, save)
        out = train_main(cfg)
        hist = out["history"]
        assert hist[-1]["loss"] < hist[0]["loss"], hist

        # resume smoke: second call restores from checkpoint_last
        cfg2 = tiny_train_cfg(data, save, max_epoch=70)
        out2 = train_main(cfg2)
        assert int(out2["state"].step) > int(out["state"].step)

        # generate with the trained params
        params = out2["state"].params
        cfg2.generation.results_path = str(tmp_path / "gen")
        gen = generate_main(cfg2, params, task=out2["task"])
        assert gen["n_utts"] == 12
        gen_file = tmp_path / "gen" / "generate-test.txt"
        assert gen_file.exists()
        content = gen_file.read_text()
        assert "H-0" in content and "T-0" in content and "D-0" in content
        # overfit tiny data => most hypotheses match references
        matches = sum(
            1 for r in gen["results"].values() if r["hyp"] == r["ref"]
        )
        assert matches >= 9, f"only {matches}/12 matched: " + str(
            [(r['hyp'], r['ref']) for r in gen['results'].values()][:4]
        )

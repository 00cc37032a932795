"""Supervised attention alignment (transformer_align).

(reference behaviours: fairseq/models/transformer_align.py,
criterions/label_smoothed_cross_entropy_with_alignment.py, --load-alignments
Pharaoh-format parsing.)
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import OptimizationConfig, TrainConfig, from_dict


def make_aligned_corpus(root: Path, n=16):
    """Copy task with identity word alignment j-j."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    vocab = ["aa", "bb", "cc", "dd"]
    src_lines, tgt_lines, align_lines = [], [], []
    for i in range(n):
        L = 3 + int(rng.integers(0, 2))
        toks = [vocab[int(rng.integers(len(vocab)))] for _ in range(L)]
        src_lines.append(" ".join(toks))
        tgt_lines.append(" ".join(t.upper() for t in toks))
        align_lines.append(" ".join(f"{j}-{j}" for j in range(L)))
    for split in ("train", "dev", "test"):
        (root / f"{split}.en").write_text("\n".join(src_lines))
        (root / f"{split}.de").write_text("\n".join(tgt_lines))
        (root / f"{split}.align").write_text("\n".join(align_lines))
    syms = vocab + [v.upper() for v in vocab]
    (root / "dict.txt").write_text("\n".join(f"{s} 5" for s in syms))
    (root / "config.yaml").write_text(
        "vocab_filename: dict.txt\nsrc_lang: en\ntgt_lang: de\n"
    )
    return root


def align_cfg(data):
    return from_dict(TrainConfig, {
        "task": "translation",
        "arch": "transformer_align",
        "criterion": "label_smoothed_cross_entropy_with_alignment",
        "task_cfg": {"load_alignments": True},
        "criterion_cfg": {"label_smoothing": 0.0, "alignment_lambda": 0.5},
        "model": {
            "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
            "encoder_layers": 2, "encoder_attention_heads": 2,
            "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
            "decoder_layers": 2, "decoder_attention_heads": 2,
            "dropout": 0.0, "alignment_layer": -1, "alignment_heads": 1,
        },
        "dataset": {"data": str(data), "max_tokens": 512,
                    "max_source_positions": 32, "max_target_positions": 16,
                    "num_buckets": 2},
        "optimization": {"lr": 5e-3, "warmup_updates": 10, "clip_norm": 5.0},
        "generation": {"beam": 2, "max_len_b": 10, "post_process": "none"},
    })


class TestAlignmentData:
    def test_pharaoh_parsing_and_collation(self, tmp_path):
        from s2t_tpu.tasks import setup_task

        data = make_aligned_corpus(tmp_path / "data")
        cfg = align_cfg(data)
        task = setup_task(cfg)
        ds = task.load_dataset("train")
        item = ds[0]
        assert "alignment" in item
        assert (item["alignment"][:, 0] == item["alignment"][:, 1]).all()
        batch = ds.collater([ds[0], ds[1]])
        assert batch["alignments"].shape[-1] == 2
        assert (batch["alignments"] >= -1).all()


@pytest.mark.slow
class TestAlignmentTraining:
    def test_alignment_loss_supervises_attention(self, tmp_path):
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer

        data = make_aligned_corpus(tmp_path / "data")
        cfg = align_cfg(data)
        task = setup_task(cfg)
        train_ds = task.load_dataset("train", is_train=True)
        model = task.build_model()
        criterion = task.build_criterion()
        trainer = Trainer(
            model, criterion,
            OptimizationConfig(lr=5e-3, warmup_updates=10, clip_norm=5.0),
            forward_fn=task.forward_fn(), seed=1,
        )
        itr = task.get_batch_iterator(train_ds, max_tokens=512, shuffle=False,
                                      batch_size_multiple=8).next_epoch_itr()
        batches = [
            {k: jnp.asarray(v) for k, v in b.items()
             if k not in ("ids", "nsentences")}
            for b in itr
        ]
        state = trainer.init_state(batches[0])
        fwd = task.forward_fn()

        def diag_mass(params):
            out = fwd(model, params, batches[0], True)
            attn = np.asarray(out["align_attn"])  # (B, U, S)
            n = min(attn.shape[1], attn.shape[2], 3)
            return float(np.mean([attn[:, j, j] for j in range(n)]))

        before = diag_mass(state.params)
        losses = []
        for step in range(120):
            for b in batches:
                state, m = trainer.train_step(state, b)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])
        assert "alignment_loss" in m
        after = diag_mass(state.params)
        # supervised pairs are the diagonal: attention mass must concentrate
        assert after > before + 0.1, (before, after)
        assert after > 0.5, after

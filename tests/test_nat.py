"""NAT family tests: CMLM training convergence + iterative refinement decode.

(reference behaviours: fairseq/models/nat/cmlm_transformer.py,
criterions/nat_loss.py, tasks/translation_lev.py,
iterative_refinement_generator.py)
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import OptimizationConfig, TrainConfig, from_dict


def write_copy_corpus(root: Path, n=16, vocab=("aa", "bb", "cc", "dd")):
    """Tiny reversal task: target = reversed source tokens."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    src_lines, tgt_lines = [], []
    for i in range(n):
        L = 3 + int(rng.integers(0, 2))
        toks = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(L)]
        src_lines.append(" ".join(toks))
        tgt_lines.append(" ".join(reversed(toks)))
    for split in ("train", "dev", "test"):
        (root / f"{split}.en").write_text("\n".join(src_lines))
        (root / f"{split}.de").write_text("\n".join(tgt_lines))
    (root / "dict.txt").write_text("\n".join(f"{v} 10" for v in vocab))
    return root


def nat_cfg(data_dir, max_epoch=1):
    return from_dict(TrainConfig, {
        "task": "translation_lev",
        "arch": "cmlm_transformer_small",
        "criterion": "nat_loss",
        "model": {
            "encoder_embed_dim": 64, "encoder_ffn_embed_dim": 128,
            "encoder_layers": 2, "encoder_attention_heads": 2,
            "decoder_embed_dim": 64, "decoder_ffn_embed_dim": 128,
            "decoder_layers": 2, "decoder_attention_heads": 2,
            "dropout": 0.0, "attention_dropout": 0.0, "activation_dropout": 0.0,
        },
        "dataset": {"data": str(data_dir), "max_tokens": 512,
                    "max_source_positions": 32, "max_target_positions": 32,
                    "num_buckets": 2},
        "optimization": {"lr": 5e-3, "warmup_updates": 10, "clip_norm": 2.0,
                         "max_epoch": max_epoch},
        "generation": {"iter_decode_max_iter": 8, "post_process": "none"},
    })


class TestCMLM:
    def test_noise_injection(self):
        from s2t_tpu.tasks.translation_lev import full_mask, random_mask

        tgt = jnp.asarray([[0, 5, 6, 7, 2, 1, 1], [0, 5, 6, 2, 1, 1, 1]])
        fm = full_mask(jax.random.PRNGKey(0), tgt)
        np.testing.assert_array_equal(
            np.asarray(fm), [[0, 3, 3, 3, 2, 1, 1], [0, 3, 3, 2, 1, 1, 1]]
        )
        rm = np.asarray(random_mask(jax.random.PRNGKey(0), tgt))
        # specials untouched, at least one mask
        assert rm[0, 0] == 0 and rm[0, 4] == 2 and rm[1, 3] == 2
        assert (rm == 3).sum() >= 1
        # pads untouched
        assert (rm[:, 5:] == 1).all()

    def test_train_and_refine_decode(self, tmp_path):
        """CMLM learns the tiny reversal task; mask-predict decode recovers
        most references (reference: tests/test_binaries.py NAT rows)."""
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer

        data = write_copy_corpus(tmp_path / "bitext")
        cfg = nat_cfg(data)
        task = setup_task(cfg)
        train_ds = task.load_dataset("train", is_train=True)
        model = task.build_model()
        criterion = task.build_criterion()
        trainer = Trainer(
            model, criterion, OptimizationConfig(lr=5e-3, warmup_updates=10,
                                                 clip_norm=2.0),
            forward_fn=task.forward_fn(), seed=3,
        )
        itr = task.get_batch_iterator(train_ds, max_tokens=512, shuffle=False,
                                      batch_size_multiple=8).next_epoch_itr()
        batches = [
            {k: jnp.asarray(v) for k, v in b.items() if k not in ("ids", "nsentences")}
            for b in itr
        ]
        state = trainer.init_state(batches[0])
        losses = []
        for step in range(150):
            for b in batches:
                state, m = trainer.train_step(state, b)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])

        # refinement decode
        gen = task.build_generator(model)
        test_ds = task.load_dataset("test")
        titr = task.get_batch_iterator(test_ds, max_tokens=512, shuffle=False,
                                       batch_size_multiple=8).next_epoch_itr()
        batch = next(iter(titr))
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k not in ("ids", "nsentences")}
        tokens, scores, enc = gen.generate(state.params, dev)
        toks = np.asarray(tokens)[:, 0]
        B_real = batch["nsentences"]
        matches = 0
        for b in range(B_real):
            hyp = task.decode_tokens(toks[b])
            ref = task.decode_tokens(np.asarray(batch["target"])[b])
            matches += int(hyp == ref)
        assert matches >= B_real * 0.5, f"{matches}/{B_real}"


class TestLevenshteinOps:
    def test_del_targets_identity(self):
        from s2t_tpu.ops.levenshtein import del_targets

        a = jnp.asarray([[0, 5, 6, 7, 2, 1]])
        labels = np.asarray(del_targets(a, a))
        np.testing.assert_array_equal(labels, [[0, 0, 0, 0, 0, 0]])

    def test_del_targets_extra_tokens(self):
        from s2t_tpu.ops.levenshtein import del_targets

        # a has two junk tokens (8, 9) not in b
        a = jnp.asarray([[0, 5, 8, 6, 9, 2]])
        b = jnp.asarray([[0, 5, 6, 2, 1, 1]])
        labels = np.asarray(del_targets(a, b))
        np.testing.assert_array_equal(labels, [[0, 0, 1, 0, 1, 0]])

    def test_del_targets_pads_unlabelled(self):
        from s2t_tpu.ops.levenshtein import del_targets

        a = jnp.asarray([[0, 8, 2, 1, 1, 1]])
        b = jnp.asarray([[0, 2, 1, 1, 1, 1]])
        labels = np.asarray(del_targets(a, b))
        np.testing.assert_array_equal(labels, [[0, 1, 0, 0, 0, 0]])

    def test_compact_and_insert_roundtrip(self):
        from s2t_tpu.models.levenshtein_transformer import (
            compact_tokens, insert_placeholders,
        )

        toks = jnp.asarray([[0, 5, 6, 7, 2, 1, 1]], jnp.int32)
        keep = jnp.asarray([[True, True, False, True, True, False, False]])
        packed, n = compact_tokens(toks, keep, 1)
        np.testing.assert_array_equal(np.asarray(packed), [[0, 5, 7, 2, 1, 1, 1]])
        assert int(n[0]) == 4
        counts = jnp.asarray([[0, 1, 0, 0, 0, 0, 0]], jnp.int32)
        out, new_len = insert_placeholders(packed, counts, 1, 3)
        np.testing.assert_array_equal(np.asarray(out), [[0, 5, 3, 7, 2, 1, 1]])
        assert int(new_len[0]) == 5

    def test_ins_oracle(self):
        from s2t_tpu.models.levenshtein_transformer import ins_oracle_leftmost

        tgt = jnp.asarray([[0, 5, 6, 7, 2, 1]], jnp.int32)
        y_del = jnp.asarray([[0, 7, 2, 1, 1, 1]], jnp.int32)
        counts = np.asarray(ins_oracle_leftmost(y_del, tgt))
        # gaps: between 0 and 7 -> 2 dropped (5, 6); 7..2 -> 0
        np.testing.assert_array_equal(counts[0, :3], [2, 0, 0])

    def test_ins_oracle_canonical_on_repeats(self):
        from s2t_tpu.models.levenshtein_transformer import ins_oracle_leftmost

        # whichever of the four 5s was dropped, the label is the same
        tgt = jnp.asarray([[0, 5, 5, 5, 5, 2]], jnp.int32)
        y_del = jnp.asarray([[0, 5, 5, 5, 2, 1]], jnp.int32)
        counts = np.asarray(ins_oracle_leftmost(y_del, tgt))
        np.testing.assert_array_equal(counts[0, :5], [0, 0, 0, 1, 0])


class TestLevenshtein:
    def test_train_and_refine_decode(self, tmp_path):
        from s2t_tpu.config import OptimizationConfig
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer

        data = write_copy_corpus(tmp_path / "bitext")
        cfg = nat_cfg(data)
        cfg.arch = "levenshtein_transformer_small"
        cfg.model["max_ins"] = 8
        task = setup_task(cfg)
        train_ds = task.load_dataset("train", is_train=True)
        model = task.build_model()
        criterion = task.build_criterion()
        trainer = Trainer(
            model, criterion,
            OptimizationConfig(lr=5e-3, warmup_updates=10, clip_norm=2.0),
            forward_fn=task.forward_fn(), seed=3,
        )
        itr = task.get_batch_iterator(train_ds, max_tokens=512, shuffle=False,
                                      batch_size_multiple=8).next_epoch_itr()
        batches = [
            {k: jnp.asarray(v) for k, v in b.items() if k not in ("ids", "nsentences")}
            for b in itr
        ]
        state = trainer.init_state(batches[0])
        losses = []
        for step in range(400):
            for b in batches:
                state, m = trainer.train_step(state, b)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])

        gen = task.build_generator(model)
        test_ds = task.load_dataset("test")
        titr = task.get_batch_iterator(test_ds, max_tokens=512, shuffle=False,
                                       batch_size_multiple=8).next_epoch_itr()
        batch = next(iter(titr))
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k not in ("ids", "nsentences")}
        tokens, scores, enc = gen.generate(state.params, dev)
        toks = np.asarray(tokens)[:, 0]
        B_real = batch["nsentences"]
        matches = 0
        for b in range(B_real):
            hyp = task.decode_tokens(toks[b])
            ref = task.decode_tokens(np.asarray(batch["target"])[b])
            matches += int(hyp == ref)
        # LevT is harder to overfit than CMLM; require meaningful recovery
        assert matches >= B_real * 0.4, f"{matches}/{B_real}"

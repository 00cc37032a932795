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
            # the match threshold below was calibrated on the threefry stream;
            # LevT's roll-in noise makes tiny-corpus convergence sensitive to
            # the rng stream, so pin the impl rather than chase seeds
            OptimizationConfig(lr=5e-3, warmup_updates=10, clip_norm=2.0,
                               rng_impl="threefry"),
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


class TestDynamicCRF:
    """Unit checks for the low-rank beam-restricted CRF
    (reference: modules/dynamic_crf_layer.py)."""

    def _crf(self, V=5, T=4, beam=5, rank=4, seed=0):
        from s2t_tpu.modules.dynamic_crf import DynamicCRF

        crf = DynamicCRF(V, rank=rank, beam=beam)
        rng = np.random.default_rng(seed)
        em = jnp.asarray(rng.normal(size=(2, T, V)), jnp.float32)
        mask = jnp.asarray([[True] * T, [True, True, True, False]])
        tgt = jnp.asarray(rng.integers(0, V, size=(2, T)), jnp.int32)
        params = crf.init(jax.random.PRNGKey(1), em, tgt, mask,
                          method=DynamicCRF.nll)["params"]
        return crf, params, em, mask, tgt

    def test_viterbi_matches_brute_force(self):
        import itertools

        crf, params, em, mask, tgt = self._crf()
        tokens, score = crf.apply({"params": params}, em, mask,
                                  method="viterbi")
        e1 = np.asarray(params["e1"]["embedding"], np.float64)
        e2 = np.asarray(params["e2"]["embedding"], np.float64)
        emn = np.asarray(em, np.float64)
        for b in range(2):
            T_b = int(np.asarray(mask)[b].sum())
            best, best_path = -1e30, None
            for path in itertools.product(range(5), repeat=T_b):
                s = sum(emn[b, t, path[t]] for t in range(T_b))
                s += sum(e1[path[t]] @ e2[path[t + 1]]
                         for t in range(T_b - 1))
                if s > best:
                    best, best_path = s, path
            np.testing.assert_array_equal(
                np.asarray(tokens)[b, :T_b], best_path
            )
            np.testing.assert_allclose(float(score[b]), best, rtol=1e-5)

    def test_nll_matches_brute_force_partition(self):
        import itertools

        crf, params, em, mask, tgt = self._crf()
        nll = crf.apply({"params": params}, em, tgt, mask, method="nll")
        e1 = np.asarray(params["e1"]["embedding"], np.float64)
        e2 = np.asarray(params["e2"]["embedding"], np.float64)
        emn = np.asarray(em, np.float64)
        tg = np.asarray(tgt)
        for b in range(2):
            T_b = int(np.asarray(mask)[b].sum())
            scores = []
            for path in itertools.product(range(5), repeat=T_b):
                s = sum(emn[b, t, path[t]] for t in range(T_b))
                s += sum(e1[path[t]] @ e2[path[t + 1]]
                         for t in range(T_b - 1))
                scores.append(s)
            logz = np.logaddexp.reduce(scores)
            gold = sum(emn[b, t, tg[b, t]] for t in range(T_b)) + sum(
                e1[tg[b, t]] @ e2[tg[b, t + 1]] for t in range(T_b - 1)
            )
            np.testing.assert_allclose(float(nll[b]), logz - gold, rtol=1e-5)


@pytest.mark.slow
class TestNACRF:
    def test_train_and_viterbi_decode(self, tmp_path):
        """NACRF learns the reversal task single-pass; CRF Viterbi decode
        recovers most references (reference: nacrf_transformer.py)."""
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer

        data = write_copy_corpus(tmp_path / "bitext")
        cfg = nat_cfg(data)
        cfg.arch = "nacrf_transformer"
        cfg.task_cfg = {"noise": "full_mask"}
        cfg.model["crf_beam"] = 4
        cfg.generation.iter_decode_max_iter = 1
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
            {k: jnp.asarray(v) for k, v in b.items()
             if k not in ("ids", "nsentences")}
            for b in itr
        ]
        state = trainer.init_state(batches[0])
        losses = []
        for step in range(150):
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
        matches = sum(
            int(task.decode_tokens(toks[b])
                == task.decode_tokens(np.asarray(batch["target"])[b]))
            for b in range(B_real)
        )
        assert matches >= B_real * 0.5, f"{matches}/{B_real}"

    def test_vanilla_nat_arch(self, tmp_path):
        """nonautoregressive_transformer arch registers and does one
        single-pass decode (reference: nonautoregressive_transformer.py)."""
        from s2t_tpu.tasks import setup_task

        data = write_copy_corpus(tmp_path / "bitext")
        cfg = nat_cfg(data)
        cfg.arch = "nonautoregressive_transformer"
        cfg.task_cfg = {"noise": "full_mask"}
        cfg.generation.iter_decode_max_iter = 1
        task = setup_task(cfg)
        task.load_dataset("train")
        model = task.build_model()
        ds = task.load_dataset("test")
        batch = ds.collater([ds[0], ds[1]])
        fwd = task.forward_fn()
        variables = fwd(model, None, {k: jnp.asarray(v) for k, v in batch.items()
                                      if k not in ("ids", "nsentences")},
                        True, rngs={"params": jax.random.PRNGKey(0)})
        gen = task.build_generator(model)
        tokens, scores, _ = gen.generate(
            variables["params"],
            {k: jnp.asarray(v) for k, v in batch.items()
             if k not in ("ids", "nsentences")},
        )
        assert tokens.shape[1] == 1  # single hypothesis
        assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.slow
class TestInsertionTransformer:
    def test_slot_targets(self):
        """Canvas compaction, slot assignment, and tree weighting
        (reference: insertion_transformer.py _get_ins_targets)."""
        from s2t_tpu.models.insertion_transformer import make_slot_targets

        V = 12
        # target: [4 5 6 7] (core, no eos), keep tokens 5 (idx 1) only
        tgt = jnp.asarray([[4, 5, 6, 7]], jnp.int32)
        keep = jnp.asarray([[False, True, False, False]])
        canvas, soft, valid = make_slot_targets(tgt, keep, 1, V, tau=1.0)
        # canvas = [bos, 5, eos, pad, pad, pad]
        np.testing.assert_array_equal(np.asarray(canvas)[0, :3], [0, 5, 2])
        s = np.asarray(soft)[0]
        # slot 0 (before 5): token 4; slot 1 (after 5): tokens 6,7
        assert s[0, 4] > 0.99
        assert s[1, 6] > 0 and s[1, 7] > 0
        # tree weight: 6 and 7 are equidistant from the center of a 2-run
        np.testing.assert_allclose(s[1, 6], s[1, 7], atol=1e-6)
        # slots 0..n_keep valid only
        np.testing.assert_array_equal(np.asarray(valid)[0, :3], [True, True, False])

    def test_slot_targets_center_weighting(self):
        from s2t_tpu.models.insertion_transformer import make_slot_targets

        V = 12
        tgt = jnp.asarray([[4, 5, 6, 1]], jnp.int32)  # 3 tokens + pad
        keep = jnp.zeros((1, 4), bool)
        canvas, soft, valid = make_slot_targets(tgt, keep, 1, V, tau=1.0)
        s = np.asarray(soft)[0]
        # all three dropped into slot 0; the middle token (5) is preferred
        assert s[0, 5] > s[0, 4] and s[0, 5] > s[0, 6]
        np.testing.assert_allclose(s[0].sum(), 1.0, atol=1e-5)

    def test_train_and_insertion_decode(self, tmp_path):
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer

        # distinct tokens per sentence: with repeated tokens the number of
        # copies in a slot is locally unobservable to an insertion model on a
        # 16-sentence corpus (the reference trains on millions of pairs)
        root = tmp_path / "bitext"
        root.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(0)
        vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
        src_lines, tgt_lines = [], []
        for i in range(16):
            L = 3 + int(rng.integers(0, 2))
            toks = list(rng.choice(vocab, size=L, replace=False))
            src_lines.append(" ".join(toks))
            tgt_lines.append(" ".join(reversed(toks)))
        for split in ("train", "dev", "test"):
            (root / f"{split}.en").write_text("\n".join(src_lines))
            (root / f"{split}.de").write_text("\n".join(tgt_lines))
        (root / "dict.txt").write_text("\n".join(f"{v} 10" for v in vocab))
        data = root
        cfg = nat_cfg(data)
        cfg.arch = "insertion_transformer"
        cfg.generation.iter_decode_eos_penalty = 1.0
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
            {k: jnp.asarray(v) for k, v in b.items()
             if k not in ("ids", "nsentences")}
            for b in itr
        ]
        state = trainer.init_state(batches[0])
        losses = []
        for step in range(400):
            for b in batches:
                state, m = trainer.train_step(state, b)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

        gen = task.build_generator(model, cfg.generation)
        test_ds = task.load_dataset("test")
        titr = task.get_batch_iterator(test_ds, max_tokens=512, shuffle=False,
                                       batch_size_multiple=8).next_epoch_itr()
        batch = next(iter(titr))
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k not in ("ids", "nsentences")}
        tokens, scores, enc = gen.generate(state.params, dev)
        toks = np.asarray(tokens)[:, 0]
        B_real = batch["nsentences"]
        matches = sum(
            int(task.decode_tokens(toks[b])
                == task.decode_tokens(np.asarray(batch["target"])[b]))
            for b in range(B_real)
        )
        assert matches >= B_real * 0.6, (
            f"{matches}/{B_real}",
            [task.decode_tokens(toks[b]) for b in range(min(B_real, 4))],
        )


class TestDynamicCRFPadding:
    def test_all_pad_row_contributes_zero_nll(self):
        """Batch-padding rows (mask all False) must contribute nothing to
        any loss (base.py contract)."""
        from s2t_tpu.modules.dynamic_crf import DynamicCRF

        crf = DynamicCRF(6, rank=4, beam=4)
        rng = np.random.default_rng(0)
        em = jnp.asarray(rng.normal(size=(2, 3, 6)), jnp.float32)
        tgt = jnp.asarray(rng.integers(0, 6, size=(2, 3)), jnp.int32)
        mask = jnp.asarray([[True, True, False], [False, False, False]])
        params = crf.init(jax.random.PRNGKey(0), em, tgt, mask,
                          method=DynamicCRF.nll)["params"]
        nll = np.asarray(crf.apply({"params": params}, em, tgt, mask,
                                   method="nll"))
        assert nll[1] == 0.0, nll
        assert nll[0] != 0.0

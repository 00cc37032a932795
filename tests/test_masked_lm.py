"""Masked-LM (RoBERTa) stack tests.

(reference behaviours: models/roberta/model.py, tasks/masked_lm.py,
criterions/masked_lm.py.)
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.config import OptimizationConfig, TrainConfig, from_dict


class TestMasking:
    def test_bert_masking_stats(self):
        from s2t_tpu.tasks.masked_lm import apply_bert_masking

        rng = jax.random.PRNGKey(0)
        tokens = jnp.full((16, 128), 7, jnp.int32)
        masked, sel = apply_bert_masking(rng, tokens, mask_id=99, vocab_size=50)
        frac = float(jnp.mean(sel.astype(jnp.float32)))
        assert 0.10 < frac < 0.20
        m = np.asarray(masked)
        s = np.asarray(sel)
        # ~80% of selected are <mask>, some random, some unchanged
        n_mask = ((m == 99) & s).sum()
        assert n_mask / s.sum() > 0.6
        # unselected positions untouched
        assert (m[~s] == 7).all()

    def test_pads_never_selected(self):
        from s2t_tpu.tasks.masked_lm import apply_bert_masking

        tokens = jnp.concatenate(
            [jnp.full((4, 60), 7, jnp.int32), jnp.full((4, 68), 1, jnp.int32)], 1
        )
        _, sel = apply_bert_masking(jax.random.PRNGKey(1), tokens, 99, 50)
        assert not np.asarray(sel)[:, 60:].any()


class TestRobertaTraining:
    def test_mlm_loss_decreases(self, tmp_path):
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer

        root = tmp_path / "text"
        root.mkdir()
        rng = np.random.default_rng(0)
        vocab = ["tok%d" % i for i in range(12)]
        lines = [" ".join(vocab[(i + j) % 12] for j in range(20)) for i in range(40)]
        (root / "train.txt").write_text("\n".join(lines))
        (root / "dict.txt").write_text("\n".join(f"{v} 5" for v in vocab))

        cfg = from_dict(TrainConfig, {
            "task": "masked_lm", "arch": "roberta_base",
            "criterion": "masked_lm",
            "model": {"encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                      "encoder_layers": 2, "encoder_attention_heads": 2,
                      "dropout": 0.0, "attention_dropout": 0.0},
            "dataset": {"data": str(root), "max_tokens": 2048,
                        "max_target_positions": 32},
            "optimization": {"lr": 3e-3, "warmup_updates": 10},
        })
        task = setup_task(cfg)
        ds = task.load_dataset("train", is_train=True)
        model = task.build_model()
        crit = task.build_criterion()
        trainer = Trainer(
            model, crit, OptimizationConfig(lr=3e-3, warmup_updates=10,
                                            clip_norm=1.0),
            forward_fn=task.forward_fn(),
        )
        itr = task.get_batch_iterator(ds, max_tokens=2048, shuffle=False,
                                      batch_size_multiple=8).next_epoch_itr()
        batch = {k: jnp.asarray(v) for k, v in next(iter(itr)).items()
                 if k not in ("ids", "nsentences")}
        state = trainer.init_state(batch)
        losses = []
        for _ in range(25):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])

    def test_classification_head(self):
        from s2t_tpu.models.roberta import RobertaConfig, RobertaModel

        cfg = RobertaConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, vocab_size=30, num_classes=3,
            dropout=0.0, attention_dropout=0.0,
        )
        model = RobertaModel(cfg)
        toks = jnp.asarray([[0, 5, 6, 2, 1, 1]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), toks, classification=True)
        out = model.apply(params, toks, classification=True)
        assert out["cls_logits"].shape == (1, 3)
        assert out["lm_logits"].shape == (1, 6, 30)


class TestLegacyMaskedLM:
    """BERT pretraining: sentence-pair MLM + NSP (reference:
    tasks/legacy_masked_lm.py + data/legacy/block_pair_dataset.py)."""

    def _corpus(self, root):
        from pathlib import Path

        root = Path(root)
        root.mkdir(parents=True, exist_ok=True)
        # cyclic topical structure: the sentence after "a..." is "b...",
        # after "b..." is "c..." etc -> NSP is learnable from first tokens
        vocab = ["aa", "bb", "cc", "dd"]
        lines = []
        for i in range(24):
            w = vocab[i % 4]
            lines.append(" ".join([w] * 3))
        for split in ("train", "valid"):
            (root / f"{split}.txt").write_text("\n".join(lines))
        (root / "dict.txt").write_text("\n".join(f"{v} 10" for v in vocab))
        return root

    def _cfg(self, data):
        from s2t_tpu.config import TrainConfig, from_dict

        return from_dict(TrainConfig, {
            "task": "legacy_masked_lm",
            "criterion": "legacy_masked_lm",
            "arch": "bert_base",
            "model": {
                "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                "encoder_layers": 2, "encoder_attention_heads": 2,
                "dropout": 0.0, "attention_dropout": 0.0,
            },
            "dataset": {"data": str(data), "max_tokens": 2048,
                        "max_target_positions": 16},
            "optimization": {"lr": 3e-3, "warmup_updates": 10,
                             "clip_norm": 2.0},
        })

    def test_sentence_pair_layout(self, tmp_path):
        from s2t_tpu.tasks import setup_task

        task = setup_task(self._cfg(self._corpus(tmp_path / "d")))
        ds = task.load_dataset("train")
        ex = ds[0]
        toks, segs = ex["tokens"], ex["segments"]
        d = task.dictionary
        assert toks[0] == d.bos()  # CLS
        seps = np.where(toks == d.eos())[0]
        assert len(seps) == 2
        # segment 1 covers B + trailing SEP, nothing else
        assert segs[seps[0]] == 0 and segs[seps[1]] == 1
        assert segs[: seps[0] + 1].sum() == 0
        assert ex["nsp_label"] in (0, 1)
        # different epochs can draw different negatives
        ds.set_epoch(2)
        _ = ds[0]

    def test_trains_mlm_and_nsp(self, tmp_path):
        import jax.numpy as jnp

        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer

        cfg = self._cfg(self._corpus(tmp_path / "d"))
        task = setup_task(cfg)
        train_ds = task.load_dataset("train", is_train=True)
        model = task.build_model()
        assert model.cfg.num_segments == 2 and model.cfg.num_classes == 2
        criterion = task.build_criterion()
        trainer = Trainer(
            model, criterion,
            OptimizationConfig(lr=3e-3, warmup_updates=10, clip_norm=2.0),
            forward_fn=task.forward_fn(), seed=1,
        )
        itr = task.get_batch_iterator(train_ds, max_tokens=2048, shuffle=False,
                                      batch_size_multiple=8).next_epoch_itr()
        batches = [
            {k: jnp.asarray(v) for k, v in b.items()
             if k not in ("ids", "nsentences")}
            for b in itr
        ]
        state = trainer.init_state(batches[0])
        first = last = None
        nsp_corr = nsp_tot = 0.0
        for step in range(120):
            for b in batches:
                state, m = trainer.train_step(state, b)
            if first is None and step == 0:
                first = float(m["loss"])
            last = float(m["loss"])
            if step >= 110:
                nsp_corr += float(m["nsp_correct"])
                nsp_tot += float(m["nsp_total"])
        assert last < first, (first, last)
        assert "nsp_loss" in m
        # NSP learnable from the cyclic corpus: well above chance at the end
        assert nsp_corr / max(nsp_tot, 1.0) > 0.7, nsp_corr / nsp_tot

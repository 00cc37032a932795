"""sentence_prediction + multilingual MT task tests."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.config import OptimizationConfig, TrainConfig, from_dict


class TestSentencePrediction:
    def test_classification_trains(self, tmp_path):
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer

        root = tmp_path / "cls"
        root.mkdir()
        rows = []
        for i in range(24):
            if i % 2 == 0:
                rows.append("aa aa bb\tpos")
            else:
                rows.append("cc dd cc\tneg")
        (root / "train.tsv").write_text("\n".join(rows))
        (root / "dict.txt").write_text("aa 5\nbb 5\ncc 5\ndd 5")
        (root / "labels.txt").write_text("pos neg")
        cfg = from_dict(TrainConfig, {
            "task": "sentence_prediction", "arch": "roberta_base",
            "criterion": "sentence_prediction",
            "model": {"encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                      "encoder_layers": 1, "encoder_attention_heads": 2,
                      "dropout": 0.0, "attention_dropout": 0.0},
            "dataset": {"data": str(root), "max_tokens": 512,
                        "max_target_positions": 16},
            "optimization": {"lr": 3e-3, "warmup_updates": 5},
        })
        task = setup_task(cfg)
        ds = task.load_dataset("train", is_train=True)
        trainer = Trainer(
            task.build_model(), task.build_criterion(),
            OptimizationConfig(lr=3e-3, warmup_updates=5, clip_norm=1.0),
            forward_fn=task.forward_fn(),
        )
        itr = task.get_batch_iterator(ds, max_tokens=512, shuffle=False,
                                      batch_size_multiple=8).next_epoch_itr()
        batch = {k: jnp.asarray(v) for k, v in next(iter(itr)).items()
                 if k not in ("ids", "nsentences")}
        state = trainer.init_state(batch)
        losses, accs = [], []
        for _ in range(30):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
            accs.append(float(m["n_correct"]) / float(m["total"]))
        assert losses[-1] < losses[0]
        assert accs[-1] > 0.9, accs[-1]


class TestMultilingualMT:
    def test_lang_pairs_and_tags(self, tmp_path):
        from s2t_tpu.tasks import setup_task

        root = tmp_path / "multi"
        root.mkdir()
        (root / "train.en-de.en").write_text("aa bb\ncc dd\n")
        (root / "train.en-de.de").write_text("bb aa\ndd cc\n")
        (root / "train.en-fr.en").write_text("aa\n")
        (root / "train.en-fr.fr").write_text("aa aa\n")
        (root / "dict.txt").write_text(
            "aa 5\nbb 5\ncc 5\ndd 5\n<lang:de> 1\n<lang:fr> 1"
        )
        cfg = from_dict(TrainConfig, {
            "task": "translation_multi_simple_epoch",
            "arch": "transformer_iwslt_de_en",
            "task_cfg": {"lang_pairs": ["en-de", "en-fr"],
                         "sampling_alpha": 0.5},
            "dataset": {"data": str(root)},
        })
        task = setup_task(cfg)
        ds = task.load_dataset("train", is_train=True)
        assert len(ds) == 3
        # items from the fr part carry the fr tag, de part the de tag
        d = task.tgt_dict
        assert ds[0]["target"][0] == d.index("<lang:de>")
        assert ds[2]["target"][0] == d.index("<lang:fr>")
        order = ds.ordered_indices(shuffle=True, seed=1, epoch=1)
        assert len(order) >= 2  # ratios may subsample the majority set per epoch


class TestSentenceRanking:
    def test_ranking_trains_and_ranks(self, tmp_path):
        """sentence_ranking (reference: tasks/sentence_ranking.py): the gold
        candidate learns to outscore the alternatives."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from s2t_tpu.config import OptimizationConfig, TrainConfig, from_dict
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer

        root = tmp_path / "data"
        root.mkdir()
        # gold candidate always contains the token "yes"
        rng = np.random.default_rng(0)
        rows = []
        for i in range(16):
            gold = int(rng.integers(0, 3))
            cands = ["no bb cc", "no cc dd", "no dd bb"]
            cands[gold] = "yes " + cands[gold][3:]
            rows.append("\t".join(cands + [str(gold)]))
        for split in ("train", "dev"):
            (root / f"{split}.tsv").write_text("\n".join(rows))
        (root / "dict.txt").write_text(
            "\n".join(f"{s} 5" for s in ["yes", "no", "bb", "cc", "dd"])
        )
        cfg = from_dict(TrainConfig, {
            "task": "sentence_ranking", "arch": "roberta_base",
            "criterion": "sentence_ranking",
            "model": {"encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                      "encoder_layers": 1, "encoder_attention_heads": 2,
                      "dropout": 0.0, "attention_dropout": 0.0},
            "dataset": {"data": str(root), "max_tokens": 4096,
                        "max_target_positions": 16},
            "optimization": {"lr": 3e-3, "warmup_updates": 5, "clip_norm": 5.0},
        })
        task = setup_task(cfg)
        ds = task.load_dataset("train", is_train=True)
        model = task.build_model()
        criterion = task.build_criterion()
        trainer = Trainer(
            model, criterion,
            OptimizationConfig(lr=3e-3, warmup_updates=5, clip_norm=5.0),
            forward_fn=task.forward_fn(), seed=0,
        )
        batch = ds.collater([ds[i] for i in range(16)])
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k not in ("ids", "nsentences")}
        state = trainer.init_state(dev)
        losses = []
        for _ in range(60):
            state, m = trainer.train_step(state, dev)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
        acc = float(m["n_correct"]) / float(m["total"])
        assert acc > 0.8, acc


class TestCrossLingualLM:
    def test_lang_tagged_blocks_and_training(self, tmp_path):
        """cross_lingual_lm (reference: tasks/cross_lingual_lm.py): per-lang
        corpora with <lang:xx> conditioning train under the MLM objective."""
        import jax.numpy as jnp
        import numpy as np

        from s2t_tpu.config import OptimizationConfig, TrainConfig, from_dict
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer

        root = tmp_path / "data"
        for lang, n in (("en", 6), ("fr", 3)):
            (root / lang).mkdir(parents=True)
            (root / lang / "train.txt").write_text(
                "\n".join("aa bb cc dd " * 8 for _ in range(n))
            )
        (root / "dict.txt").write_text("aa 5\nbb 5\ncc 5\ndd 5\n")
        cfg = from_dict(TrainConfig, {
            "task": "cross_lingual_lm", "arch": "roberta_base",
            "criterion": "masked_lm",
            "task_cfg": {"sampling_alpha": 0.5},
            "model": {"encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                      "encoder_layers": 1, "encoder_attention_heads": 2,
                      "dropout": 0.0, "attention_dropout": 0.0},
            "dataset": {"data": str(root), "max_tokens": 2048,
                        "max_target_positions": 32},
            "optimization": {"lr": 3e-3, "warmup_updates": 5, "clip_norm": 5.0},
        })
        task = setup_task(cfg)
        assert task.langs == ["en", "fr"]
        ds = task.load_dataset("train", is_train=True)
        item = ds[0]
        assert int(item["tokens"][0]) in set(task.lang_tags.values())
        model = task.build_model()
        criterion = task.build_criterion()
        trainer = Trainer(
            model, criterion,
            OptimizationConfig(lr=3e-3, warmup_updates=5, clip_norm=5.0),
            forward_fn=task.forward_fn(), seed=0,
        )
        batch = ds.collater([ds[i] for i in range(min(8, len(ds)))])
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k not in ("ids", "nsentences")}
        state = trainer.init_state(dev)
        losses = []
        for _ in range(40):
            state, m = trainer.train_step(state, dev)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])

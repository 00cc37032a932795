"""multilingual_transformer: per-pair models with parameter sharing.

(reference: fairseq/models/multilingual_transformer.py:23-228 +
tasks/multilingual_translation.py — round-robin training over lang pairs,
--share-encoder-embeddings/--share-decoder-embeddings/--share-encoders/
--share-decoders.)
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import TrainConfig, from_dict


def make_multi_corpus(root: Path, n=24):
    """Two copy-ish pairs over one joint dict: en->de uppercases, en->fr
    reverses."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for split in ("train", "dev"):
        src, de, fr_src, fr = [], [], [], []
        for i in range(n):
            L = int(rng.integers(2, 5))
            toks = [vocab[int(rng.integers(len(vocab)))] for _ in range(L)]
            src.append(" ".join(toks))
            de.append(" ".join(t.upper() for t in toks))
            toks2 = [vocab[int(rng.integers(len(vocab)))] for _ in range(L)]
            fr_src.append(" ".join(toks2))
            fr.append(" ".join(reversed(toks2)))
        (root / f"{split}.en-de.en").write_text("\n".join(src))
        (root / f"{split}.en-de.de").write_text("\n".join(de))
        (root / f"{split}.en-fr.en").write_text("\n".join(fr_src))
        (root / f"{split}.en-fr.fr").write_text("\n".join(fr))
    syms = vocab + [v.upper() for v in vocab]
    (root / "dict.txt").write_text("\n".join(f"{s} 5" for s in syms))
    (root / "config.yaml").write_text(
        "vocab_filename: dict.txt\nsrc_lang: en\ntgt_lang: de\n"
    )
    return root


def multi_cfg(data, save, max_epoch=40, **model_kw):
    model = {
        "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
        "encoder_layers": 2, "encoder_attention_heads": 2,
        "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
        "decoder_layers": 1, "decoder_attention_heads": 2,
        "dropout": 0.0, "encoder_normalize_before": True,
        "decoder_normalize_before": True,
    }
    model.update(model_kw)
    return from_dict(
        TrainConfig,
        {
            "task": "multilingual_translation",
            "arch": "multilingual_transformer",
            "criterion": "label_smoothed_cross_entropy",
            "model": model,
            "criterion_cfg": {"label_smoothing": 0.0},
            "task_cfg": {"lang_pairs": ["en-de", "en-fr"]},
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
        },
    )


def _build(tmp_path, **model_kw):
    from s2t_tpu.tasks import setup_task

    data = make_multi_corpus(tmp_path / "data")
    cfg = multi_cfg(data, tmp_path / "ckpt", **model_kw)
    task = setup_task(cfg)
    return cfg, task


class TestSharingOptions:
    def _param_names(self, task):
        model = task.build_model()
        ds = task.load_dataset("train", is_train=True)
        batch = ds.collater([ds[i] for i in range(2)])
        batch = jax.tree.map(jnp.asarray, batch)
        variables = model.init(jax.random.PRNGKey(0), batch["pairs"],
                               deterministic=True)
        names = set(variables["params"].keys())
        n_params = sum(int(np.prod(x.shape))
                       for x in jax.tree.leaves(variables["params"]))
        return model, variables, batch, names, n_params

    def test_separate_by_default(self, tmp_path):
        _, task = _build(tmp_path)
        model, variables, batch, names, n_sep = self._param_names(task)
        assert {"encoder_en", "decoder_de", "decoder_fr"} <= names
        # one src lang -> one encoder even without sharing
        assert "encoder_shared" not in names

        # all-pairs forward == pair_view forward on the same params
        out = model.apply({"params": variables["params"]}, batch["pairs"],
                          deterministic=True)
        for pair in ("en-de", "en-fr"):
            view = model.pair_view(pair)
            b = batch["pairs"][pair]
            vout = view.apply(
                {"params": variables["params"]}, b["src_tokens"],
                b["src_lengths"], b["prev_tokens"], deterministic=True,
                method=view.forward_pair,
            )
            np.testing.assert_allclose(
                np.asarray(out["pairs"][pair]["decoder_logits"]),
                np.asarray(vout["decoder_logits"]), rtol=1e-6, atol=1e-6,
            )

    def test_share_decoders_and_embeddings(self, tmp_path):
        _, task = _build(tmp_path)
        _, _, _, _, n_sep = self._param_names(task)

        _, task2 = _build(tmp_path, share_decoders=True)
        _, _, _, names2, n_shared = self._param_names(task2)
        assert "decoder_shared" in names2
        assert "decoder_de" not in names2 and "decoder_fr" not in names2
        assert n_shared < n_sep

        _, task3 = _build(
            tmp_path, share_decoder_embeddings=True, share_encoders=True
        )
        _, _, _, names3, n3 = self._param_names(task3)
        assert "shared_decoder_embed" in names3
        assert "encoder_shared" in names3
        assert n3 < n_sep

    def test_share_all_embeddings(self, tmp_path):
        _, task = _build(tmp_path, share_all_embeddings=True)
        _, variables, _, names, _ = self._param_names(task)
        assert "shared_embed" in names
        # no per-module embeddings anywhere
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        emb_paths = [jax.tree_util.keystr(p) for p, _ in flat
                     if "embed_tokens" in jax.tree_util.keystr(p)]
        assert not emb_paths, emb_paths


@pytest.mark.slow
class TestRoundRobinTraining:
    def test_trains_and_per_pair_logs(self, tmp_path):
        from s2t_tpu.cli.train import main as train_main

        data = make_multi_corpus(tmp_path / "data")
        cfg = multi_cfg(data, tmp_path / "ckpt", max_epoch=30)
        out = train_main(cfg)
        hist = out["history"]
        assert hist[-1]["loss"] < hist[0]["loss"]
        # per-pair logging keys survive aggregation (reference:
        # multilingual_translation.py:320 f"{key}:{lang_pair}" logs)
        assert any(k.startswith("en-de:") for k in hist[-1])
        assert any(k.startswith("en-fr:") for k in hist[-1])

        # generation decodes ONE pair through pair_view against the full
        # checkpoint params (reference: eval lang pair selection)
        from s2t_tpu.cli.generate import main as generate_main

        cfg.dataset.gen_subset = "dev"
        cfg.generation.results_path = str(tmp_path / "gen")
        gen = generate_main(cfg, out["state"].params, task=out["task"])
        assert gen["n_utts"] > 0
        assert all(r["hyp"] is not None for r in gen["results"].values())


class TestZipDataset:
    def test_round_robin_wraps_shorter(self, tmp_path):
        from s2t_tpu.data.multilingual import RoundRobinZipDataset

        class Toy:
            def __init__(self, n, w):
                self.n, self.w = n, w
                self.n_frames = np.full(n, w, dtype=np.int64)

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return {"id": i, "w": self.w}

            def collater(self, samples, **kw):
                return {"ids": np.array([s["id"] for s in samples]),
                        "ntokens": float(len(samples) * self.w)}

        ds = RoundRobinZipDataset({"a-b": Toy(5, 3), "a-c": Toy(2, 7)})
        assert len(ds) == 5
        order = ds.ordered_indices(shuffle=False)
        # row cost = sum of per-pair costs
        assert int(ds.n_frames[0]) == 10
        item = ds[4]
        assert item["a-b"]["id"] == 4 and item["a-c"]["id"] == 0  # wrapped
        batch = ds.collater([ds[i] for i in order[:2]])
        assert set(batch["pairs"]) == {"a-b", "a-c"}
        assert batch["ntokens"] == 2 * 3 + 2 * 7

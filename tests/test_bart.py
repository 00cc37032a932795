"""BART family tests: noising, model, denoising task, mBART MT fine-tune.

(reference behaviours: fairseq/models/bart/model.py, data/denoising_dataset.py,
tasks/denoising.py, tasks/multilingual_denoising.py,
tasks/translation_from_pretrained_bart.py.)
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import TrainConfig, from_dict
from s2t_tpu.data.denoising_dataset import DenoisingDataset, bart_noise
from s2t_tpu.data.dictionary import Dictionary


def make_dict(tmp_path, extra=()):
    syms = ["aa", "bb", "cc", "dd", "ee", "."] + list(extra)
    (tmp_path / "dict.txt").write_text("\n".join(f"{s} 5" for s in syms))
    d = Dictionary.load(tmp_path / "dict.txt")
    d.add_symbol("<mask>")
    return d


class TestBartNoise:
    def test_infill_shortens_and_masks(self):
        rng = np.random.default_rng(0)
        tokens = np.asarray(list(range(4, 24)) + [2], np.int32)
        out = bart_noise(tokens, rng, mask_id=30, vocab_size=40,
                         mask_ratio=0.5, random_ratio=0.0,
                         permute_sentence_ratio=0.0)
        assert out[-1] == 2
        assert (out == 30).sum() >= 1, out
        # span infilling replaces multi-token spans by one mask -> shorter
        assert len(out) < len(tokens)

    def test_zero_ratio_identity(self):
        rng = np.random.default_rng(0)
        tokens = np.asarray([4, 5, 6, 7, 2], np.int32)
        out = bart_noise(tokens, rng, mask_id=30, vocab_size=40,
                         mask_ratio=0.0, permute_sentence_ratio=0.0)
        np.testing.assert_array_equal(out, tokens)

    def test_sentence_permutation_preserves_multiset(self):
        rng = np.random.default_rng(1)
        # three "sentences" separated by a full stop id 9
        tokens = np.asarray([4, 5, 9, 6, 7, 9, 8, 9, 2], np.int32)
        out = bart_noise(tokens, rng, mask_id=30, vocab_size=40,
                         mask_ratio=0.0, permute_sentence_ratio=1.0,
                         full_stop_id=9)
        assert sorted(out.tolist()) == sorted(tokens.tolist())

    def test_dataset_epoch_varies_noise(self, tmp_path):
        d = make_dict(tmp_path)
        (tmp_path / "train.txt").write_text(
            "\n".join("aa bb cc dd ee aa bb cc" for _ in range(4))
        )
        ds = DenoisingDataset(tmp_path / "train.txt", d, mask_ratio=0.5)
        a = ds[0]["source"].tolist()
        ds.set_epoch(2)
        b = ds[0]["source"].tolist()
        assert a != b  # fresh corruption per epoch
        np.testing.assert_array_equal(ds[0]["target"], ds.items[0])


class TestBARTModel:
    def _model(self, num_classes=0):
        from s2t_tpu.models.build import build_model

        return build_model(
            "bart_base",
            {"encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
             "encoder_layers": 2, "encoder_attention_heads": 2,
             "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
             "decoder_layers": 2, "decoder_attention_heads": 2,
             "dropout": 0.0, "num_classes": num_classes,
             "max_source_positions": 64, "max_target_positions": 64},
            vocab_size=30,
        )

    def test_forward_and_shared_embeddings(self):
        m = self._model()
        src = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)
        lens = jnp.asarray([4, 3], jnp.int32)
        prev = jnp.asarray([[2, 4, 5], [2, 7, 8]], jnp.int32)
        params = m.init(jax.random.PRNGKey(0), src, lens, prev)["params"]
        # one shared table: encoder/decoder have no own embed_tokens
        assert "shared" in params
        assert "embed_tokens" not in params.get("encoder", {})
        assert "embed_tokens" not in params.get("decoder", {})
        out = m.apply({"params": params}, src, lens, prev)
        assert out["decoder_logits"].shape == (2, 3, 30)

    def test_classification_head(self):
        m = self._model(num_classes=3)
        src = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)
        lens = jnp.asarray([4, 3], jnp.int32)
        prev = jnp.asarray([[2, 4, 5], [2, 7, 8]], jnp.int32)
        params = m.init(jax.random.PRNGKey(0), src, lens, prev,
                        classification=True)["params"]
        from s2t_tpu.models.bart import BARTModel

        logits = m.apply({"params": params}, src, lens,
                         method=BARTModel.classify)
        assert logits.shape == (2, 3)
        assert np.isfinite(np.asarray(logits)).all()
        out = m.apply({"params": params}, src, lens, prev,
                      classification=True)
        np.testing.assert_allclose(
            np.asarray(out["cls_logits"]), np.asarray(logits), atol=1e-5
        )


@pytest.mark.slow
class TestDenoisingTask:
    def _cfg(self, data, save, task="denoising", **task_cfg):
        return from_dict(
            TrainConfig,
            {
                "task": task, "arch": "bart_base",
                "criterion": "label_smoothed_cross_entropy",
                "task_cfg": {"mask_ratio": 0.3, **task_cfg},
                "model": {
                    "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                    "encoder_layers": 2, "encoder_attention_heads": 2,
                    "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
                    "decoder_layers": 1, "decoder_attention_heads": 2,
                    "dropout": 0.0,
                },
                "criterion_cfg": {"label_smoothing": 0.0},
                "common": {"seed": 3, "log_interval": 50},
                "dataset": {
                    "data": str(data), "max_tokens": 512,
                    "max_source_positions": 64, "max_target_positions": 64,
                    "num_buckets": 2, "required_batch_size_multiple": 2,
                },
                "optimization": {
                    "max_epoch": 12, "lr": 3e-3, "warmup_updates": 10,
                    "warmup_init_lr": 1e-4, "clip_norm": 5.0,
                },
                "checkpoint": {"save_dir": str(save), "async_save": False},
                "generation": {"beam": 1, "max_len_b": 16, "post_process": "none"},
            },
        )

    def test_denoising_trains(self, tmp_path):
        from s2t_tpu.cli.train import main as train_main

        root = tmp_path / "data"
        root.mkdir()
        rng = np.random.default_rng(0)
        vocab = ["aa", "bb", "cc", "dd", "ee"]
        lines = [
            " ".join(vocab[int(rng.integers(5))] for _ in range(8)) + " ."
            for _ in range(24)
        ]
        for split in ("train", "dev"):
            (root / f"{split}.txt").write_text("\n".join(lines))
        (root / "dict.txt").write_text(
            "\n".join(f"{s} 5" for s in vocab + ["."])
        )
        cfg = self._cfg(root, tmp_path / "ckpt")
        out = train_main(cfg)
        assert out["history"][-1]["loss"] < out["history"][0]["loss"]

    def test_multilingual_denoising_loads_and_tags(self, tmp_path):
        from s2t_tpu.tasks import setup_task

        root = tmp_path / "data"
        for lang, n in (("en", 8), ("de", 4)):
            (root / lang).mkdir(parents=True)
            (root / lang / "train.txt").write_text(
                "\n".join("aa bb cc dd" for _ in range(n))
            )
        (root / "dict.txt").write_text("aa 5\nbb 5\ncc 5\ndd 5\n")
        cfg = self._cfg(root, tmp_path / "ckpt", task="multilingual_denoising",
                        sampling_alpha=0.5)
        task = setup_task(cfg)
        assert task.langs == ["de", "en"]
        ds = task.load_dataset("train", is_train=True)
        item = ds[0]
        tag_ids = set(task.lang_tags.values())
        assert int(item["source"][-1]) in tag_ids  # appended to source
        assert int(item["target"][0]) in tag_ids  # prepended to target

    def test_translation_from_pretrained_bart(self, tmp_path):
        from s2t_tpu.tasks import setup_task

        root = tmp_path / "data"
        root.mkdir()
        (root / "train.en").write_text("aa bb\ncc dd\n")
        (root / "train.de").write_text("AA BB\nCC DD\n")
        (root / "dict.txt").write_text(
            "\n".join(f"{s} 5" for s in
                      ["aa", "bb", "cc", "dd", "AA", "BB", "CC", "DD"])
        )
        (root / "config.yaml").write_text(
            "vocab_filename: dict.txt\nsrc_lang: en\ntgt_lang: de\n"
        )
        cfg = self._cfg(root, tmp_path / "ckpt",
                        task="translation_from_pretrained_bart",
                        langs="en,de")
        cfg.arch = "mbart_large"
        task = setup_task(cfg)
        ds = task.load_dataset("train")
        item = ds[0]
        assert int(item["source"][-1]) == task.src_dict.index("<lang:en>")
        assert int(item["target"][0]) == task.tgt_dict.index("<lang:de>")
        model = task.build_model()
        batch = ds.collater([ds[0], ds[1]])
        fwd = task.forward_fn()
        variables = fwd(model, None, batch, True,
                        rngs={"params": jax.random.PRNGKey(0)})
        out = fwd(model, variables["params"], batch, True)
        assert out["decoder_logits"].shape[-1] == len(task.tgt_dict)

"""mmap indexed datasets, preprocess CLI, tokenizers, hub API, watchdog.

(reference behaviours: data/indexed_dataset.py:576, fairseq_cli/preprocess.py,
data/encoders/{moses_tokenizer,gpt2_bpe}.py, hub_utils.py:298,
distributed/distributed_timeout_wrapper.py.)
"""

import time
from pathlib import Path

import numpy as np
import pytest


class TestIndexedDataset:
    def test_roundtrip(self, tmp_path):
        from s2t_tpu.data.indexed_dataset import (
            MMapIndexedDataset, MMapIndexedDatasetBuilder,
        )

        b = MMapIndexedDatasetBuilder(tmp_path / "x")
        items = [[4, 5, 6, 2], [7, 2], [8, 9, 10, 11, 2]]
        for it in items:
            b.add_item(it)
        b.finalize()
        ds = MMapIndexedDataset(tmp_path / "x")
        assert len(ds) == 3
        np.testing.assert_array_equal(ds.sizes, [4, 2, 5])
        for i, it in enumerate(items):
            np.testing.assert_array_equal(ds[i], it)

    def test_preprocess_cli_and_train_load(self, tmp_path):
        from s2t_tpu.cli.preprocess import main as preprocess_main
        from s2t_tpu.data.indexed_dataset import BinarizedTranslationDataset

        raw = tmp_path / "raw"
        raw.mkdir()
        (raw / "train.en").write_text("a b c\nb c\na a b c\n")
        (raw / "train.de").write_text("c b a\nc b\nc b a a\n")
        dest = tmp_path / "bin"
        preprocess_main([
            "--source-lang", "en", "--target-lang", "de",
            "--trainpref", str(raw / "train"), "--destdir", str(dest),
            "--joined-dictionary",
        ])
        assert (dest / "dict.en.txt").exists()
        ds = BinarizedTranslationDataset(
            dest / "train.en-de.en", dest / "train.en-de.de"
        )
        assert len(ds) == 3
        item = ds[0]
        assert item["source"][-1] == 2  # eos appended
        assert "target" in item
        batch = ds.collater([ds[0], ds[1]])
        assert batch["src_tokens"].shape[0] == 2
        assert "prev_tokens" in batch


class TestTokenizers:
    def test_moses_roundtrip(self):
        from s2t_tpu.data.tokenizer import MosesTokenizer

        t = MosesTokenizer()
        enc = t.encode_line("Hello, world! It's 3.14 (approx).")
        assert " , " in " " + enc + " "
        assert "3.14" in enc  # number protected
        assert "( approx" in enc
        dec = t.decode(enc)
        assert dec.startswith("Hello,")

    def test_spm_unk_rendered_not_dropped(self, tmp_path):
        # decode() must keep OOV spans visible (SPM renders unk as " ⁇ ";
        # the reference's post_process("sentencepiece") keeps the piece) —
        # silently deleting <unk> masks coverage problems (ADVICE r4)
        from s2t_tpu.data.tokenizer import SPMTokenizer

        tok = SPMTokenizer.train(
            ["abc abd bcd"] * 5, 24, tmp_path / "spm.json",
            special_tokens=["<unk>", "<lang:de>"],  # pre-deduped <unk>
        )
        out = tok.decode(["▁abc", "<unk>", "▁bcd"])
        assert "⁇" in out and out.startswith("abc") and out.endswith("bcd")
        # the explicit <unk> in special_tokens must not duplicate id rows
        assert tok.vocab().count("<unk>") == 1

    def test_gpt2_bpe_train_encode_decode(self, tmp_path):
        from s2t_tpu.data.tokenizer import GPT2Tokenizer

        lines = ["the cat sat on the mat", "the dog ate the food",
                 "cats and dogs"] * 10
        tok = GPT2Tokenizer.train(lines, 400, tmp_path / "gpt2.json")
        enc = tok.encode_line("the cat ate")
        assert len(enc.split()) >= 1
        assert tok.decode(enc) == "the cat ate"
        # reload from file
        tok2 = GPT2Tokenizer(model_path=tmp_path / "gpt2.json")
        assert tok2.encode_line("the cat ate") == enc


class TestByteAndBertTokenizers:
    def test_byte_roundtrip(self):
        from s2t_tpu.data.tokenizer import ByteTokenizer

        t = ByteTokenizer()
        for text in ("hello world", "naïve café", "日本語 text", "tabs\tand\nnewlines"):
            pieces = t.encode(text)
            assert all(" " not in p for p in pieces)
            assert t.decode(pieces) == text
        assert len(t.vocab()) == 256

    def test_bert_wordpiece(self, tmp_path):
        from s2t_tpu.data.tokenizer import BertWordpieceTokenizer

        lines = ["the quick brown fox", "the lazy dog", "quick thinking"]
        tok = BertWordpieceTokenizer.train(
            lines, vocab_size=64, model_path=tmp_path / "vocab.txt"
        )
        pieces = tok.encode("the quicker")
        assert pieces[0] == "the"
        # "quickest" greedily matches "quick" + ## continuations
        assert pieces[1] == "quick" and all(
            p.startswith("##") for p in pieces[2:]
        )
        assert tok.decode(pieces) == "the quicker"
        # unknown characters fall back to [UNK]
        assert tok.encode("Ω")[0] == "[UNK]"
        # vocab file round-trip
        tok2 = BertWordpieceTokenizer(model_path=tmp_path / "vocab.txt")
        assert tok2.encode("the quicker") == pieces

    def test_build_tokenizer_byte(self):
        from s2t_tpu.data.tokenizer import build_tokenizer

        t = build_tokenizer({"bpe": "byte"})
        assert t.decode(t.encode("abc")) == "abc"


class TestWatchdog:
    def test_fires_on_stall(self):
        from s2t_tpu.utils.watchdog import Watchdog

        fired = []
        w = Watchdog(timeout=0.3, on_timeout=lambda: fired.append(1),
                     kill=False).start()
        time.sleep(1.0)
        w.stop()
        assert w.fired and fired

    def test_heartbeat_prevents_fire(self):
        from s2t_tpu.utils.watchdog import Watchdog

        w = Watchdog(timeout=0.5, kill=False).start()
        for _ in range(6):
            time.sleep(0.15)
            w.beat()
        w.stop()
        assert not w.fired


class TestHub:
    def test_from_pretrained_text(self, tmp_path):
        import sys

        sys.path.insert(0, "/root/repo/tests")
        import jax
        from test_nat import write_copy_corpus

        from s2t_tpu import hub
        from s2t_tpu.config import TrainConfig, from_dict
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.utils.checkpoint import save_pytree
        import json

        data = write_copy_corpus(tmp_path / "bitext")
        cfg_d = {
            "task": "translation", "arch": "transformer_iwslt_de_en",
            "model": {"encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                      "encoder_layers": 1, "encoder_attention_heads": 2,
                      "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
                      "decoder_layers": 1, "decoder_attention_heads": 2},
            "dataset": {"data": str(data)},
            "generation": {"beam": 2, "max_len_b": 8, "post_process": "none"},
        }
        cfg = from_dict(TrainConfig, cfg_d)
        task = setup_task(cfg)
        model = task.build_model()
        import jax.numpy as jnp

        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
            jnp.full((1,), 4, jnp.int32), jnp.zeros((1, 3), jnp.int32),
        )["params"]
        ckpt = tmp_path / "m.pt"
        save_pytree(ckpt, {"params": params})
        (str(ckpt) + ".json")
        with open(str(ckpt) + ".json", "w") as f:
            json.dump({"model": cfg_d["model"]}, f)

        m = hub.from_pretrained(ckpt, data_dir=str(data), config=cfg_d)
        out = m.translate("aa bb cc")
        assert isinstance(out, str)


class TestBacktranslation:
    def test_synthetic_pairs_with_toy_reverser(self, tmp_path):
        """BacktranslationDataset (reference: data/backtranslation_dataset.py):
        monolingual targets + an injected reverse fn -> parallel batches."""
        import numpy as np

        from s2t_tpu.data.backtranslation_dataset import BacktranslationDataset
        from s2t_tpu.data.dictionary import Dictionary

        d = Dictionary()
        for w in ["aa", "bb", "cc", "dd"]:
            d.add_symbol(w)

        def toy_reverse(tgt, lens):
            # "backtranslate" = reverse the valid prefix
            out = np.full_like(tgt, d.pad())
            for i, L in enumerate(lens):
                if L > 1:
                    out[i, : L - 1] = tgt[i, : L - 1][::-1]
                    out[i, L - 1] = d.eos()
            return out

        lines = ["aa bb cc", "dd cc", "bb aa dd cc"]
        ds = BacktranslationDataset(lines, d, toy_reverse)
        assert len(ds) == 3
        batch = ds.collater([ds[0], ds[1], ds[2]])
        assert batch["src_tokens"].shape == batch["target"].shape
        # synthetic source of "aa bb cc </s>" is "cc bb aa </s>"
        row = [d.symbols[t] for t in batch["src_tokens"][2]
               if t not in (d.pad(),)]
        tgt_syms = [d.symbols[t] for t in batch["target"][2]
                    if t not in (d.pad(), d.eos())]
        assert row[:-1] == tgt_syms[::-1]
        assert batch["prev_tokens"][0, 0] == d.eos()

    def test_model_backtranslator_end_to_end(self, tmp_path):
        """make_backtranslator drives a real reverse model's beam search to
        build the synthetic batch (the semisupervised_translation core)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from s2t_tpu.data.backtranslation_dataset import (
            BacktranslationDataset, make_backtranslator,
        )
        from s2t_tpu.data.dictionary import Dictionary
        from s2t_tpu.inference.generator import SequenceGenerator
        from s2t_tpu.models.transformer import (
            TransformerMTConfig, TransformerModel,
        )

        d = Dictionary()
        for w in ["aa", "bb", "cc", "dd"]:
            d.add_symbol(w)
        cfg = TransformerMTConfig(
            encoder_embed_dim=16, encoder_ffn_embed_dim=32, encoder_layers=1,
            encoder_attention_heads=2, decoder_embed_dim=16,
            decoder_ffn_embed_dim=32, decoder_layers=1,
            decoder_attention_heads=2, dropout=0.0, vocab_size=len(d),
        )
        rev = TransformerModel(cfg)
        params = rev.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 4), jnp.int32),
            jnp.asarray([4, 4]), jnp.zeros((2, 3), jnp.int32),
        )["params"]
        gen = SequenceGenerator(
            rev, beam_size=2, max_len_b=8, max_target_positions=32,
            input_keys=("src_tokens", "src_lengths"),
        )
        bt = make_backtranslator(rev, params, gen)
        ds = BacktranslationDataset(["aa bb", "cc dd aa"], d, bt)
        batch = ds.collater([ds[0], ds[1]])
        assert batch["src_tokens"].shape[0] == 2
        assert (batch["src_lengths"] >= 1).all()
        assert np.array_equal(
            batch["target"][0, :3],
            [d.index("aa"), d.index("bb"), d.eos()],
        )


class TestSemisupervisedTranslation:
    def test_bitext_plus_bt_batches(self, tmp_path):
        """semisupervised_translation (reference:
        tasks/semisupervised_translation.py): train batches alternate real
        bitext and synthetic backtranslated pairs, each batch single-origin."""
        import sys

        sys.path.insert(0, "/root/repo/tests")
        import jax
        import jax.numpy as jnp
        import numpy as np
        from test_text_tasks import make_mt_corpus

        from s2t_tpu.config import OptimizationConfig, TrainConfig, from_dict
        from s2t_tpu.models.build import build_model
        from s2t_tpu.tasks import setup_task
        from s2t_tpu.trainer import Trainer
        from s2t_tpu.utils.checkpoint import save_pytree

        data = make_mt_corpus(tmp_path / "data")
        # monolingual target-side text
        (data / "mono.de").write_text("AA BB CC\nDD EE\nBB AA\nCC DD EE AA\n")

        model_kw = {"encoder_embed_dim": 16, "encoder_ffn_embed_dim": 32,
                    "encoder_layers": 1, "encoder_attention_heads": 2,
                    "decoder_embed_dim": 16, "decoder_ffn_embed_dim": 32,
                    "decoder_layers": 1, "decoder_attention_heads": 2,
                    "dropout": 0.0}
        cfg = from_dict(TrainConfig, {
            "task": "semisupervised_translation", "arch": "transformer",
            "criterion": "label_smoothed_cross_entropy",
            "task_cfg": {"bt_checkpoint": str(tmp_path / "rev.pt"),
                         "bt_arch": "transformer", "bt_model": model_kw,
                         "lambda_denoising": 1.0},
            "model": model_kw,
            "criterion_cfg": {"label_smoothing": 0.0},
            "dataset": {"data": str(data), "max_tokens": 128,
                        "max_source_positions": 32, "max_target_positions": 16,
                        "num_buckets": 2},
            "optimization": {"lr": 3e-3, "warmup_updates": 5, "clip_norm": 5.0},
            "generation": {"beam": 1, "max_len_b": 8, "post_process": "none"},
        })
        task = setup_task(cfg)
        # a (random) reverse de->en checkpoint — BT plumbing, not quality
        V = len(task.tgt_dict)
        rev = build_model("transformer", dict(model_kw), vocab_size=V,
                          src_vocab_size=V)
        rparams = rev.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
            jnp.asarray([4]), jnp.zeros((1, 3), jnp.int32),
        )["params"]
        save_pytree(tmp_path / "rev.pt", {"params": rparams})
        ds = task.load_dataset("train", is_train=True)
        from s2t_tpu.data.backtranslation_dataset import ConcatHomogeneous

        assert isinstance(ds, ConcatHomogeneous)
        itr = task.get_batch_iterator(ds, max_tokens=128, shuffle=False,
                                      batch_size_multiple=2).next_epoch_itr()
        batches = list(itr)
        assert len(batches) >= 2
        # every batch is a full translation batch (synthetic or real)
        for b in batches:
            assert "src_tokens" in b and "target" in b and "prev_tokens" in b
        # bitext + BT + DAE streams (reference: --lambda-denoising adds a
        # noised-mono -> clean-mono objective, data/noising.py)
        assert len(ds) == 32 + 4 + 4

        model = task.build_model()
        criterion = task.build_criterion()
        trainer = Trainer(
            model, criterion,
            OptimizationConfig(lr=3e-3, warmup_updates=5, clip_norm=5.0),
            forward_fn=task.forward_fn(), seed=0,
        )
        dev = [{k: jnp.asarray(v) for k, v in b.items()
                if k not in ("ids", "nsentences")} for b in batches[:4]]
        state = trainer.init_state(dev[0])
        losses = []
        for _ in range(15):
            for b in dev:
                state, m = trainer.train_step(state, b)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])


class TestCorpusScripts:
    """rm_pt / shard_docs / count_docs / split_train_valid_docs
    (reference: scripts/{rm_pt,shard_docs,count_docs,split_train_valid_docs}.py)."""

    def _corpus(self, tmp_path):
        p = tmp_path / "corpus.txt"
        p.write_text("a b\nc d\n\ne f\n\ng h\ni j\n")
        return p

    def test_shard_docs_respects_boundaries(self, tmp_path, capsys):
        from s2t_tpu.cli.text_tools import main

        p = self._corpus(tmp_path)
        main(["shard_docs", str(p), "--num-shards", "2"])
        s0 = (tmp_path / "corpus.txt.shard0").read_text()
        s1 = (tmp_path / "corpus.txt.shard1").read_text()
        # doc boundaries intact: each shard is full documents
        assert s0.count("\n\n") + s1.count("\n\n") >= 2
        assert "a b\nc d\n" in s0 and "e f\n" in s1

    def test_rm_pt_keeps_last_and_specials(self, tmp_path):
        from s2t_tpu.cli.text_tools import main

        ck = tmp_path / "ck"
        ck.mkdir()
        for n in ("checkpoint1.ckpt", "checkpoint2.ckpt", "checkpoint3.ckpt",
                  "checkpoint_best.ckpt", "checkpoint_last.ckpt"):
            (ck / n).touch()
        main(["rm_pt", "--root", str(ck), "--save-last", "1"])
        left = sorted(x.name for x in ck.iterdir())
        assert left == ["checkpoint3.ckpt", "checkpoint_best.ckpt",
                        "checkpoint_last.ckpt"]

    def test_split_train_valid(self, tmp_path):
        from s2t_tpu.cli.text_tools import main

        p = self._corpus(tmp_path)
        main(["split_train_valid_docs", str(p), "--valid-percent", "0.34"])
        assert (tmp_path / "corpus.txt.train").exists()
        assert (tmp_path / "corpus.txt.valid").exists()

"""Dataset wrapper tail (reference: fairseq/data/ noising/shorten/append/
prepend/strip/offset/replace/roll/subsample/resampling/multi-corpus/
transform-eos wrappers)."""

import numpy as np
import pytest

from s2t_tpu.data.dictionary import Dictionary
from s2t_tpu.data.wrappers import (
    AppendTokenDataset,
    MultiCorpusSampledDataset,
    NoisingDataset,
    OffsetTokensDataset,
    PrependTokenDataset,
    RandomCropDataset,
    ReplaceDataset,
    ResamplingDataset,
    RollDataset,
    StripTokenDataset,
    SubsampleDataset,
    TransformEosLangPairDataset,
    TruncateDataset,
    WordNoiser,
)


def make_dict(words=("how", "are", "y@@", "ou", "today")):
    d = Dictionary()
    for w in words:
        d.add_symbol(w)
    return d


class ToyDataset:
    def __init__(self, rows, frames=None):
        self.rows = [np.asarray(r, np.int32) for r in rows]
        self.n_frames = np.asarray(
            frames if frames is not None else [len(r) for r in rows], np.int64
        )

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        return {"id": i, "source": self.rows[i]}

    def collater(self, samples, **kw):
        return {"ids": [s["id"] for s in samples]}

    def ordered_indices(self, shuffle=True, seed=1, epoch=1):
        return np.arange(len(self))


class TestWordNoiser:
    def test_bpe_word_ids(self):
        d = make_dict()
        n = WordNoiser(d)
        toks = np.array([d.index(w) for w in ("how", "are", "y@@", "ou")])
        # "y@@ ou" is one word (reference _get_bpe_word_idx docstring)
        assert n.word_ids(toks).tolist() == [0, 1, 2, 2]

    def test_shuffle_moves_whole_words_and_pins_eos(self):
        d = make_dict()
        n = WordNoiser(d)
        toks = np.array(
            [d.index(w) for w in ("how", "are", "y@@", "ou", "today")]
            + [d.eos()]
        )
        rng = np.random.default_rng(0)
        out = n.shuffle(toks, 3, rng)
        assert sorted(out.tolist()) == sorted(toks.tolist())
        assert out[-1] == d.eos()
        # subword pair stays adjacent and in order
        pos_y = out.tolist().index(d.index("y@@"))
        assert out[pos_y + 1] == d.index("ou")

    def test_dropout_keeps_eos_and_never_empties(self):
        d = make_dict()
        n = WordNoiser(d)
        toks = np.array([d.index("how"), d.eos()])
        for seed in range(20):
            out = n.dropout(toks, 0.99, np.random.default_rng(seed))
            assert out[-1] == d.eos() and len(out) >= 2

    def test_blanking_replaces_with_unk(self):
        d = make_dict()
        n = WordNoiser(d)
        toks = np.array(
            [d.index(w) for w in ("how", "are", "today")] + [d.eos()]
        )
        out = n.dropout(toks, 0.99, np.random.default_rng(0),
                        blank_idx=d.unk())
        assert len(out) == len(toks)  # blanking preserves length
        assert np.sum(out == d.unk()) >= 2

    def test_noising_dataset_deterministic_per_epoch(self):
        d = make_dict()
        base = ToyDataset([[d.index("how"), d.index("are"), d.eos()]] * 3)
        ds = NoisingDataset(base, d, seed=7)
        a = ds[0]["source"]
        b = ds[0]["source"]
        np.testing.assert_array_equal(a, b)  # same epoch -> same noise
        ds.set_epoch(2)
        # different epoch can differ for SOME index (try a few)
        diff = any(
            not np.array_equal(ds[i]["source"], NoisingDataset(
                base, d, seed=7)[i]["source"])
            for i in range(3)
        )
        assert diff


class TestTokenTransforms:
    def test_basic_transforms(self):
        base = ToyDataset([[5, 6, 7, 2]])
        assert TruncateDataset(base, 2)[0]["source"].tolist() == [5, 6]
        assert AppendTokenDataset(base, 9)[0]["source"].tolist() == [5, 6, 7, 2, 9]
        assert PrependTokenDataset(base, 0)[0]["source"].tolist() == [0, 5, 6, 7, 2]
        assert StripTokenDataset(base, 2)[0]["source"].tolist() == [5, 6, 7]
        assert OffsetTokensDataset(base, 10)[0]["source"].tolist() == [15, 16, 17, 12]
        assert ReplaceDataset(base, {6: 60})[0]["source"].tolist() == [5, 60, 7, 2]
        assert RollDataset(base, 1)[0]["source"].tolist() == [2, 5, 6, 7]

    def test_random_crop(self):
        base = ToyDataset([list(range(20))])
        ds = RandomCropDataset(base, 5, seed=3)
        out = ds[0]["source"]
        assert len(out) == 5
        # crop is contiguous
        assert (np.diff(out) == 1).all()
        # deterministic within an epoch
        np.testing.assert_array_equal(out, ds[0]["source"])

    def test_transform_eos_lang_pair(self):
        base = ToyDataset([[5, 6, 2]])
        ds = TransformEosLangPairDataset(
            base, src_eos=2, new_src_eos=31, new_tgt_bos=32
        )
        item = ds[0]
        assert item["source"].tolist() == [5, 6, 31]


class TestLMContextWindow:
    def test_context_carries_previous_block(self):
        from s2t_tpu.data.wrappers import LMContextWindowDataset

        class Blocks:
            def __init__(self):
                self.blocks = np.arange(12, dtype=np.int32).reshape(3, 4) + 4
                self.n_frames = np.full(3, 4, np.int64)

            def __len__(self):
                return 3

            def __getitem__(self, i):
                return {"id": i, "tokens": self.blocks[i]}

            def ordered_indices(self, shuffle=True, seed=1, epoch=1):
                return np.arange(3)

            def collater(self, samples, **kw):
                raise AssertionError("wrapper must collate itself")

        ds = LMContextWindowDataset(Blocks(), context_window=2, pad_id=1,
                                    eos_id=2)
        # block 1's context is the tail of block 0
        item = ds[1]
        assert item["context"].tolist() == [6, 7]
        assert ds[0]["context"].tolist() == [1, 1]  # first block: pad
        batch = ds.collater([ds[0], ds[1]])
        # context positions are pad in target (unscored) but real in prev
        assert batch["target"][1, :2].tolist() == [1, 1]
        assert batch["target"][1, 2:].tolist() == [8, 9, 10, 11]
        assert batch["prev_tokens"][1].tolist() == [2, 6, 7, 8, 9, 10]
        assert batch["ntokens"] == 8.0

    def test_eval_lm_uses_context_window(self, tmp_path):
        from s2t_tpu.cli.eval_lm import main as eval_main
        from s2t_tpu.cli.train import main as train_main
        from s2t_tpu.config import TrainConfig, from_dict

        root = tmp_path / "data"
        root.mkdir()
        rng = np.random.default_rng(0)
        lines = [" ".join(rng.choice(["aa", "bb", "cc", "dd"], size=6))
                 for _ in range(40)]
        for split in ("train", "dev", "test"):
            (root / f"{split}.txt").write_text("\n".join(lines))
        (root / "dict.txt").write_text("aa 5\nbb 5\ncc 5\ndd 5\n")
        (root / "config.yaml").write_text("vocab_filename: dict.txt\n")
        cfg = from_dict(TrainConfig, {
            "task": "language_modeling", "arch": "transformer_lm",
            "criterion": "label_smoothed_cross_entropy",
            "model": {"decoder_embed_dim": 16, "decoder_ffn_embed_dim": 32,
                      "decoder_layers": 1, "decoder_attention_heads": 2,
                      "dropout": 0.0},
            "criterion_cfg": {"label_smoothing": 0.0},
            "task_cfg": {"tokens_per_sample": 16},
            "dataset": {"data": str(root), "max_tokens": 256,
                        "max_target_positions": 64, "gen_subset": "test"},
            "optimization": {"max_epoch": 2, "lr": 1e-3, "warmup_updates": 5},
            "checkpoint": {"save_dir": str(tmp_path / "ckpt"),
                           "async_save": False},
        })
        out = train_main(cfg)
        params = out["state"].params
        base = eval_main(cfg, params)
        cfg.eval.context_window = 8
        ctx = eval_main(cfg, params)
        # same number of scored tokens, different (windowed) perplexity
        assert base["ntokens"] == ctx["ntokens"]
        assert ctx["perplexity"] != base["perplexity"]


class TestCorpusSampling:
    def test_subsample(self):
        base = ToyDataset([[i] for i in range(10)])
        ds = SubsampleDataset(base, 0.5, seed=1)
        assert len(ds) == 5
        assert len(ds.n_frames) == 5

    def test_resampling_redeals_per_epoch(self):
        base = ToyDataset([[i] for i in range(8)])
        ds = ResamplingDataset(base, weights=[0] * 7 + [1.0], size_ratio=1.0)
        # degenerate weights: every draw is index 7
        assert all(ds[i]["source"].tolist() == [7] for i in range(len(ds)))
        ds2 = ResamplingDataset(base, size_ratio=0.5, seed=3)
        e1 = [ds2[i]["source"][0] for i in range(len(ds2))]
        ds2.set_epoch(2)
        e2 = [ds2[i]["source"][0] for i in range(len(ds2))]
        assert len(ds2) == 4 and e1 != e2

    def test_multi_corpus_sampled(self):
        a = ToyDataset([[1]] * 4)
        b = ToyDataset([[2]] * 2)
        ds = MultiCorpusSampledDataset({"a": a, "b": b}, seed=5)
        assert len(ds) == 4
        vals = {int(ds[i]["source"][0]) for i in range(4)}
        assert vals <= {1, 2}
        # deterministic per (seed, epoch, index)
        again = {int(ds[i]["source"][0]) for i in range(4)}
        assert vals == again
        # custom sampling func: always corpus "b"
        ds_b = MultiCorpusSampledDataset({"a": a, "b": b},
                                         sampling_func=lambda keys: 1)
        assert all(int(ds_b[i]["source"][0]) == 2 for i in range(4))

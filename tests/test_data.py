"""Data pipeline tests: tokenizer, batching, dataset+collater, iterators."""

import io
import zipfile
from pathlib import Path

import numpy as np
import pytest

from s2t_tpu.data.batching import (
    batch_by_size,
    bucketize,
    filter_by_size,
    make_buckets,
    round_up,
)
from s2t_tpu.data.dataset import S2TDataConfig, SpeechToTextDataset, load_features
from s2t_tpu.data.dictionary import Dictionary
from s2t_tpu.data.iterators import BufferedIterator, EpochBatchIterator
from s2t_tpu.data.tokenizer import CharTokenizer, SPMTokenizer


class TestTokenizer:
    def test_char_roundtrip(self):
        tok = CharTokenizer()
        s = "hello world"
        enc = tok.encode_line(s)
        assert "▁" in enc
        assert tok.decode(enc) == s

    def test_unigram_train_and_roundtrip(self, tmp_path):
        lines = [
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "how vexingly quick daft zebras jump",
        ] * 20
        model = tmp_path / "spm.json"
        tok = SPMTokenizer.train(lines, vocab_size=60, model_path=model)
        enc = tok.encode_line("the quick fox")
        assert tok.decode(enc) == "the quick fox"
        tok2 = SPMTokenizer(model_path=model)
        assert tok2.encode_line("the quick fox") == enc

    def test_vocab_to_dictionary(self, tmp_path):
        lines = ["abc abd abe"] * 30
        tok = SPMTokenizer.train(lines, vocab_size=20, model_path=tmp_path / "m.json")
        d = Dictionary()
        for piece in tok.vocab():
            d.add_symbol(piece)
        ids = d.encode_line(tok.encode_line("abc abd"), append_eos=True)
        assert d.unk() not in ids[:-1]


class TestBatching:
    def test_buckets(self):
        b = make_buckets(3000, 8, min_val=16)
        assert b[-1] == 3000
        assert np.all(np.diff(b) > 0)
        vals = np.asarray([1, 17, 2999, 3000, 5000])
        snapped = bucketize(vals, b)
        assert np.all(snapped >= np.minimum(vals, 3000))
        assert snapped[-1] == 3000  # oversize clamps to top

    def test_batch_by_size_budget(self):
        lens = np.full(100, 100, dtype=np.int64)
        idx = np.arange(100)
        batches = batch_by_size(
            idx, lens, max_tokens=1600, required_batch_size_multiple=8
        )
        # cost = ceil8(B)*100 <= 1600 -> B <= 16
        assert all(len(b) <= 16 for b in batches)
        assert sum(len(b) for b in batches) == 100

    def test_batch_respects_max_sentences(self):
        lens = np.full(20, 10, dtype=np.int64)
        batches = batch_by_size(
            np.arange(20), lens, max_tokens=None, max_sentences=6,
            required_batch_size_multiple=1,
        )
        assert all(len(b) <= 6 for b in batches)

    def test_filter_by_size(self):
        fl = np.asarray([10, 5000, 30, 7000])
        keep = filter_by_size(fl, None, max_frames=6000, max_tokens=1024)
        assert keep.tolist() == [0, 1, 2]


def write_manifest(tmp_path: Path, n=10, with_zip=True):
    rng = np.random.default_rng(0)
    feats_dir = tmp_path
    rows = []
    if with_zip:
        zpath = tmp_path / "fbank80.zip"
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as z:
            for i in range(n):
                T = int(rng.integers(20, 50))
                arr = rng.normal(size=(T, 80)).astype(np.float32)
                buf = io.BytesIO()
                np.save(buf, arr)
                z.writestr(f"utt{i}.npy", buf.getvalue())
        # build path:offset:length specs by reading the zip TOC
        specs = {}
        with zipfile.ZipFile(zpath) as z:
            for info in z.infolist():
                # offset of file data = header_offset + 30 + lens of name/extra
                with open(zpath, "rb") as f:
                    f.seek(info.header_offset)
                    hdr = f.read(30)
                    name_len = int.from_bytes(hdr[26:28], "little")
                    extra_len = int.from_bytes(hdr[28:30], "little")
                    data_off = info.header_offset + 30 + name_len + extra_len
                specs[info.filename] = f"fbank80.zip:{data_off}:{info.file_size}"
    lines = ["id\taudio\tn_frames\ttgt_text\tsrc_text"]
    for i in range(n):
        spec = specs[f"utt{i}.npy"]
        with zipfile.ZipFile(tmp_path / "fbank80.zip") as z:
            T = np.load(io.BytesIO(z.read(f"utt{i}.npy"))).shape[0]
        lines.append(f"utt{i}\t{spec}\t{T}\tab ba\tba ab")
    (tmp_path / "train.tsv").write_text("\n".join(lines))
    (tmp_path / "dict.txt").write_text("ab 10\nba 5\n")
    return tmp_path / "train.tsv"


class TestDataset:
    def test_zip_reading_and_collation(self, tmp_path):
        manifest = write_manifest(tmp_path)
        d = Dictionary.load(tmp_path / "dict.txt")
        ds = SpeechToTextDataset(manifest, S2TDataConfig(), d, is_train=True)
        assert len(ds) == 10
        item = ds[0]
        assert item["features"].shape[1] == 80
        assert item["target"][-1] == d.eos()
        assert item["transcript"][-1] != d.eos()  # transcript has no EOS

        samples = [ds[i] for i in range(4)]
        batch = ds.collater(
            samples, frame_buckets=make_buckets(64, 4), batch_multiple=8
        )
        assert batch["features"].shape[0] == 8  # padded to multiple
        assert batch["prev_tokens"][0, 0] == d.eos()
        assert batch["target"][0, batch["target_lengths"][0] - 1] == d.eos()
        # EOS-shift invariant: prev[1:] == target[:-1] on valid region
        L = int(batch["target_lengths"][0])
        np.testing.assert_array_equal(
            batch["prev_tokens"][0, 1:L], batch["target"][0, : L - 1]
        )

    def test_ordered_indices_desc(self, tmp_path):
        manifest = write_manifest(tmp_path)
        d = Dictionary.load(tmp_path / "dict.txt")
        ds = SpeechToTextDataset(manifest, S2TDataConfig(), d)
        order = ds.ordered_indices(shuffle=False)
        lens = ds.n_frames[order]
        assert np.all(np.diff(lens) <= 0)


class TestIterators:
    def test_buffered(self):
        it = BufferedIterator(range(10), buffer_size=2)
        assert list(it) == list(range(10))

    def test_buffered_propagates_errors(self):
        def gen():
            yield 1
            raise RuntimeError("boom")

        it = BufferedIterator(gen())
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            next(it)

    def test_epoch_iterator_resume(self, tmp_path):
        manifest = write_manifest(tmp_path)
        d = Dictionary.load(tmp_path / "dict.txt")
        ds = SpeechToTextDataset(manifest, S2TDataConfig(), d)

        def batches_fn(epoch):
            idx = ds.ordered_indices(seed=1, epoch=epoch)
            return batch_by_size(idx, ds.n_frames, max_tokens=200,
                                 required_batch_size_multiple=1)

        itr = EpochBatchIterator(ds, batches_fn, lambda s: ds.collater(s), seed=1)
        total = len(itr)
        assert total > 1
        it = itr.next_epoch_itr()
        first = next(it)
        state = itr.state_dict()
        assert state["consumed"] == 1

        # resume in a fresh iterator: same remaining batches
        itr2 = EpochBatchIterator(ds, batches_fn, lambda s: ds.collater(s), seed=1)
        itr2.load_state_dict(state)
        rest2 = list(itr2.next_epoch_itr())
        rest1 = list(it)
        assert len(rest1) == len(rest2) == total - 1
        np.testing.assert_array_equal(
            rest1[0]["features"], rest2[0]["features"]
        )

    def test_epoch_shuffle_differs(self, tmp_path):
        manifest = write_manifest(tmp_path)
        d = Dictionary.load(tmp_path / "dict.txt")
        ds = SpeechToTextDataset(manifest, S2TDataConfig(), d)

        def batches_fn(epoch):
            idx = ds.ordered_indices(seed=1, epoch=epoch)
            return batch_by_size(idx, ds.n_frames, max_tokens=100,
                                 required_batch_size_multiple=1)

        itr = EpochBatchIterator(ds, batches_fn, lambda s: [s[0]["id"]], seed=1)
        e1 = [b for b in itr.next_epoch_itr()]
        itr.next_epoch()
        e2 = [b for b in itr.next_epoch_itr()]
        assert e1 != e2  # order differs across epochs

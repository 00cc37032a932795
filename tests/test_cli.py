"""CLI tests: prep_audio pipeline, score, average_checkpoints, eval_lm, validate."""

import wave as wave_mod
from pathlib import Path

import numpy as np
import pytest


def write_wav(path: Path, samples: np.ndarray, sr=16000):
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.astype(np.int16).tobytes())


def make_raw_corpus(root: Path, n=6):
    rng = np.random.default_rng(0)
    (root / "wavs").mkdir(parents=True, exist_ok=True)
    texts = ["hello world", "good morning", "speech test", "one two three",
             "audio data", "final example"]
    for split in ("train", "dev"):
        lines = ["id\taudio\ttgt_text"]
        for i in range(n):
            wav = root / "wavs" / f"{split}{i}.wav"
            write_wav(wav, rng.normal(scale=1000, size=8000))
            lines.append(f"{split}-{i}\t{wav}\t{texts[i % len(texts)]}")
        (root / f"{split}.tsv").write_text("\n".join(lines))
    return root


class TestPrepAudio:
    def test_prep_then_load(self, tmp_path):
        from s2t_tpu.cli.prep_audio import main as prep_main
        from s2t_tpu.config import TrainConfig, from_dict
        from s2t_tpu.tasks import setup_task

        raw = make_raw_corpus(tmp_path / "raw")
        out = tmp_path / "data"
        prep_main([
            "--input-root", str(raw), "--output-root", str(out),
            "--splits", "train", "dev", "--vocab-size", "40",
            "--vocab-type", "unigram", "--cmvn",
        ])
        assert (out / "fbank80.zip").exists()
        assert (out / "config.yaml").exists()
        assert (out / "dict.txt").exists()
        assert (out / "gcmvn.npz").exists()

        # the prepared dir loads through the real task
        cfg = from_dict(TrainConfig, {
            "task": "speech_to_text",
            "dataset": {"data": str(out)},
        })
        task = setup_task(cfg)
        ds = task.load_dataset("train", is_train=True)
        item = ds[0]
        assert item["features"].shape[1] == 80
        assert item["target"].dtype == np.int32
        # zip random access produced identical features to direct decode
        assert np.isfinite(item["features"]).all()

    def test_speed_perturb_triples_train(self, tmp_path):
        from s2t_tpu.cli.prep_audio import main as prep_main

        raw = make_raw_corpus(tmp_path / "raw", n=3)
        out = tmp_path / "data"
        prep_main([
            "--input-root", str(raw), "--output-root", str(out),
            "--splits", "train", "dev", "--vocab-size", "30",
            "--speed-perturb",
        ])
        train_lines = (out / "train.tsv").read_text().strip().split("\n")
        dev_lines = (out / "dev.tsv").read_text().strip().split("\n")
        assert len(train_lines) - 1 == 9  # 3 utts x 3 speeds
        assert len(dev_lines) - 1 == 3


class TestScoreCLI:
    def test_wer(self, tmp_path):
        from s2t_tpu.cli.score import main as score_main

        (tmp_path / "ref.txt").write_text("a b c\nd e f\n")
        (tmp_path / "hyp.txt").write_text("a b c\nd x f\n")
        wer = score_main([
            "--sys", str(tmp_path / "hyp.txt"), "--ref", str(tmp_path / "ref.txt"),
            "--metric", "wer",
        ])
        assert wer == pytest.approx(100.0 / 6)

    def test_bleu_perfect(self, tmp_path):
        from s2t_tpu.cli.score import main as score_main

        (tmp_path / "f.txt").write_text("the cat sat on the mat today ok\n")
        score = score_main([
            "--sys", str(tmp_path / "f.txt"), "--ref", str(tmp_path / "f.txt"),
            "--metric", "fast_bleu",
        ])
        assert score == pytest.approx(100.0)


class TestAverageCLI:
    def test_average(self, tmp_path):
        from s2t_tpu.cli.average_checkpoints import main as avg_main
        from s2t_tpu.utils.checkpoint import load_checkpoint, save_pytree

        for i, v in enumerate([2.0, 4.0]):
            save_pytree(tmp_path / f"c{i}.pt", {"params": {"w": np.full(3, v, np.float32)}})
        avg_main([
            "--inputs", str(tmp_path / "c0.pt"), str(tmp_path / "c1.pt"),
            "--output", str(tmp_path / "avg.pt"),
        ])
        tree, _ = load_checkpoint(tmp_path / "avg.pt")
        np.testing.assert_allclose(tree["params"]["w"], 3.0)


class TestTextTools:
    def test_spm_round_trip_and_lcrm(self, tmp_path):
        """text_tools (reference: scripts/spm_{train,encode,decode}.py,
        lcrm.py): train -> encode -> decode round-trips; lcrm normalises."""
        from s2t_tpu.cli.text_tools import lcrm_line, main as tools_main

        src = tmp_path / "in.txt"
        src.write_text("hello world test\nthe quick brown fox\n")
        model = tmp_path / "m.json"
        tools_main(["spm_train", "--input", str(src), "--model", str(model),
                    "--vocab-size", "60"])
        enc = tmp_path / "enc.txt"
        dec = tmp_path / "dec.txt"
        tools_main(["spm_encode", "--model", str(model),
                    "--input", str(src), "--output", str(enc)])
        tools_main(["spm_decode", "--model", str(model),
                    "--input", str(enc), "--output", str(dec)])
        assert dec.read_text().split("\n")[:2] == src.read_text().split("\n")[:2]
        assert lcrm_line("Hello, World! DON'T stop.") == "hello world don't stop"

    def test_read_binarized(self, tmp_path):
        """read_binarized (reference: scripts/read_binarized.py): dump a
        mmap corpus back to text."""
        from s2t_tpu.cli.text_tools import main as tools_main
        from s2t_tpu.data.dictionary import Dictionary
        from s2t_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder

        d = Dictionary()
        for w in ("aa", "bb", "cc"):
            d.add_symbol(w)
        d.save(tmp_path / "dict.txt")
        b = MMapIndexedDatasetBuilder(str(tmp_path / "corpus"))
        b.add_item(np.asarray([d.index("aa"), d.index("bb"), d.eos()], np.int32))
        b.add_item(np.asarray([d.index("cc"), d.eos()], np.int32))
        b.finalize()
        out = tmp_path / "dump.txt"
        tools_main(["read_binarized", "--input", str(tmp_path / "corpus"),
                    "--dict", str(tmp_path / "dict.txt"),
                    "--output", str(out)])
        lines = out.read_text().strip().split("\n")
        assert lines[0].startswith("aa bb")
        assert lines[1].startswith("cc")

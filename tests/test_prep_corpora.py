"""Corpus-layout scanners + end-to-end prep on tiny fake corpus trees.

(reference strategy: examples/speech_to_text/prep_mustc_data.py &c are only
ever exercised manually; here each layout gets a synthetic tree and the
full scan→fbank→zip→vocab→manifest pipeline runs on it.)
"""

import wave
from pathlib import Path

import numpy as np
import pytest
import yaml


def write_wav(path: Path, n_samples: int, sr: int = 16000, seed: int = 0):
    rng = np.random.default_rng(seed)
    data = (rng.normal(scale=3000, size=n_samples)).astype(np.int16)
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())
    return data


def make_mustc_tree(root: Path, lang="de", splits=("train", "dev")):
    """Two talks per split, two segments per talk, MuST-C layout."""
    for split in splits:
        d = root / f"en-{lang}" / "data" / split
        (d / "txt").mkdir(parents=True)
        segs, en, de = [], [], []
        for t in range(2):
            wav_name = f"ted_{t}.wav"
            write_wav(d / "wav" / wav_name, 16000 * 2, seed=t)
            for s in range(2):
                segs.append({
                    "wav": wav_name,
                    "offset": str(s * 0.8),
                    "duration": "0.7",
                    "speaker_id": f"spk{t}",
                })
                en.append(f"hello world {t} {s}")
                de.append(f"hallo welt {t} {s}")
        with open(d / "txt" / f"{split}.yaml", "w") as f:
            yaml.safe_dump(segs, f)
        (d / "txt" / f"{split}.en").write_text("\n".join(en) + "\n")
        (d / "txt" / f"{split}.{lang}").write_text("\n".join(de) + "\n")
    return root


def make_librispeech_tree(root: Path, split="dev-clean"):
    d = root / split / "84" / "121123"
    d.mkdir(parents=True)
    ids = [f"84-121123-{i:04d}" for i in range(3)]
    # .wav stand-ins: the scanner prefers .flac but falls back to .wav,
    # which is what lets the test run without a flac decoder
    for i, uid in enumerate(ids):
        write_wav(d / f"{uid}.wav", 16000, seed=i)
    (d / "84-121123.trans.txt").write_text(
        "\n".join(f"{uid} SOME UPPERCASE TEXT {i}" for i, uid in enumerate(ids)) + "\n"
    )
    return root


def make_covost_tree(root: Path, src="fr", tgt="en"):
    clips = root / "clips"
    clips.mkdir(parents=True)
    rows = ["client_id\tpath\tsentence"]
    st_rows = ["path\ttranslation\tsplit"]
    for split in ("train", "dev", "test"):
        for i in range(2):
            name = f"{split}_{i}.mp3"
            write_wav(clips / f"{split}_{i}.wav", 8000, seed=i)
            rows.append(f"spk{i}\t{name}\tphrase {split} {i}")
            st_rows.append(f"{name}\ttranslation {split} {i}\t{split}")
    (root / "validated.tsv").write_text("\n".join(rows) + "\n")
    (root / f"covost_v2.{src}_{tgt}.tsv").write_text("\n".join(st_rows) + "\n")
    return root


def make_mtedx_tree(root: Path, pair="es-en", splits=("train", "valid")):
    src, tgt = pair.split("-")
    for split in splits:
        d = root / pair / "data" / split
        (d / "txt").mkdir(parents=True)
        segs, s_txt, t_txt = [], [], []
        write_wav(d / "wav" / "talk0.wav", 16000 * 2)
        for s in range(3):
            segs.append({"wav": "talk0.wav", "offset": str(0.5 * s),
                         "duration": "0.4", "speaker_id": "spk0"})
            s_txt.append(f"hola {s}")
            t_txt.append(f"hello {s}")
        with open(d / "txt" / f"{split}.yaml", "w") as f:
            yaml.safe_dump(segs, f)
        (d / "txt" / f"{split}.{src}").write_text("\n".join(s_txt) + "\n")
        if tgt != src:
            (d / "txt" / f"{split}.{tgt}").write_text("\n".join(t_txt) + "\n")
    return root


class TestScanners:
    def test_mustc_st(self, tmp_path):
        from s2t_tpu.data.prep.corpora import scan_mustc

        make_mustc_tree(tmp_path)
        rows = list(scan_mustc(tmp_path, "de", "train", task="st"))
        assert len(rows) == 4
        assert rows[0]["id"] == "train_ted_0_0"
        assert rows[0]["src_text"].startswith("hello")
        assert rows[0]["tgt_text"].startswith("hallo")
        assert rows[1]["offset"] == pytest.approx(0.8)
        assert rows[0]["speaker"] == "spk0"

    def test_mustc_asr_uses_english(self, tmp_path):
        from s2t_tpu.data.prep.corpora import scan_mustc

        make_mustc_tree(tmp_path)
        rows = list(scan_mustc(tmp_path, "de", "train", task="asr"))
        assert rows[0]["tgt_text"].startswith("hello")
        assert "src_text" not in rows[0]

    def test_librispeech(self, tmp_path):
        from s2t_tpu.data.prep.corpora import scan_librispeech

        make_librispeech_tree(tmp_path)
        rows = list(scan_librispeech(tmp_path, "dev-clean"))
        assert len(rows) == 3
        assert rows[0]["id"] == "84-121123-0000"
        assert rows[0]["tgt_text"] == "SOME UPPERCASE TEXT 0"
        assert rows[0]["speaker"] == "84"
        assert rows[0]["audio"].endswith(".wav")

    def test_covost_st_and_asr(self, tmp_path):
        from s2t_tpu.data.prep.corpora import scan_covost

        make_covost_tree(tmp_path)
        st = list(scan_covost(tmp_path, "fr", "dev", tgt_lang="en"))
        assert len(st) == 2
        assert st[0]["tgt_text"] == "translation dev 0"
        assert st[0]["src_text"] == "phrase dev 0"
        # ASR mode: splits come from CommonVoice's per-split TSVs; with
        # neither dev.tsv nor a 'split' column the scanner must REFUSE
        # rather than put the whole validated set in every split
        # (code-review r3: train/test contamination)
        with pytest.raises(FileNotFoundError, match="split"):
            list(scan_covost(tmp_path, "fr", "dev", tgt_lang=None))
        (tmp_path / "dev.tsv").write_text(
            "client_id\tpath\tsentence\n" + "spk0\tdev_0.mp3\tphrase dev 0\n"
        )
        asr = list(scan_covost(tmp_path, "fr", "dev", tgt_lang=None))
        assert len(asr) == 1 and asr[0]["tgt_text"] == "phrase dev 0"
        assert all("src_text" not in r for r in asr)

    def test_mtedx(self, tmp_path):
        from s2t_tpu.data.prep.corpora import scan_mtedx

        make_mtedx_tree(tmp_path)
        rows = list(scan_mtedx(tmp_path, "es-en", "valid"))
        assert len(rows) == 3
        assert rows[0]["src_text"] == "hola 0"
        assert rows[0]["tgt_text"] == "hello 0"


class TestPrepEndToEnd:
    def test_mustc_full_prep_and_load(self, tmp_path):
        """scan → fbank/zip/vocab/manifest → SpeechToTextDataset load."""
        from s2t_tpu.cli.prep_audio import main as prep_main
        from s2t_tpu.data.dataset import S2TDataConfig, SpeechToTextDataset
        from s2t_tpu.data.dictionary import Dictionary

        raw = make_mustc_tree(tmp_path / "raw", splits=("train", "dev"))
        out = tmp_path / "prepared"
        prep_main([
            "--corpus", "mustc", "--data-root", str(raw), "--lang", "de",
            "--output-root", str(out), "--splits", "train", "dev",
            "--vocab-size", "60", "--vocab-type", "char", "--cmvn",
        ])
        assert (out / "fbank80.zip").exists()
        cfg = S2TDataConfig.from_yaml(out / "config.yaml")
        d = Dictionary.load(out / "dict.txt")
        ds = SpeechToTextDataset(out / "train.tsv", cfg, d, root=str(out))
        assert len(ds) == 4
        sample = ds[0]
        assert sample["features"].shape[1] == 80
        assert sample["features"].shape[0] > 10
        assert np.isfinite(sample["features"]).all()
        assert len(sample["target"]) > 0

    def test_mustc_segments_differ(self, tmp_path):
        """Different offsets in the same wav must yield different features."""
        from s2t_tpu.cli.prep_audio import main as prep_main
        from s2t_tpu.data.dataset import S2TDataConfig, SpeechToTextDataset
        from s2t_tpu.data.dictionary import Dictionary

        raw = make_mustc_tree(tmp_path / "raw", splits=("train",))
        out = tmp_path / "prepared"
        prep_main([
            "--corpus", "mustc", "--data-root", str(raw), "--lang", "de",
            "--output-root", str(out), "--splits", "train",
            "--vocab-size", "60", "--vocab-type", "char",
        ])
        cfg = S2TDataConfig.from_yaml(out / "config.yaml")
        d = Dictionary.load(out / "dict.txt")
        ds = SpeechToTextDataset(out / "train.tsv", cfg, d, root=str(out))
        a, b = ds[0]["features"], ds[1]["features"]
        assert a.shape != b.shape or not np.allclose(a, b)

    def test_librispeech_prep(self, tmp_path):
        from s2t_tpu.cli.prep_audio import main as prep_main

        raw = make_librispeech_tree(tmp_path / "raw", split="dev-clean")
        out = tmp_path / "prepared"
        prep_main([
            "--corpus", "librispeech", "--data-root", str(raw),
            "--output-root", str(out), "--splits", "dev-clean",
            "--vocab-size", "40", "--vocab-type", "char",
        ])
        header = (out / "dev-clean.tsv").read_text().splitlines()[0]
        assert header.split("\t") == ["id", "audio", "n_frames", "tgt_text", "speaker"]

    def test_flac_without_backend_raises(self, tmp_path):
        from s2t_tpu.data.prep.corpora import decode_audio

        f = tmp_path / "x.flac"
        f.write_bytes(b"fLaC....")
        with pytest.raises(RuntimeError, match="soundfile"):
            decode_audio(f)

"""Corpus-layout scanners: walk a raw corpus tree and yield utterance rows.

(reference: examples/speech_to_text/prep_mustc_data.py:40-130 MuST-C yaml/wav
segments, prep_librispeech_data.py:32-100 flac tree, prep_covost_data.py:40-200
CommonVoice clips + translation TSV, prep_mtedx_data.py:40-100 TEDx
yaml/flac segments.)

Each scanner yields plain dict rows:

    {"id", "audio" (file path), "offset" (seconds), "duration" (seconds or
     None for whole file), "tgt_text", "src_text" (optional), "speaker"}

The generic prep pipeline (``s2t_tpu.cli.prep_audio``) decodes the audio,
slices the segment, extracts fbank, and packs the zip — so scanners stay
pure-metadata and cheap.  Audio decode is stdlib ``wave`` for WAV;
FLAC/MP3/OGG (LibriSpeech, CommonVoice) are gated behind optional backends
(soundfile or torchaudio) with a clear error when neither is installed —
this image ships neither, the test corpora use WAV.
"""

from __future__ import annotations

import csv
import logging
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

logger = logging.getLogger("s2t_tpu.prep.corpora")

MUSTC_LANGUAGES = ["de", "es", "fr", "it", "nl", "pt", "ro", "ru"]
MUSTC_SPLITS = ["train", "dev", "tst-COMMON", "tst-HE"]
LIBRISPEECH_SPLITS = [
    "train-clean-100", "train-clean-360", "train-other-500",
    "dev-clean", "dev-other", "test-clean", "test-other",
]
MTEDX_SPLITS = ["train", "valid", "test"]


def decode_audio(path: str | Path) -> tuple[np.ndarray, int]:
    """(mono float32 waveform in int16 scale, sample_rate).

    WAV via stdlib; other formats via soundfile/torchaudio when available.
    """
    path = str(path)
    if path.endswith(".wav"):
        import wave

        with wave.open(path) as w:
            sr = w.getframerate()
            arr = np.frombuffer(
                w.readframes(w.getnframes()), dtype=np.int16
            ).astype(np.float32)
            if w.getnchannels() > 1:
                arr = arr.reshape(-1, w.getnchannels()).mean(axis=1)
        return arr, sr
    try:
        import soundfile  # optional

        data, sr = soundfile.read(path, dtype="float32", always_2d=True)
        return data.mean(axis=1) * 32768.0, sr
    except ImportError:
        pass
    try:
        import torchaudio  # optional

        wav, sr = torchaudio.load(path)
        return wav.mean(dim=0).numpy() * 32768.0, sr
    except (ImportError, NotImplementedError):
        # NotImplementedError: the parity tests install a torchaudio SHIM
        # (tools/refshim) so the in-process reference can import it; its
        # load() raises instead of decoding — treat as backend-absent
        pass
    raise RuntimeError(
        f"cannot decode {path!r}: non-WAV audio needs the optional "
        "'soundfile' or 'torchaudio' package (pip install soundfile)"
    )


def _read_lines(path: Path) -> list[str]:
    with open(path, encoding="utf-8") as f:
        return [line.rstrip("\n") for line in f]


def _scan_yaml_segments(
    txt_root: Path,
    wav_root: Path,
    split: str,
    src_lang: str,
    tgt_lang: str,
    id_prefix: str,
) -> Iterator[dict]:
    """Shared MuST-C / mTEDx layout: <split>.yaml segment list (wav, offset,
    duration, speaker_id) + parallel <split>.<lang> utterance files."""
    import yaml

    with open(txt_root / f"{split}.yaml", encoding="utf-8") as f:
        segments = yaml.load(f, Loader=yaml.BaseLoader)
    texts = {}
    for lang in dict.fromkeys([src_lang, tgt_lang]):  # dedup, keep order
        utts = _read_lines(txt_root / f"{split}.{lang}")
        if len(utts) != len(segments):
            raise ValueError(
                f"{split}.{lang}: {len(utts)} lines vs {len(segments)} segments"
            )
        texts[lang] = utts
    per_wav_index: dict[str, int] = {}
    for i, seg in enumerate(segments):
        wav_name = seg["wav"]
        idx = per_wav_index.get(wav_name, 0)
        per_wav_index[wav_name] = idx + 1
        stem = Path(wav_name).stem
        wav_path = wav_root / wav_name
        if not wav_path.exists():  # mTEDx ships .flac named .wav in the yaml
            alt = wav_path.with_suffix(".flac")
            if alt.exists():
                wav_path = alt
        yield {
            "id": f"{id_prefix}{stem}_{idx}",
            "audio": str(wav_path),
            "offset": float(seg["offset"]),
            "duration": float(seg["duration"]),
            "src_text": texts[src_lang][i],
            "tgt_text": texts[tgt_lang][i],
            "speaker": seg.get("speaker_id", stem),
        }


def scan_mustc(
    root: str | Path, lang: str, split: str, task: str = "st"
) -> Iterator[dict]:
    """MuST-C en-{lang}/data/{split}/{wav,txt} tree.

    task="st": tgt=translation, src=English transcript (both kept — the ASR
    manifest is the same rows with tgt_text=src_text).
    task="asr": tgt=English transcript.
    """
    _root = Path(root) / f"en-{lang}" / "data" / split
    wav_root, txt_root = _root / "wav", _root / "txt"
    if not (wav_root.is_dir() and txt_root.is_dir()):
        raise FileNotFoundError(f"not a MuST-C split dir: {_root}")
    for row in _scan_yaml_segments(
        txt_root, wav_root, split, "en", lang, id_prefix=f"{split}_"
    ):
        if task == "asr":
            row = {**row, "tgt_text": row["src_text"]}
            row.pop("src_text")
        yield row


def scan_mtedx(root: str | Path, lang_pair: str, split: str) -> Iterator[dict]:
    """mTEDx {src}-{tgt}/data/{split}/{wav,txt} tree (prep_mtedx_data.py:52)."""
    src, tgt = lang_pair.split("-")
    _root = Path(root) / lang_pair / "data" / split
    wav_root, txt_root = _root / "wav", _root / "txt"
    if not (wav_root.is_dir() and txt_root.is_dir()):
        raise FileNotFoundError(f"not an mTEDx split dir: {_root}")
    for row in _scan_yaml_segments(txt_root, wav_root, split, src, tgt, ""):
        if src == tgt:  # ASR pair: single utterance stream
            row.pop("src_text")
        yield row


def scan_librispeech(root: str | Path, split: str) -> Iterator[dict]:
    """LibriSpeech {split}/{speaker}/{chapter}/ flac tree with
    {speaker}-{chapter}.trans.txt transcripts (prep_librispeech_data.py:32)."""
    split_root = Path(root) / split
    if not split_root.is_dir():
        raise FileNotFoundError(f"not a LibriSpeech split dir: {split_root}")
    for trans in sorted(split_root.glob("*/*/*.trans.txt")):
        chapter_dir = trans.parent
        for line in _read_lines(trans):
            if not line.strip():
                continue
            utt_id, text = line.split(" ", 1)
            audio = chapter_dir / f"{utt_id}.flac"
            if not audio.exists():
                alt = audio.with_suffix(".wav")
                if alt.exists():
                    audio = alt
                else:
                    logger.warning("missing audio for %s", utt_id)
                    continue
            speaker = utt_id.split("-")[0]
            yield {
                "id": utt_id,
                "audio": str(audio),
                "offset": 0.0,
                "duration": None,
                "tgt_text": text.strip(),
                "speaker": speaker,
            }


def scan_covost(
    root: str | Path,
    src_lang: str,
    split: str,
    tgt_lang: Optional[str] = None,
) -> Iterator[dict]:
    """CoVoST 2 over a CommonVoice tree: {root}/validated.tsv + clips/ audio,
    plus covost_v2.{src}_{tgt}.tsv with columns path/translation/split for
    the ST direction (prep_covost_data.py:40-200).  tgt_lang=None → ASR.
    """
    root = Path(root)
    cv_tsv = root / "validated.tsv"
    if not cv_tsv.exists():
        raise FileNotFoundError(f"missing CommonVoice manifest: {cv_tsv}")
    with open(cv_tsv, newline="", encoding="utf-8") as f:
        cv_rows = {
            r["path"]: r
            for r in csv.DictReader(f, delimiter="\t", quoting=csv.QUOTE_NONE)
        }
    if tgt_lang is None:
        # ASR: CommonVoice defines splits via per-split TSVs (train.tsv,
        # dev.tsv, test.tsv), not a column — read the split's own manifest
        # when it exists.  Falling back to validated.tsv for every split
        # would put the whole corpus in train AND test (code-review r3).
        split_tsv = root / f"{split}.tsv"
        if split_tsv.exists():
            with open(split_tsv, newline="", encoding="utf-8") as f:
                wanted = [
                    (r["path"], None)
                    for r in csv.DictReader(
                        f, delimiter="\t", quoting=csv.QUOTE_NONE
                    )
                ]
        else:
            has_split_col = any("split" in r for r in cv_rows.values())
            if not has_split_col:
                raise FileNotFoundError(
                    f"CommonVoice ASR split {split!r}: no {split_tsv} and "
                    "validated.tsv has no 'split' column — cannot derive "
                    "disjoint splits"
                )
            wanted = [
                (p, None) for p, r in cv_rows.items()
                if r.get("split") == split
            ]
    else:
        st_tsv = root / f"covost_v2.{src_lang}_{tgt_lang}.tsv"
        if not st_tsv.exists():
            raise FileNotFoundError(f"missing CoVoST translation TSV: {st_tsv}")
        with open(st_tsv, newline="", encoding="utf-8") as f:
            wanted = [
                (r["path"], r["translation"])
                for r in csv.DictReader(
                    f, delimiter="\t", quoting=csv.QUOTE_NONE
                )
                if r["split"] == split
            ]
    for path, translation in wanted:
        cv = cv_rows.get(path)
        if cv is None:
            logger.warning("clip %s not in validated.tsv", path)
            continue
        audio = root / "clips" / path
        if not audio.exists():
            alt = audio.with_suffix(".wav")
            if alt.exists():
                audio = alt
            else:
                logger.warning("missing clip %s", path)
                continue
        row = {
            "id": Path(path).stem,
            "audio": str(audio),
            "offset": 0.0,
            "duration": None,
            "tgt_text": translation if translation is not None else cv["sentence"],
            "speaker": cv.get("client_id", "unknown"),
        }
        if translation is not None:
            row["src_text"] = cv["sentence"]
        yield row


def _build_scanner(corpus: str):
    def scan(root, split, lang=None, task="st"):
        if corpus == "mustc":
            if not lang:
                raise ValueError("--lang required for MuST-C (e.g. de)")
            return scan_mustc(root, lang, split, task=task)
        if corpus == "mtedx":
            if not lang:
                raise ValueError("--lang required for mTEDx (e.g. es-en)")
            return scan_mtedx(root, lang, split)
        if corpus == "librispeech":
            return scan_librispeech(root, split)
        if corpus == "covost":
            if not lang:
                raise ValueError("--lang required for CoVoST (e.g. fr or fr-en)")
            if "-" in lang:
                src, tgt = lang.split("-")
            else:
                src, tgt = lang, None
            if task == "asr":
                tgt = None
            return scan_covost(root, src, split, tgt_lang=tgt)
        raise ValueError(f"unknown corpus {corpus!r}")

    return scan


CORPORA = {c: _build_scanner(c) for c in ("mustc", "mtedx", "librispeech", "covost")}

"""Audio data preparation: corpus scan → fbank extraction → zip packing →
vocab → manifests.

(reference: examples/speech_to_text/prep_audio_data.py:217-498 — fbank .npy
into fbank80.zip with path:offset:length specs, SPM vocab per task, TSV
manifests, per-dataset config.yaml, optional global CMVN stats, speed
perturbation; prep_mustc_data.py / prep_librispeech_data.py /
prep_covost_data.py / prep_mtedx_data.py — corpus-layout extraction.)

Input is either a raw TSV per split (``--corpus tsv``, columns
id/audio/tgt_text[/src_text] where ``audio`` is a wav path) or a raw corpus
tree (``--corpus mustc|librispeech|covost|mtedx`` + ``--data-root``), scanned
by `s2t_tpu.data.prep.corpora`.  Output: the directory layout the
SpeechToTextTask consumes directly.
"""

from __future__ import annotations

import argparse
import csv
import io
import logging
import zipfile
from pathlib import Path

import numpy as np
import yaml

logger = logging.getLogger("s2t_tpu.prep_audio")


def zip_data_offsets(zip_path: Path) -> dict:
    """filename -> (data_offset, length) for STORED members."""
    out = {}
    with zipfile.ZipFile(zip_path) as z, open(zip_path, "rb") as f:
        for info in z.infolist():
            f.seek(info.header_offset)
            hdr = f.read(30)
            nl = int.from_bytes(hdr[26:28], "little")
            el = int.from_bytes(hdr[28:30], "little")
            out[info.filename] = (info.header_offset + 30 + nl + el, info.file_size)
    return out


def _iter_tsv_rows(in_root: Path, split: str):
    with open(in_root / f"{split}.tsv", newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f, delimiter="\t", quoting=csv.QUOTE_NONE):
            yield {"offset": 0.0, "duration": None, **row}


class _CachedDecoder:
    """Segment scanners emit many rows per source file (MuST-C talks are
    40-minute wavs); decode each file once while its segments stream by."""

    def __init__(self):
        self._path = None
        self._wave = None
        self._sr = None

    def __call__(self, row):
        from s2t_tpu.data.prep.corpora import decode_audio

        path = row["audio"]
        if path != self._path:
            self._wave, self._sr = decode_audio(path)
            self._path = path
        off = float(row.get("offset") or 0.0)
        dur = row.get("duration")
        if dur is None or dur == "":
            return self._wave[int(off * self._sr):], self._sr
        start = int(off * self._sr)
        return self._wave[start:start + int(float(dur) * self._sr)], self._sr


def main(argv=None):
    from s2t_tpu.data.audio.fbank import fbank_numpy, speed_perturb_numpy
    from s2t_tpu.data.dictionary import Dictionary
    from s2t_tpu.data.prep.corpora import CORPORA
    from s2t_tpu.data.tokenizer import SPMTokenizer

    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default="tsv",
                   choices=["tsv"] + sorted(CORPORA),
                   help="raw input layout: pre-made TSVs or a corpus tree")
    p.add_argument("--input-root", help="dir with <split>.tsv raw manifests (corpus=tsv)")
    p.add_argument("--data-root", help="raw corpus root (corpus!=tsv)")
    p.add_argument("--lang", help="MuST-C target lang (de), mTEDx/CoVoST pair (es-en)")
    p.add_argument("--output-root", required=True)
    p.add_argument("--splits", nargs="+", default=None,
                   help="default: train dev test (tsv/covost), corpus-specific otherwise")
    p.add_argument("--n-mel-bins", type=int, default=80)
    p.add_argument("--vocab-size", type=int, default=5000)
    p.add_argument("--vocab-type", default="unigram", choices=["unigram", "bpe", "char"])
    p.add_argument("--speed-perturb", action="store_true",
                   help="3-way 0.9/1.0/1.1 speed perturbation of the train split")
    p.add_argument("--cmvn", action="store_true", help="write global CMVN stats")
    p.add_argument("--task", default="st", choices=["asr", "st"])
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    splits = args.splits
    if splits is None:
        splits = {
            "mustc": ["train", "dev", "tst-COMMON"],
            "mtedx": ["train", "valid", "test"],
        }.get(args.corpus, ["train", "dev", "test"])

    if args.corpus == "tsv":
        if not args.input_root:
            p.error("--input-root is required with --corpus tsv")
        in_root = Path(args.input_root)
        row_iters = {s: _iter_tsv_rows(in_root, s) for s in splits}
    else:
        if not args.data_root:
            p.error(f"--data-root is required with --corpus {args.corpus}")
        scan = CORPORA[args.corpus]
        row_iters = {
            s: scan(args.data_root, s, lang=args.lang, task=args.task)
            for s in splits
        }

    out_root = Path(args.output_root)
    out_root.mkdir(parents=True, exist_ok=True)

    zip_path = out_root / "fbank80.zip"
    rows_per_split = {}
    sum_feats = np.zeros(args.n_mel_bins, np.float64)
    sum_sq = np.zeros(args.n_mel_bins, np.float64)
    n_frames_total = 0
    decode = _CachedDecoder()

    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as z:
        for split in splits:
            rows = []
            for row in row_iters[split]:
                wave, sr = decode(row)
                speeds = (
                    [0.9, 1.0, 1.1]
                    if (args.speed_perturb and split == splits[0])
                    else [1.0]
                )
                for sp in speeds:
                    w = speed_perturb_numpy(wave, sp)
                    feats = fbank_numpy(w, sample_rate=sr, num_mel_bins=args.n_mel_bins)
                    uid = row["id"] if sp == 1.0 else f"sp{sp}-{row['id']}"
                    buf = io.BytesIO()
                    np.save(buf, feats)
                    z.writestr(f"{uid}.npy", buf.getvalue())
                    rows.append({**row, "id": uid, "n_frames": feats.shape[0]})
                    if split == splits[0]:
                        sum_feats += feats.sum(0)
                        sum_sq += (feats**2).sum(0)
                        n_frames_total += feats.shape[0]
            if not rows:
                raise RuntimeError(f"split {split!r} produced no utterances")
            rows_per_split[split] = rows

    offsets = zip_data_offsets(zip_path)
    for split, rows in rows_per_split.items():
        cols = ["id", "audio", "n_frames", "tgt_text"]
        cols += ["src_text"] if "src_text" in rows[0] else []
        cols += ["speaker"] if rows[0].get("speaker") else []
        with open(out_root / f"{split}.tsv", "w", encoding="utf-8") as f:
            f.write("\t".join(cols) + "\n")
            for r in rows:
                off, ln = offsets[f"{r['id']}.npy"]
                vals = [r["id"], f"fbank80.zip:{off}:{ln}", str(r["n_frames"])]
                vals += [r[c] for c in cols[3:]]
                f.write("\t".join(vals) + "\n")

    # vocab from train target text (reference: gen_vocab)
    train_rows = rows_per_split[splits[0]]
    lines = [r["tgt_text"] for r in train_rows]
    spm_path = out_root / f"spm_{args.vocab_type}{args.vocab_size}.json"
    tok = SPMTokenizer.train(lines, args.vocab_size, spm_path)
    d = Dictionary()
    for piece in tok.vocab():
        d.add_symbol(piece)
    d.save(out_root / "dict.txt")

    cfg = {
        "vocab_filename": "dict.txt",
        "input_feat_per_channel": args.n_mel_bins,
        "bpe_tokenizer": {"bpe": args.vocab_type, "model_path": str(spm_path)},
        "transforms": {"_train": {"transforms": ["utterance_cmvn", "specaugment"]}},
    }
    if args.cmvn and n_frames_total > 0:
        mean = sum_feats / n_frames_total
        std = np.sqrt(np.maximum(sum_sq / n_frames_total - mean**2, 1e-8))
        np.savez(out_root / "gcmvn.npz", mean=mean.astype(np.float32), std=std.astype(np.float32))
        cfg["global_cmvn_stats_npz"] = str(out_root / "gcmvn.npz")
        cfg["transforms"] = {
            "_train": {
                "transforms": ["global_cmvn", "specaugment"],
                "global_cmvn": {"stats_npz_path": str(out_root / "gcmvn.npz")},
            },
            "_eval": {
                "transforms": ["global_cmvn"],
                "global_cmvn": {"stats_npz_path": str(out_root / "gcmvn.npz")},
            },
        }
    with open(out_root / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    logger.info("prepared %s -> %s (%d train utts, vocab %d)",
                splits, out_root, len(train_rows), len(d))


if __name__ == "__main__":
    main()

"""Raw-waveform dataset for wav2vec-style pretraining.

(reference: fairseq/data/audio/raw_audio_dataset.py:21-126 — FileAudioDataset
over a manifest whose first line is the audio root and subsequent lines are
"relpath\tn_samples"; crop-to-max-size collation.)

TPU twist: batches pad to a static bucket lattice (lengths carried) instead
of cropping to the ragged batch minimum — masks keep validity, shapes stay
compile-friendly.  Supports .npy waveforms and PCM .wav via the stdlib.
"""

from __future__ import annotations

import wave
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np


def read_waveform(path: str) -> np.ndarray:
    """Load mono float32 waveform from .npy or 16-bit PCM .wav."""
    if path.endswith(".npy"):
        wav = np.load(path)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        return np.asarray(wav, np.float32).reshape(-1)
    if path.endswith(".wav"):
        with wave.open(path, "rb") as f:
            n = f.getnframes()
            width = f.getsampwidth()
            raw = f.readframes(n)
        if width == 2:
            wav = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        elif width == 4:
            wav = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported sample width {width} in {path}")
        return wav
    raise ValueError(f"unsupported audio format: {path}")


class RawAudioDataset:
    """Manifest TSV → raw waveforms (reference: FileAudioDataset)."""

    def __init__(
        self,
        manifest: str | Path,
        max_sample_size: Optional[int] = None,
        min_sample_size: int = 0,
        normalize: bool = False,
    ):
        lines = Path(manifest).read_text().strip().split("\n")
        self.root = lines[0].strip()
        self.paths: List[str] = []
        sizes: List[int] = []
        for ln in lines[1:]:
            p, n = ln.split("\t")
            if int(n) < min_sample_size:
                continue
            self.paths.append(p)
            sizes.append(int(n))
        self.sizes = np.asarray(sizes, np.int64)
        self.max_sample_size = max_sample_size
        # n_frames here are RAW SAMPLE counts, not 10ms frames — declare the
        # cap so Task.get_batch_iterator filters/buckets on the right scale
        # (the config's max_source_positions default of 6000 frames would
        # otherwise silently drop every clip longer than 0.375 s)
        self.frame_cap = int(max_sample_size) if max_sample_size else int(
            self.sizes.max() if len(self.sizes) else 1
        )
        self.normalize = normalize

    # protocol used by Task.get_batch_iterator
    @property
    def n_frames(self) -> np.ndarray:
        if self.max_sample_size:
            return np.minimum(self.sizes, self.max_sample_size)
        return self.sizes

    def __len__(self):
        return len(self.paths)

    def ordered_indices(self, shuffle=True, seed=1, epoch=1) -> np.ndarray:
        if shuffle:
            rng = np.random.default_rng(seed + epoch)
            order = rng.permutation(len(self))
        else:
            order = np.arange(len(self))
        # stable sort by size within the shuffle for efficient bucketing
        return order[np.argsort(self.n_frames[order], kind="stable")]

    def __getitem__(self, index: int) -> Dict[str, Any]:
        wav = read_waveform(str(Path(self.root) / self.paths[index]))
        if self.max_sample_size and len(wav) > self.max_sample_size:
            # random-ish deterministic crop (reference crops randomly per epoch)
            start = (index * 7919) % (len(wav) - self.max_sample_size + 1)
            wav = wav[start : start + self.max_sample_size]
        if self.normalize:
            wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-5)
        return {"id": index, "source": wav.astype(np.float32)}

    def collater(
        self, samples: List[Dict[str, Any]],
        frame_buckets: Optional[np.ndarray] = None,
        token_buckets: Optional[np.ndarray] = None,
        batch_multiple: int = 1,
    ) -> Dict[str, Any]:
        B = len(samples)
        pad_b = (-B) % batch_multiple
        lengths = np.asarray([len(s["source"]) for s in samples], np.int32)
        T = int(lengths.max())
        if frame_buckets is not None:
            from s2t_tpu.data.batching import bucketize

            T = int(bucketize(np.asarray([T]), frame_buckets)[0])
        src = np.zeros((B + pad_b, T), np.float32)
        for i, s in enumerate(samples):
            # truncate before assignment: a sample longer than the bucketed
            # T would otherwise raise a broadcast error mid-epoch
            L = min(int(lengths[i]), T)
            src[i, :L] = s["source"][:L]
        lengths = np.concatenate([np.minimum(lengths, T),
                                  np.zeros(pad_b, np.int32)])
        return {
            "ids": np.asarray([s["id"] for s in samples] + [-1] * pad_b),
            "nsentences": B,
            "source": src,
            "lengths": lengths,
            "ntokens": float(lengths.sum()),
        }

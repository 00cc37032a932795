"""Multilingual dataset concatenation with temperature resampling.

(reference: fairseq/data/audio/speech_to_text_dataset.py:518-652 —
SpeechToTextDatasetCreator.from_tsv concatenates per-language datasets and
upsamples them by ``_get_size_ratios`` (:576): with sampling temperature
alpha, ratio_l = (p_l^alpha / Σ p^alpha) / p_l where p_l = n_l / N — low-
resource languages are seen proportionally more often as alpha → 0.)
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class RoundRobinZipDataset:
    """Zip per-language-pair datasets; shorter ones repeat round-robin.

    (reference: fairseq/data/round_robin_zip_datasets.py:17-110 — one zip
    item carries one sample from EVERY pair, so a batch is a dict of
    per-pair sub-batches and a single train step updates all pairs, which
    is the multilingual_translation task's per-update round-robin.)

    A zip row's token cost is the SUM of its per-pair costs (all pairs ride
    in the same device batch), so ``n_frames`` is recomputed whenever
    ``ordered_indices`` re-deals the per-pair orders for a new epoch.
    """

    def __init__(self, datasets: Dict[str, Any]):
        assert datasets, "no datasets to zip"
        self.datasets = dict(datasets)
        self.longest_key = max(self.datasets, key=lambda k: len(self.datasets[k]))
        self._orders = {k: np.arange(len(d)) for k, d in self.datasets.items()}
        self._recompute_frames()

    def _recompute_frames(self):
        n = len(self)
        total = np.zeros(n, dtype=np.int64)
        for k, d in self.datasets.items():
            o = self._orders[k]
            total += d.n_frames[o[np.arange(n) % len(o)]]
        self.n_frames = total

    def __len__(self):
        return len(self.datasets[self.longest_key])

    def __getitem__(self, index: int) -> Dict[str, Any]:
        return {
            k: d[int(self._orders[k][index % len(self._orders[k])])]
            for k, d in self.datasets.items()
        }

    def collater(self, samples, **kw):
        if not samples:
            return None
        batch = {
            "pairs": {
                k: d.collater([s[k] for s in samples], **kw)
                for k, d in self.datasets.items()
            }
        }
        batch["ntokens"] = sum(
            b["ntokens"] for b in batch["pairs"].values() if "ntokens" in b
        )
        return batch

    def set_epoch(self, epoch: int):
        for d in self.datasets.values():
            if hasattr(d, "set_epoch"):
                d.set_epoch(epoch)

    def ordered_indices(self, shuffle: bool = True, seed: int = 1,
                        epoch: int = 1):
        """Deal a fresh per-pair order, then sort zip rows by total cost so
        bucketed batching stays tight."""
        rng = np.random.default_rng(seed + epoch)
        for k, d in self.datasets.items():
            base = np.arange(len(d))
            self._orders[k] = rng.permutation(base) if shuffle else base
        self._recompute_frames()
        order = np.arange(len(self))
        if shuffle:
            order = rng.permutation(order)
        return order[np.argsort(self.n_frames[order], kind="stable")[::-1]]


def get_size_ratios(sizes: Sequence[int], alpha: float = 1.0) -> np.ndarray:
    """Per-dataset upsampling ratios (reference: _get_size_ratios :576)."""
    sizes = np.asarray(sizes, np.float64)
    probs = sizes / sizes.sum()
    smoothed = probs**alpha
    smoothed = smoothed / smoothed.sum()
    return smoothed / probs


class MultilingualS2TDataset:
    """Concatenation of per-language SpeechToTextDatasets with per-epoch
    temperature upsampling (train only)."""

    def __init__(self, datasets: List[Any], alpha: float = 1.0,
                 resample: bool = True):
        assert datasets, "no datasets"
        self.datasets = datasets
        self.alpha = alpha
        self.resample = resample and len(datasets) > 1 and alpha != 1.0
        self.offsets = np.cumsum([0] + [len(d) for d in datasets])
        self.n_frames = np.concatenate([d.n_frames for d in datasets])
        if self.resample:
            self.ratios = get_size_ratios([len(d) for d in datasets], alpha)
        else:
            self.ratios = np.ones(len(datasets))

    def __len__(self):
        return int(self.offsets[-1])

    def _route(self, index: int):
        d = int(np.searchsorted(self.offsets, index, side="right") - 1)
        return self.datasets[d], index - int(self.offsets[d])

    def __getitem__(self, index: int) -> Dict[str, Any]:
        ds, local = self._route(index)
        item = dict(ds[local])
        item["id"] = index  # global id
        return item

    def collater(self, samples, **kw):
        return self.datasets[0].collater(samples, **kw)

    def set_epoch(self, epoch: int):
        for ds in self.datasets:
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)

    def ordered_indices(self, shuffle: bool = True, seed: int = 1, epoch: int = 1):
        """Global indices with per-epoch upsampling: dataset d contributes
        ~ratio_d * len(d) samples (fractional part resolved per epoch)."""
        rng = np.random.default_rng(seed + epoch)
        parts = []
        for d, ds in enumerate(self.datasets):
            n = len(ds)
            r = float(self.ratios[d])
            n_take = int(n * r)
            base = np.arange(n) + self.offsets[d]
            if n_take <= n:
                idx = rng.choice(base, size=max(n_take, 1), replace=False) \
                    if shuffle else base[: max(n_take, 1)]
            else:
                reps = np.concatenate([base] * (n_take // n))
                extra = rng.choice(base, size=n_take % n, replace=False)
                idx = np.concatenate([reps, extra])
            parts.append(idx)
        order = np.concatenate(parts)
        if shuffle:
            order = rng.permutation(order)
        return order[np.argsort(self.n_frames[order], kind="stable")[::-1]]

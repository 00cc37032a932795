"""BART denoising dataset: text infilling + sentence permutation.

(reference: fairseq/data/denoising_dataset.py:436 LoC — add_whole_word_mask
with span-Poisson text infilling, permute_sentences, insertion/deletion
noise; consumed by tasks/denoising.py and multilingual_denoising.)

Noising runs host-side in numpy (sequence lengths change, which is
host-domain work in this framework — the device sees static padded shapes);
each item's noise is drawn from a per-(seed, epoch, index) generator so
epochs see fresh corruptions, matching the reference's epoch-varying noise.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from s2t_tpu.data.dictionary import Dictionary
from s2t_tpu.data.text_dataset import TranslationDataset


def bart_noise(
    tokens: np.ndarray,
    rng: np.random.Generator,
    mask_id: int,
    vocab_size: int,
    mask_ratio: float = 0.3,
    poisson_lambda: float = 3.5,
    random_ratio: float = 0.1,
    insert_ratio: float = 0.0,
    delete_ratio: float = 0.0,
    permute_sentence_ratio: float = 1.0,
    full_stop_id: Optional[int] = None,
    eos_id: int = 2,
) -> np.ndarray:
    """Corrupt ``tokens`` (which end with EOS) BART-style; returns new ids."""
    core = list(tokens[:-1])
    if not core:
        return tokens

    # 1. sentence permutation (reference: permute_sentences)
    if permute_sentence_ratio > 0 and full_stop_id is not None:
        sents: List[List[int]] = []
        cur: List[int] = []
        for t in core:
            cur.append(int(t))
            if t == full_stop_id:
                sents.append(cur)
                cur = []
        if cur:
            sents.append(cur)
        if len(sents) > 1:
            n_perm = max(2, int(round(len(sents) * permute_sentence_ratio)))
            n_perm = min(n_perm, len(sents))
            which = rng.choice(len(sents), size=n_perm, replace=False)
            shuffled = rng.permutation(which)
            order = list(range(len(sents)))
            for a, b in zip(which, shuffled):
                order[a] = int(b)
            core = [t for i in order for t in sents[i]]

    # 2. text infilling: spans of Poisson(lambda) length replaced by one
    # <mask> (reference: add_whole_word_mask, mask_length="span-poisson")
    n_to_mask = int(round(len(core) * mask_ratio))
    out: List[int] = []
    if n_to_mask > 0:
        is_masked = np.zeros(len(core), bool)
        starts = []
        budget = n_to_mask
        guard = 0
        while budget > 0 and guard < 100:
            guard += 1
            span = int(rng.poisson(poisson_lambda))
            start = int(rng.integers(0, len(core)))
            span = min(span, budget, len(core) - start)
            if span <= 0:
                # zero-length span = pure <mask> insertion at `start`
                starts.append((start, 0))
                budget -= 1
                continue
            if is_masked[start : start + span].any():
                continue
            is_masked[start : start + span] = True
            starts.append((start, span))
            budget -= span
        insert_mask_at = {s for s, sp in starts if sp == 0}
        span_start = {s for s, sp in starts if sp > 0}
        i = 0
        while i < len(core):
            if i in insert_mask_at:
                out.append(mask_id)
            if is_masked[i]:
                if i in span_start:
                    # whole span -> a single mask (or random token)
                    if rng.random() < random_ratio:
                        out.append(int(rng.integers(4, vocab_size)))
                    else:
                        out.append(mask_id)
                i += 1
                continue
            out.append(int(core[i]))
            i += 1
    else:
        out = list(core)

    # 3. random deletion / insertion (reference: delete_ratio/insert_ratio)
    if delete_ratio > 0:
        out = [t for t in out if rng.random() >= delete_ratio] or [mask_id]
    if insert_ratio > 0:
        n_ins = int(round(len(out) * insert_ratio))
        for _ in range(n_ins):
            pos = int(rng.integers(0, len(out) + 1))
            out.insert(pos, int(rng.integers(4, vocab_size)))

    return np.asarray(out + [eos_id], dtype=np.int32)


class DenoisingDataset:
    """Lines of raw text; source = BART-noised ids, target = clean ids."""

    # padding/prev-token layout identical to bitext batches; the reference
    # collates denoising samples exactly like a language pair
    collater = TranslationDataset.collater

    def __init__(
        self,
        path: str | Path,
        dictionary: Dictionary,
        bpe=None,
        mask_ratio: float = 0.3,
        poisson_lambda: float = 3.5,
        random_ratio: float = 0.1,
        insert_ratio: float = 0.0,
        delete_ratio: float = 0.0,
        permute_sentence_ratio: float = 1.0,
        seed: int = 1,
        lang_tag: Optional[int] = None,
        noise: bool = True,
    ):
        self.dictionary = dictionary
        self.mask_id = dictionary.index("<mask>")
        self.full_stop_id = (
            dictionary.index(".") if "." in dictionary.indices else None
        )
        self.cfg = dict(
            mask_ratio=mask_ratio, poisson_lambda=poisson_lambda,
            random_ratio=random_ratio, insert_ratio=insert_ratio,
            delete_ratio=delete_ratio,
            permute_sentence_ratio=permute_sentence_ratio,
        )
        self.seed = seed
        self.epoch = 1
        self.noise = noise
        # mBART-style language tag appended to source / prepended target
        self.lang_tag = lang_tag
        self.items: List[np.ndarray] = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                if bpe is not None:
                    line = bpe.encode_line(line)
                self.items.append(dictionary.encode_line(line, append_eos=True))
        self.n_frames = np.asarray([len(t) for t in self.items], np.int64)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        clean = self.items[index]
        if self.noise:
            rng = np.random.default_rng(
                (self.seed * 1_000_003 + self.epoch) * 1_000_003 + index
            )
            src = bart_noise(
                clean, rng, self.mask_id, len(self.dictionary),
                full_stop_id=self.full_stop_id, eos_id=self.dictionary.eos(),
                **self.cfg,
            )
        else:
            src = clean
        tgt = clean
        if self.lang_tag is not None:
            src = np.concatenate([src, [self.lang_tag]]).astype(np.int32)
            tgt = np.concatenate([[self.lang_tag], tgt]).astype(np.int32)
        return {"id": index, "source": src, "target": tgt}

    def ordered_indices(self, shuffle: bool = True, seed: int = 1, epoch: int = 1):
        if shuffle:
            perm = np.random.default_rng(seed + epoch).permutation(len(self))
        else:
            perm = np.arange(len(self))
        return perm[np.argsort(self.n_frames[perm], kind="stable")[::-1]]

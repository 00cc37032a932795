"""Parallel/monolingual text datasets with on-the-fly subword tokenisation.

(reference: fairseq/data/language_pair_dataset.py (471 LoC) and the S2T
fork's translation_with_tokenizer ListTextDataset
(tasks/translation_with_tokenizer.py:43) — raw text + on-the-fly SPM so MT
shares dictionaries with ST for SATE init.)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from s2t_tpu.data.batching import bucketize, round_up
from s2t_tpu.data.dictionary import Dictionary


class TranslationDataset:
    """Raw parallel text: ``<split>.<src>`` / ``<split>.<tgt>`` files."""

    def __init__(
        self,
        src_path: str | Path,
        tgt_path: Optional[str | Path],
        src_dict: Dictionary,
        tgt_dict: Dictionary,
        src_bpe=None,
        tgt_bpe=None,
        tgt_lang_tag: Optional[int] = None,
        src_lang_tag: Optional[int] = None,
        align_path: Optional[str | Path] = None,
    ):
        self.src_dict, self.tgt_dict = src_dict, tgt_dict
        self.src_bpe, self.tgt_bpe = src_bpe, tgt_bpe
        # multilingual: prepend <lang:xx> to targets (reference: lang-tag
        # prepend in translation_multi_simple_epoch data manager)
        self.tgt_lang_tag = tgt_lang_tag
        # mBART-style source language id appended after EOS (reference:
        # tasks/translation_from_pretrained_bart.py append_source_id)
        self.src_lang_tag = src_lang_tag
        with open(src_path, encoding="utf-8") as f:
            self.src_lines = [l.rstrip("\n") for l in f]
        self.tgt_lines = None
        if tgt_path is not None and Path(tgt_path).exists():
            with open(tgt_path, encoding="utf-8") as f:
                self.tgt_lines = [l.rstrip("\n") for l in f]
            assert len(self.tgt_lines) == len(self.src_lines)
        # word alignments in Pharaoh "i-j" format (reference:
        # --load-alignments, load_langpair_dataset align path); indices are
        # token positions, so alignment training assumes whitespace-token
        # inputs (no BPE re-segmentation)
        self.alignments = None
        if align_path is not None and Path(align_path).exists():
            self.alignments = []
            with open(align_path, encoding="utf-8") as f:
                for line in f:
                    pairs = [
                        tuple(int(x) for x in p.split("-"))
                        for p in line.split()
                    ]
                    self.alignments.append(
                        np.asarray(pairs or [(-1, -1)], dtype=np.int32)
                    )
            assert len(self.alignments) == len(self.src_lines)
        # approximate lengths in whitespace tokens for batching; exact subword
        # lengths are produced lazily in __getitem__
        self.n_frames = np.asarray(
            [len(l.split()) + 2 for l in self.src_lines], dtype=np.int64
        )

    def __len__(self):
        return len(self.src_lines)

    def _encode(self, line: str, bpe, dic: Dictionary) -> np.ndarray:
        if bpe is not None:
            line = bpe.encode_line(line)
        return dic.encode_line(line, append_eos=True)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        src = self._encode(self.src_lines[index], self.src_bpe, self.src_dict)
        if self.src_lang_tag is not None:
            src = np.concatenate([src, [self.src_lang_tag]]).astype(src.dtype)
        item = {"id": index, "source": src}
        if self.tgt_lines is not None:
            tgt = self._encode(self.tgt_lines[index], self.tgt_bpe, self.tgt_dict)
            if self.tgt_lang_tag is not None:
                tgt = np.concatenate([[self.tgt_lang_tag], tgt]).astype(tgt.dtype)
            item["target"] = tgt
        if self.alignments is not None:
            item["alignment"] = self.alignments[index]
        return item

    def ordered_indices(self, shuffle: bool = True, seed: int = 1, epoch: int = 1):
        if shuffle:
            rng = np.random.default_rng(seed + epoch)
            perm = rng.permutation(len(self))
        else:
            perm = np.arange(len(self))
        order = np.argsort(self.n_frames[perm], kind="stable")[::-1]
        return perm[order]

    def collater(
        self,
        samples: List[Dict[str, Any]],
        frame_buckets=None,
        token_buckets=None,
        batch_multiple: int = 1,
        pad_id: int = 1,
        eos_id: int = 2,
    ) -> Dict[str, Any]:
        B_real = len(samples)
        B = round_up(B_real, batch_multiple)
        max_S = max(len(s["source"]) for s in samples)
        if frame_buckets is not None:
            max_S = int(bucketize(np.asarray([max_S]), frame_buckets)[0])
        src = np.full((B, max_S), pad_id, dtype=np.int32)
        src_lengths = np.zeros((B,), dtype=np.int32)
        for i, s in enumerate(samples):
            t = s["source"][:max_S]
            src[i, : len(t)] = t
            src_lengths[i] = len(t)
        batch = {
            "src_tokens": src,
            "src_lengths": src_lengths,
            "ids": np.asarray([s["id"] for s in samples] + [-1] * (B - B_real)),
            "nsentences": B_real,
        }
        if "target" in samples[0]:
            max_U = max(len(s["target"]) for s in samples)
            if token_buckets is not None:
                max_U = int(bucketize(np.asarray([max_U]), token_buckets)[0])
            from s2t_tpu.data.batching import collate_targets

            target, prev, tgt_lengths = collate_targets(
                [s["target"] for s in samples], B, max_U, pad_id, eos_id
            )
            batch.update(
                target=target, prev_tokens=prev, target_lengths=tgt_lengths,
                ntokens=float(tgt_lengths.sum()),
            )
        if "alignment" in samples[0]:
            P = max(len(s["alignment"]) for s in samples)
            aligns = np.full((B, P, 2), -1, dtype=np.int32)
            for i, s in enumerate(samples):
                a = s["alignment"]
                aligns[i, : len(a)] = a
            batch["alignments"] = aligns
        return batch


class MonolingualDataset:
    """Token-stream LM dataset: lines -> blocks of ``block_size`` tokens
    (reference: fairseq/data/monolingual_dataset.py + TokenBlockDataset)."""

    def __init__(
        self,
        path: str | Path,
        dictionary: Dictionary,
        bpe=None,
        block_size: int = 128,
    ):
        self.dictionary = dictionary
        ids: List[np.ndarray] = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if bpe is not None:
                    line = bpe.encode_line(line)
                ids.append(dictionary.encode_line(line, append_eos=True))
        stream = np.concatenate(ids) if ids else np.zeros((0,), np.int32)
        n_blocks = max(len(stream) // block_size, 1)
        stream = stream[: n_blocks * block_size]
        if len(stream) < n_blocks * block_size:
            stream = np.pad(stream, (0, n_blocks * block_size - len(stream)),
                            constant_values=dictionary.pad())
        self.blocks = stream.reshape(n_blocks, block_size).astype(np.int32)
        self.n_frames = np.full(n_blocks, block_size, dtype=np.int64)

    def __len__(self):
        return len(self.blocks)

    def __getitem__(self, index):
        return {"id": index, "tokens": self.blocks[index]}

    def ordered_indices(self, shuffle=True, seed=1, epoch=1):
        if shuffle:
            return np.random.default_rng(seed + epoch).permutation(len(self))
        return np.arange(len(self))

    def collater(self, samples, frame_buckets=None, token_buckets=None,
                 batch_multiple=1, pad_id=1, eos_id=2):
        B_real = len(samples)
        B = round_up(B_real, batch_multiple)
        L = samples[0]["tokens"].shape[0]
        tokens = np.full((B, L), pad_id, dtype=np.int32)
        for i, s in enumerate(samples):
            tokens[i] = s["tokens"]
        prev = np.roll(tokens, 1, axis=1)
        prev[:, 0] = eos_id
        lengths = np.asarray(
            [L] * B_real + [0] * (B - B_real), dtype=np.int32
        )
        # dummy rows fully padded
        tokens[B_real:] = pad_id
        prev[B_real:] = pad_id
        return {
            "prev_tokens": prev,
            "target": tokens,
            "target_lengths": lengths,
            "ntokens": float(L * B_real),
            "ids": np.asarray([s["id"] for s in samples] + [-1] * (B - B_real)),
            "nsentences": B_real,
        }

"""Token-budget batch packing over a static bucket lattice.

Replaces the reference's Cython ``batch_by_size_vec`` (reference:
fairseq/data/data_utils_fast.pyx:178, called from data/data_utils.py:272-310)
with numpy host code, and adds the TPU-critical twist: **shape bucketing**.

Every batch is padded to a (T_bucket, U_bucket, B_bucket) triple drawn from a
small geometric lattice, so the number of distinct compiled shapes is bounded
(the reference merely *warns* about XLA recompiles, trainer.py:1283; here the
shape discipline is structural).  Cost accounting uses the padded sizes, so
the token budget reflects what the TPU actually computes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def make_buckets(
    max_val: int,
    num_buckets: int,
    min_val: int = 16,
    sizes: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Static bucket lattice up to max_val (inclusive).

    With ``sizes`` (the dataset's actual length distribution), boundaries are
    length quantiles so padding waste is bounded regardless of how far the
    configured cap sits above the data (a 250k-sample cap over 800-sample
    clips must not pad to 250k).  Without sizes, falls back to a geometric
    span — the reference's BucketPadLengthDataset likewise buckets on the
    observed size distribution (fairseq/data/bucket_pad_length_dataset.py).
    Boundaries snap up to multiples of 8 (never past max_val) so padded T
    stays sublane-friendly on TPU.
    """
    if num_buckets <= 1:
        return np.asarray([max_val], dtype=np.int64)
    if sizes is not None and len(sizes) > 0:
        s = np.minimum(np.asarray(sizes, np.int64), max_val)
        qs = np.quantile(s, np.linspace(0.0, 1.0, num_buckets + 1)[1:])
        buckets = np.ceil(qs).astype(np.int64)
    else:
        buckets = np.ceil(np.geomspace(min_val, max_val, num_buckets)).astype(
            np.int64
        )
        buckets[-1] = max_val
    buckets = np.maximum(buckets, 1)
    buckets = np.minimum(((buckets + 7) // 8) * 8, max_val)
    return np.unique(buckets)


def bucketize(values: np.ndarray, buckets: np.ndarray) -> np.ndarray:
    """Smallest bucket >= value (values above the top bucket get the top)."""
    idx = np.searchsorted(buckets, values, side="left")
    idx = np.minimum(idx, len(buckets) - 1)
    return buckets[idx]


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def batch_by_size(
    indices: np.ndarray,
    frame_lengths: np.ndarray,
    token_lengths: Optional[np.ndarray] = None,
    max_tokens: Optional[int] = 40000,
    max_sentences: Optional[int] = None,
    frame_buckets: Optional[np.ndarray] = None,
    required_batch_size_multiple: int = 8,
) -> List[np.ndarray]:
    """Pack ``indices`` (pre-sorted by caller) into batches under the budget.

    Cost of a batch = B_padded * T_bucket(max frame len) — the padded compute.
    Returns a list of index arrays.
    """
    # native fast path (C++ equivalent of the reference's Cython kernel)
    from s2t_tpu import clib

    lens = np.asarray(frame_lengths, np.int64)[indices]
    if frame_buckets is not None:
        lens = bucketize(lens, frame_buckets)
    offsets = clib.batch_by_size_native(
        lens,
        int(max_tokens) if max_tokens else 0,
        int(max_sentences) if max_sentences else 0,
        required_batch_size_multiple,
    )
    if offsets is not None:
        out, start = [], 0
        for end in offsets:
            out.append(np.asarray(indices[start:end], dtype=np.int64))
            start = int(end)
        return out

    batches: List[np.ndarray] = []
    cur: List[int] = []
    cur_max_frames = 0

    def cost(n, max_frames):
        b = round_up(n, required_batch_size_multiple)
        t = (
            int(bucketize(np.asarray([max_frames]), frame_buckets)[0])
            if frame_buckets is not None
            else max_frames
        )
        return b * t

    for i in indices:
        fl = int(frame_lengths[i])
        new_max = max(cur_max_frames, fl)
        if cur and (
            (max_tokens is not None and cost(len(cur) + 1, new_max) > max_tokens)
            or (max_sentences is not None and len(cur) >= max_sentences)
        ):
            batches.append(np.asarray(cur, dtype=np.int64))
            cur, cur_max_frames = [], 0
            new_max = fl
        cur.append(int(i))
        cur_max_frames = new_max
    if cur:
        batches.append(np.asarray(cur, dtype=np.int64))
    return batches


def filter_by_size(
    frame_lengths: np.ndarray,
    token_lengths: Optional[np.ndarray],
    max_frames: int,
    max_tokens: int,
    min_frames: int = 1,
) -> np.ndarray:
    """Indices of samples within size limits (reference:
    --max-source-positions / --skip-invalid-size-inputs,
    tasks/fairseq_task.py get_batch_iterator filter step)."""
    keep = (frame_lengths <= max_frames) & (frame_lengths >= min_frames)
    if token_lengths is not None:
        keep &= token_lengths <= max_tokens
    return np.nonzero(keep)[0]


def collate_targets(samples_targets, B, max_U, pad_id=1, eos_id=2):
    """Pad target id sequences to (B, max_U) with EOS-shifted prev_tokens.

    Over-long sequences are truncated EOS-preservingly (the terminal EOS
    survives).  One implementation for every collater — the duplicated
    copies had already drifted (backtranslation lost the EOS-preserving
    truncation).  Returns (target, prev_tokens, tgt_lengths).
    """
    import numpy as np

    target = np.full((B, max_U), pad_id, dtype=np.int32)
    prev = np.full((B, max_U), pad_id, dtype=np.int32)
    tgt_lengths = np.zeros((B,), dtype=np.int32)
    for i, t_full in enumerate(samples_targets):
        t = np.asarray(t_full)[:max_U]
        if len(t_full) > max_U:
            t = np.concatenate([t[: max_U - 1], [eos_id]])
        target[i, : len(t)] = t
        prev[i, 0] = eos_id
        prev[i, 1 : len(t)] = t[:-1]
        tgt_lengths[i] = len(t)
    return target, prev, tgt_lengths

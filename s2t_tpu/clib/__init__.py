"""Native host-side kernels (C++ via ctypes) with pure-Python fallbacks.

Native stays native (reference: fairseq builds its host ops as C extensions,
setup.py:65-131): edit distance (libnat equivalent), BLEU n-gram stats
(libbleu equivalent), and token-budget batch packing (data_utils_fast.pyx
equivalent) are compiled from C++ on first use.  Everything degrades to the
numpy implementations if no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).parent
_SO = _DIR / "libs2t_native.so"
_SOURCES = ["edit_dist.cpp", "bleu.cpp"]

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        *[str(_DIR / s) for s in _SOURCES],
        "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native clib build failed (%s); using Python fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists():
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.batch_edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.batch_by_size_fast.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.batch_by_size_fast.restype = ctypes.c_int64
        lib.bleu_add_sentence.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except OSError as e:
        logger.warning("native clib load failed (%s)", e)
        _lib = None
    return _lib


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def batch_edit_distance(
    refs: np.ndarray, ref_lens: np.ndarray, hyps: np.ndarray, hyp_lens: np.ndarray
) -> np.ndarray:
    """(B, max_ref), (B,), (B, max_hyp), (B,) int32 -> (B,) int32 distances."""
    lib = get_lib()
    refs = np.ascontiguousarray(refs, np.int32)
    hyps = np.ascontiguousarray(hyps, np.int32)
    ref_lens = np.ascontiguousarray(ref_lens, np.int32)
    hyp_lens = np.ascontiguousarray(hyp_lens, np.int32)
    B = refs.shape[0]
    out = np.zeros((B,), np.int32)
    if lib is not None:
        lib.batch_edit_distance(
            _i32p(refs), _i32p(ref_lens), _i32p(hyps), _i32p(hyp_lens),
            B, refs.shape[1] if refs.ndim > 1 else 0,
            hyps.shape[1] if hyps.ndim > 1 else 0, _i32p(out),
        )
        return out
    from s2t_tpu.utils.scoring import edit_distance

    for b in range(B):
        out[b] = edit_distance(
            refs[b, : ref_lens[b]].tolist(), hyps[b, : hyp_lens[b]].tolist()
        )
    return out


def batch_by_size_native(
    lengths: np.ndarray, max_tokens: int, max_sentences: int, bsz_mult: int
) -> Optional[np.ndarray]:
    """Returns batch end-offsets, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    lengths = np.ascontiguousarray(lengths, np.int64)
    out = np.zeros((len(lengths) + 1,), np.int64)
    n = lib.batch_by_size_fast(
        _i64p(lengths), len(lengths), max_tokens or -1, max_sentences or -1,
        bsz_mult, _i64p(out),
    )
    return out[:n]


def bleu_stats(refs_list, hyps_list) -> np.ndarray:
    """Accumulate BLEU stats over int-token sentences.

    Returns [m1, t1, m2, t2, m3, t3, m4, t4, hyp_len, ref_len] int64.
    """
    stats = np.zeros((10,), np.int64)
    lib = get_lib()
    if lib is not None:
        for ref, hyp in zip(refs_list, hyps_list):
            r = np.ascontiguousarray(ref, np.int32)
            h = np.ascontiguousarray(hyp, np.int32)
            lib.bleu_add_sentence(_i32p(r), len(r), _i32p(h), len(h), _i64p(stats))
        return stats
    # python fallback
    from collections import Counter

    for ref, hyp in zip(refs_list, hyps_list):
        for n in range(4):
            rgrams = Counter(tuple(ref[i : i + n + 1]) for i in range(max(len(ref) - n, 0)))
            hgrams = [tuple(hyp[i : i + n + 1]) for i in range(max(len(hyp) - n, 0))]
            stats[2 * n + 1] += len(hgrams)
            hcount = Counter(hgrams)
            stats[2 * n] += sum(min(c, rgrams[g]) for g, c in hcount.items())
        stats[8] += len(hyp)
        stats[9] += len(ref)
    return stats


def bleu_from_stats(stats: np.ndarray, smooth: bool = False) -> float:
    """Corpus BLEU from accumulated stats (matches libbleu/score semantics)."""
    import math

    log_prec = 0.0
    for n in range(4):
        m, t = stats[2 * n], stats[2 * n + 1]
        if smooth:
            m, t = m + 1, t + 1
        if m == 0 or t == 0:
            return 0.0
        log_prec += math.log(m / t)
    hyp_len, ref_len = int(stats[8]), int(stats[9])
    if hyp_len == 0:
        return 0.0
    bp = min(0.0, 1.0 - ref_len / hyp_len)
    return 100.0 * math.exp(log_prec / 4.0 + bp)

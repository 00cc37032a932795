"""Scoring: WER/CER (edit distance) and BLEU.

(reference: fairseq/scoring/{wer.py,bleu.py,chrf.py} — WER via the
``editdistance`` package, BLEU via sacrebleu or the C libbleu.)

Edit distance here is a numpy DP (vectorised over the shorter string); a
C++ kernel (clib) can be slotted in later — scoring is host-side and far
from the critical path.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Sequence

import numpy as np

from s2t_tpu.registry import register_scorer


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance: numpy row recurrence with a short inner pass for
    the insertion prefix-min (strings are sentence-length; host-side)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    hyp_arr = np.asarray([hash(h) for h in hyp])
    prev = np.arange(m + 1, dtype=np.int32)
    for i, r in enumerate(ref, 1):
        cur = np.empty(m + 1, dtype=np.int32)
        cur[0] = i
        # substitution/deletion part is vectorised
        cur[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (hyp_arr != hash(r)))
        # insertion (cur[j-1]+1) is a running prefix dependency
        for j in range(1, m + 1):
            if cur[j] > cur[j - 1] + 1:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[m])


@register_scorer("wer")
class WERScorer:
    """Word error rate accumulator (reference: fairseq/scoring/wer.py)."""

    def __init__(self, char_level: bool = False):
        self.char_level = char_level
        self.distance = 0
        self.ref_length = 0

    def add(self, ref: str, hyp: str):
        if self.char_level:
            r, h = list(ref.replace(" ", "")), list(hyp.replace(" ", ""))
        else:
            r, h = ref.split(), hyp.split()
        self.distance += self._distance(r, h)
        self.ref_length += len(r)

    @staticmethod
    def _distance(r, h) -> int:
        from s2t_tpu import clib

        if clib.get_lib() is not None and r and h:
            vocab = {}
            rid = np.asarray([[vocab.setdefault(t, len(vocab)) for t in r]], np.int32)
            hid = np.asarray([[vocab.setdefault(t, len(vocab)) for t in h]], np.int32)
            return int(
                clib.batch_edit_distance(
                    rid, np.asarray([len(r)], np.int32),
                    hid, np.asarray([len(h)], np.int32),
                )[0]
            )
        return edit_distance(r, h)

    def score(self) -> float:
        return 100.0 * self.distance / max(self.ref_length, 1)

    def result_string(self) -> str:
        return f"WER: {self.score():.2f}"


@register_scorer("cer")
class CERScorer(WERScorer):
    def __init__(self):
        super().__init__(char_level=True)


@register_scorer("sacrebleu")
@register_scorer("bleu")
class BLEUScorer:
    """Corpus BLEU via sacrebleu (reference: fairseq/scoring/bleu.py +
    tasks/speech_to_text.py:582 _cal_bleu)."""

    def __init__(self, tokenize: str = "13a", lowercase: bool = False):
        self.refs: List[str] = []
        self.hyps: List[str] = []
        self.tokenize = tokenize
        self.lowercase = lowercase

    def add(self, ref: str, hyp: str):
        self.refs.append(ref)
        self.hyps.append(hyp)

    def score(self) -> float:
        import sacrebleu

        if not self.hyps:
            return 0.0
        return sacrebleu.corpus_bleu(
            self.hyps, [self.refs], tokenize=self.tokenize, lowercase=self.lowercase
        ).score

    def result_string(self) -> str:
        import sacrebleu

        if not self.hyps:
            return "BLEU: 0.0"
        return str(
            sacrebleu.corpus_bleu(
                self.hyps, [self.refs], tokenize=self.tokenize, lowercase=self.lowercase
            )
        )


@register_scorer("chrf")
class ChrFScorer:
    """chrF: character n-gram F-score (reference: fairseq/scoring/chrf.py,
    via sacrebleu)."""

    def __init__(self, char_order: int = 6, beta: float = 2.0):
        self.char_order = char_order
        self.beta = beta
        self.refs: List[str] = []
        self.hyps: List[str] = []

    def add(self, ref: str, hyp: str):
        self.refs.append(ref)
        self.hyps.append(hyp)

    def score(self) -> float:
        import sacrebleu

        if not self.hyps:
            return 0.0
        return sacrebleu.corpus_chrf(
            self.hyps, [self.refs], char_order=self.char_order, beta=self.beta
        ).score

    def result_string(self) -> str:
        return f"chrF{self.beta:g} = {self.score():.2f}"


@register_scorer("fast_bleu")
class FastBLEUScorer:
    """Tokenised corpus BLEU via the native n-gram counter (the libbleu
    equivalent; reference: fairseq/scoring/bleu.py Scorer)."""

    def __init__(self):
        self.vocab = {}
        self.refs = []
        self.hyps = []

    def _ids(self, s: str):
        return [self.vocab.setdefault(t, len(self.vocab)) for t in s.split()]

    def add(self, ref: str, hyp: str):
        self.refs.append(self._ids(ref))
        self.hyps.append(self._ids(hyp))

    def score(self) -> float:
        from s2t_tpu import clib

        return clib.bleu_from_stats(clib.bleu_stats(self.refs, self.hyps))

    def result_string(self) -> str:
        return f"BLEU4 = {self.score():.2f}"


def build_scorer(name: str):
    from s2t_tpu.registry import SCORERS

    return SCORERS.get(name)()

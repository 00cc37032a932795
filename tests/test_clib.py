"""Native C++ kernel tests: build, parity with Python implementations."""

import numpy as np
import pytest

from s2t_tpu import clib
from s2t_tpu.utils.scoring import WERScorer, edit_distance


@pytest.fixture(scope="module")
def lib():
    l = clib.get_lib()
    if l is None:
        pytest.skip("no C++ compiler available")
    return l


class TestEditDistance:
    def test_matches_python(self, lib, rng):
        B, MR, MH = 8, 12, 15
        refs = rng.integers(0, 5, size=(B, MR)).astype(np.int32)
        hyps = rng.integers(0, 5, size=(B, MH)).astype(np.int32)
        rl = rng.integers(1, MR + 1, size=B).astype(np.int32)
        hl = rng.integers(1, MH + 1, size=B).astype(np.int32)
        out = clib.batch_edit_distance(refs, rl, hyps, hl)
        for b in range(B):
            expect = edit_distance(refs[b, : rl[b]].tolist(), hyps[b, : hl[b]].tolist())
            assert out[b] == expect

    def test_known_cases(self, lib):
        refs = np.asarray([[1, 2, 3, 0]], np.int32)
        hyps = np.asarray([[1, 3, 0, 0]], np.int32)
        d = clib.batch_edit_distance(
            refs, np.asarray([3], np.int32), hyps, np.asarray([2], np.int32)
        )
        assert d[0] == 1  # one deletion

    def test_wer_scorer_uses_native(self, lib):
        s = WERScorer()
        s.add("a b c d", "a x c")
        assert s.distance == 2  # substitution + deletion
        assert s.ref_length == 4


class TestBatchBySize:
    def test_matches_python_fallback(self, lib, rng):
        from s2t_tpu.data.batching import batch_by_size, make_buckets

        lens = rng.integers(10, 500, size=200)
        idx = np.argsort(-lens)
        buckets = make_buckets(512, 8)
        native = batch_by_size(
            idx, lens, max_tokens=4096, frame_buckets=buckets,
            required_batch_size_multiple=8,
        )
        # force python path
        orig = clib.batch_by_size_native
        clib.batch_by_size_native = lambda *a, **k: None
        try:
            py = batch_by_size(
                idx, lens, max_tokens=4096, frame_buckets=buckets,
                required_batch_size_multiple=8,
            )
        finally:
            clib.batch_by_size_native = orig
        assert len(native) == len(py)
        for a, b in zip(native, py):
            np.testing.assert_array_equal(a, b)


class TestBLEU:
    def test_perfect_match(self, lib):
        stats = clib.bleu_stats([[1, 2, 3, 4, 5]], [[1, 2, 3, 4, 5]])
        assert clib.bleu_from_stats(stats) == pytest.approx(100.0)

    def test_against_sacrebleu(self, lib):
        import sacrebleu

        refs = ["the cat sat on the mat", "a quick brown fox jumps high"]
        hyps = ["the cat sat on a mat", "a quick brown dog jumps high"]
        sb = sacrebleu.corpus_bleu(hyps, [refs], tokenize="none").score
        vocab = {}
        ids = lambda s: [vocab.setdefault(t, len(vocab)) for t in s.split()]
        stats = clib.bleu_stats([ids(r) for r in refs], [ids(h) for h in hyps])
        ours = clib.bleu_from_stats(stats)
        assert ours == pytest.approx(sb, abs=0.5)

    def test_python_fallback_parity(self, lib):
        refs = [[1, 2, 3, 4], [5, 6, 7]]
        hyps = [[1, 2, 4], [5, 6, 7]]
        native = clib.bleu_stats(refs, hyps)
        orig = clib.get_lib
        clib.get_lib = lambda: None
        try:
            py = clib.bleu_stats(refs, hyps)
        finally:
            clib.get_lib = orig
        np.testing.assert_array_equal(native, py)

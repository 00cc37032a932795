"""ARPA n-gram LM: train/save/load round-trip, backoff scoring, CTC fusion.

(reference integration points: s2t_ctc.py:215-231 kenlm beam rescoring;
this framework's self-contained equivalent lives in s2t_tpu/data/ngram_lm.py.)
"""

import math

import numpy as np
import pytest

from s2t_tpu.data.ngram_lm import ArpaLM, rescore_nbest, train_ngram_lm


CORPUS = [
    "the cat sat",
    "the cat ran",
    "the dog sat",
    "a cat sat",
] * 4


class TestTrainScore:
    def test_probabilities_normalise(self):
        lm = train_ngram_lm(CORPUS, order=2)
        # unigram distribution sums to <= 1 (discount mass goes to <unk>)
        uni = [10 ** lp for g, (lp, _) in lm.ngrams[1].items() if g != ("<s>",)]
        assert 0.9 < sum(uni) <= 1.0 + 1e-6

    def test_seen_beats_unseen(self):
        lm = train_ngram_lm(CORPUS, order=2)
        seen = lm.score("the cat sat".split())
        unseen = lm.score("sat the a".split())
        assert seen > unseen

    def test_backoff_handles_unseen_bigram(self):
        lm = train_ngram_lm(CORPUS, order=2)
        # "dog ran" never occurs; must back off to unigram, stay finite
        s = lm.score("the dog ran".split())
        assert math.isfinite(s)

    def test_oov_uses_unk(self):
        lm = train_ngram_lm(CORPUS, order=2)
        s = lm.score(["zebra"], bos=False, eos=False)
        assert math.isfinite(s)
        # <unk> mass is below any frequent in-vocab unigram
        assert s < lm.score(["cat"], bos=False, eos=False)

    def test_save_load_round_trip(self, tmp_path):
        lm = train_ngram_lm(CORPUS, order=3)
        lm.save(tmp_path / "lm.arpa")
        lm2 = ArpaLM.load(tmp_path / "lm.arpa")
        assert lm2.order == 3
        for sent in ("the cat sat", "a dog ran", "cat the"):
            np.testing.assert_allclose(
                lm2.score(sent.split()), lm.score(sent.split()), atol=1e-4
            )


class TestFusion:
    def test_rescore_prefers_lm_likely_hypothesis(self):
        from s2t_tpu.data.dictionary import Dictionary

        d = Dictionary()
        for w in ["the", "cat", "sat", "dog", "zzz"]:
            d.add_symbol(w)
        lm = train_ngram_lm(CORPUS, order=2)

        def ids(text):
            return [d.index(w) for w in text.split()]

        T = 4
        hyp_good = ids("the cat sat") + [d.pad()]
        hyp_bad = ids("zzz zzz zzz") + [d.pad()]
        tokens = np.asarray([[hyp_bad, hyp_good]], np.int32)  # bad first
        scores = np.asarray([[0.0, -0.2]], np.float32)  # CTC slightly prefers bad
        new_tokens, new_scores = rescore_nbest(
            tokens, scores, d, lm, lm_weight=1.0, pad_id=d.pad()
        )
        np.testing.assert_array_equal(new_tokens[0, 0], hyp_good)
        assert new_scores[0, 0] >= new_scores[0, 1]

    def test_ctc_generator_with_arpa(self, tmp_path):
        """End-to-end: NAST CTC beam decode + ARPA fusion via the task."""
        import jax
        import jax.numpy as jnp

        from s2t_tpu.data.dictionary import Dictionary
        from s2t_tpu.data.ngram_lm import train_ngram_lm
        from s2t_tpu.inference.ctc_decoder import CTCDecoder, CTCGenerator
        from s2t_tpu.models.build import build_model

        d = Dictionary()
        for w in ["the", "cat", "sat", "dog"]:
            d.add_symbol(w)
        lm = train_ngram_lm(CORPUS, order=2)
        model = build_model(
            "s2t_ctc",
            {"encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
             "encoder_layers": 2, "encoder_attention_heads": 2,
             "subsampling_filter": 32, "dropout": 0.0},
            vocab_size=len(d),
        )
        feats = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 40, 80)), jnp.float32
        )
        lens = jnp.full((2,), 40, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, lens)["params"]
        dec = CTCDecoder(beam_size=3, pad_id=d.pad())
        gen = CTCGenerator(model, dec, ngram_lm=lm, lm_weight=0.3,
                           dictionary=d)
        tokens, scores, _ = gen.generate(
            params, {"features": feats, "feat_lengths": lens}
        )
        assert tokens.shape[:2] == (2, 3)
        s = np.asarray(scores)
        assert (np.diff(s, axis=1) <= 1e-5).all()  # sorted best-first

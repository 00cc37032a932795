"""Inference engine tests.

Deterministic scripted-probability beam tests mirror the reference's
TestIncrementalDecoder approach (reference: tests/utils.py:464-559 +
tests/test_sequence_generator.py); the CTC prefix beam is checked against
exact brute-force prefix marginals.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.inference.beam_search import beam_search
from s2t_tpu.inference.ctc_decoder import CTCDecoder, ctc_prefix_beam_decode
from s2t_tpu.inference.generator import SequenceGenerator
from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel

PAD, EOS = 1, 2


def scripted_decode_step(tables):
    """decode_step closure emitting fixed log-probs per step (any history)."""
    V = tables.shape[1]

    def step(tokens, cache, index):
        N = tokens.shape[0]
        lp = jax.lax.dynamic_index_in_dim(tables, index, keepdims=False)
        return jnp.broadcast_to(lp, (N, V)), cache

    return step


class TestBeamSearch:
    def test_scripted_probabilities(self):
        # step 0: P(3)=0.6, P(4)=0.4 ; step 1: P(5)=0.9, P(eos)=0.1 ;
        # step 2: P(eos)=1.0
        NEG = -1e9
        V = 6
        t = np.full((3, V), NEG, np.float32)
        t[0, 3], t[0, 4] = np.log(0.6), np.log(0.4)
        t[1, 5], t[1, EOS] = np.log(0.9), np.log(0.1)
        t[2, EOS] = 0.0
        tables = jnp.asarray(t)
        cache = {"dummy": jnp.zeros((1 * 2, 1))}
        tokens, scores = beam_search(
            scripted_decode_step(tables), cache, batch_size=1, beam_size=2,
            max_len=3, eos_id=EOS, pad_id=PAD, lenpen=1.0,
        )
        tokens, scores = np.asarray(tokens), np.asarray(scores)
        assert tokens[0, 0].tolist() == [3, 5, EOS]
        assert tokens[0, 1].tolist() == [4, 5, EOS]
        np.testing.assert_allclose(scores[0, 0], np.log(0.6 * 0.9 * 1.0) / 3, atol=1e-5)
        np.testing.assert_allclose(scores[0, 1], np.log(0.4 * 0.9 * 1.0) / 3, atol=1e-5)

    def test_lenpen_direction(self):
        # fairseq lenpen semantics: score / len**p.  For negative scores,
        # p < 0 favours shorter hypotheses, p > 0 favours longer ones.
        NEG = -1e9
        V = 6
        t = np.full((3, V), NEG, np.float32)
        t[0, 3] = np.log(1.0)
        t[1, 5], t[1, EOS] = np.log(0.7), np.log(0.3)
        t[2, EOS] = 0.0
        tokens_short, _ = beam_search(
            scripted_decode_step(jnp.asarray(t)), {"d": jnp.zeros((2, 1))},
            1, 2, 3, eos_id=EOS, pad_id=PAD, lenpen=-4.0,
        )
        tokens_long, _ = beam_search(
            scripted_decode_step(jnp.asarray(t)), {"d": jnp.zeros((2, 1))},
            1, 2, 3, eos_id=EOS, pad_id=PAD, lenpen=1.0,
        )
        assert np.asarray(tokens_short)[0, 0].tolist()[:2] == [3, EOS]
        assert np.asarray(tokens_long)[0, 0].tolist() == [3, 5, EOS]

    def test_min_len_blocks_early_eos(self):
        NEG = -1e9
        V = 6
        t = np.full((4, V), NEG, np.float32)
        t[:, EOS] = np.log(0.9)
        t[:, 3] = np.log(0.1)
        tokens, _ = beam_search(
            scripted_decode_step(jnp.asarray(t)), {"d": jnp.zeros((1, 1))},
            1, 1, 4, eos_id=EOS, pad_id=PAD, min_len=2,
        )
        out = np.asarray(tokens)[0, 0].tolist()
        assert out[:3] == [3, 3, EOS]  # eos blocked until step index 2

    def test_no_repeat_ngram(self):
        # scripted: always prefers repeating "3 4 3 4" — 2-gram block forces
        # divergence after the second "3 4"
        NEG = -1e9
        V = 6
        t = np.full((5, V), NEG, np.float32)
        t[:, 3] = np.log(0.5)
        t[:, 4] = np.log(0.4)
        t[:, 5] = np.log(0.05)
        t[:, EOS] = np.log(0.05)
        tokens, _ = beam_search(
            scripted_decode_step(jnp.asarray(t)), {"d": jnp.zeros((1, 1))},
            1, 1, 5, eos_id=EOS, pad_id=PAD, no_repeat_ngram_size=2,
        )
        seq = np.asarray(tokens)[0, 0].tolist()
        # collect bigrams; none may repeat
        bigrams = [(seq[i], seq[i + 1]) for i in range(len(seq) - 1) if seq[i + 1] != PAD]
        assert len(bigrams) == len(set(bigrams)), seq


class TestSequenceGenerator:
    def test_model_beam_decode(self):
        cfg = S2TTransformerConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
            decoder_layers=1, decoder_attention_heads=2, vocab_size=20,
            subsampling_filter=64, dropout=0.0, max_target_positions=32,
        )
        model = S2TTransformerModel(cfg)
        B, T = 2, 32
        feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, 80)), jnp.float32)
        lens = jnp.asarray([T, T - 10])
        variables = model.init(jax.random.PRNGKey(0), feats, lens, jnp.zeros((B, 3), jnp.int32))
        gen = SequenceGenerator(model, beam_size=3, max_len_b=10)
        tokens, scores, enc = gen.generate(variables["params"], {"features": feats, "feat_lengths": lens})
        assert tokens.shape[:2] == (B, 3)
        assert np.all(np.diff(np.asarray(scores), axis=1) <= 1e-5)  # sorted desc
        # every hypothesis ends with EOS then pads
        for b in range(B):
            seq = np.asarray(tokens)[b, 0]
            assert EOS in seq.tolist()


def exact_ctc_prefix_probs(log_probs, T, vocab, blank=0):
    """Brute-force: probability of each complete label sequence."""
    probs = {}
    for L in range(0, T + 1):
        for seq in itertools.product(vocab, repeat=L):
            # skip invalid CTC targets handled by alignment enumeration below
            total = 0.0
            for path in itertools.product(range(log_probs.shape[1]), repeat=T):
                # collapse path
                out, prev = [], -1
                for s in path:
                    if s != blank and s != prev:
                        out.append(s)
                    prev = s
                if tuple(out) == seq:
                    total += np.exp(sum(log_probs[t, s] for t, s in enumerate(path)))
            if total > 0:
                probs[seq] = total
    return probs


class TestCTCPrefixBeam:
    def test_matches_bruteforce_top1(self):
        rng = np.random.default_rng(5)
        T, V = 4, 4  # blank=0, pad=1(never emitted), tokens {2,3}
        logits = rng.normal(size=(1, T, V)).astype(np.float32)
        logits[..., 1] = -10.0  # pad never likely
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        exact = exact_ctc_prefix_probs(lp[0], T, vocab=(2, 3))
        best_exact = max(exact.items(), key=lambda kv: kv[1])
        toks, scores = ctc_prefix_beam_decode(
            jnp.asarray(lp), jnp.asarray([T]), beam_size=8, prune_k=4
        )
        got = tuple(t for t in np.asarray(toks)[0, 0].tolist() if t != PAD)
        assert got == best_exact[0], (got, best_exact, exact)
        np.testing.assert_allclose(
            float(scores[0, 0]), np.log(best_exact[1]), atol=0.15
        )

    def test_beats_or_equals_greedy(self):
        from s2t_tpu.ops.ctc import ctc_greedy_decode

        rng = np.random.default_rng(6)
        logits = rng.normal(size=(3, 12, 8)).astype(np.float32)
        lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        lens = jnp.asarray([12, 10, 7])
        toks_b, scores_b = ctc_prefix_beam_decode(lp, lens, beam_size=4)
        toks_g, lens_g = ctc_greedy_decode(lp, lens)
        assert toks_b.shape[0] == 3
        assert np.all(np.isfinite(np.asarray(scores_b)[:, 0]))

    def test_decoder_wrapper(self):
        rng = np.random.default_rng(7)
        enc = {
            "ctc_logits": jnp.asarray(rng.normal(size=(2, 10, 6)), jnp.float32),
            "encoder_lengths": jnp.asarray([10, 8]),
            "inter_ctc_logits": (),
        }
        dec = CTCDecoder(beam_size=1)
        toks, lens = dec.decode(enc)
        assert toks.shape == (2, 10)
        dec5 = CTCDecoder(beam_size=5)
        toks5, scores5 = dec5.decode(enc)
        assert toks5.shape == (2, 5, 10)


class TestSequenceScorer:
    def test_score_reference(self):
        from s2t_tpu.inference.scorer import SequenceScorer
        from s2t_tpu.models.s2t_transformer import (
            S2TTransformerConfig, S2TTransformerModel,
        )

        cfg = S2TTransformerConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1, decoder_attention_heads=2,
            vocab_size=20, subsampling_filter=64, dropout=0.0,
            max_target_positions=32,
        )
        model = S2TTransformerModel(cfg)
        B, T = 2, 32
        feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, 80)), jnp.float32)
        lens = jnp.full((B,), T, jnp.int32)
        target = jnp.asarray([[4, 5, 2, 1], [6, 7, 8, 2]], jnp.int32)
        prev = jnp.asarray([[2, 4, 5, 1], [2, 6, 7, 8]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, lens, prev)["params"]
        scorer = SequenceScorer(model)
        out = scorer.score(params, {
            "features": feats, "feat_lengths": lens,
            "prev_tokens": prev, "target": target,
        })
        assert out["positional_scores"].shape == (B, 4)
        assert np.all(np.asarray(out["score"]) < 0)
        assert int(out["ntokens"][0]) == 3  # pad excluded
        # score equals the sum of positional scores
        np.testing.assert_allclose(
            np.asarray(out["score"]), np.asarray(out["positional_scores"]).sum(-1),
            rtol=1e-5,
        )


class TestCrossKVPrecompute:
    def test_precomputed_cross_kv_matches_recompute(self):
        """The opt-in static cross-attention K/V path (reference: static_kv
        caching) is numerically identical to per-step recomputation.  The
        generator defaults to recompute on TPU (bandwidth-bound; see
        inference/generator.py note)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from s2t_tpu.models.transformer import (
            TransformerMTConfig, TransformerModel,
        )
        from s2t_tpu.utils.masking import lengths_to_mask

        cfg = TransformerMTConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=2,
            decoder_attention_heads=2, dropout=0.0, vocab_size=20,
        )
        m = TransformerModel(cfg)
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.integers(4, 20, size=(2, 6)), jnp.int32)
        lens = jnp.asarray([6, 4], jnp.int32)
        prev = jnp.asarray([[2, 5, 6], [2, 7, 8]], jnp.int32)
        p = m.init(jax.random.PRNGKey(0), src, lens, prev)["params"]
        enc = m.apply({"params": p}, src, lens, method=TransformerModel.encode)
        em = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        ckv = m.apply({"params": p}, enc["encoder_out"],
                      method=TransformerModel.precompute_cross)
        c1 = m.apply({"params": p}, 2, 8, method=TransformerModel.init_cache)
        c2 = m.apply({"params": p}, 2, 8, method=TransformerModel.init_cache)
        for t in range(3):
            l1, c1 = m.apply({"params": p}, prev[:, t:t+1], c1, jnp.asarray(t),
                             enc["encoder_out"], em,
                             method=TransformerModel.decode_step)
            l2, c2 = m.apply({"params": p}, prev[:, t:t+1], c2, jnp.asarray(t),
                             enc["encoder_out"], em, cross_kv=ckv,
                             method=TransformerModel.decode_step)
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       atol=1e-6)

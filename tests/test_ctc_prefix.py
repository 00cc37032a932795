"""On-device CTC prefix scorer tests (joint CTC/attention decoding).

Validated against brute-force prefix/complete-sequence marginals — the same
oracle used for the standalone CTC prefix beam decoder.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.inference.beam_search import beam_search
from s2t_tpu.inference.ctc_prefix import CTCPrefixScorer

PAD, EOS, BLANK = 1, 2, 0


def brute_force(lp, kind="prefix"):
    """lp: (T, V). Returns dict seq -> prob (prefix or complete)."""
    T, V = lp.shape
    out = {}
    for path in itertools.product(range(V), repeat=T):
        # never emit pad/eos frames in the lattice alphabet for this test
        p = np.exp(sum(lp[t, s] for t, s in enumerate(path)))
        seq, prev = [], -1
        for s in path:
            if s != BLANK and s != prev:
                seq.append(s)
            prev = s
        seq = tuple(seq)
        if kind == "complete":
            out[seq] = out.get(seq, 0.0) + p
        else:
            for i in range(len(seq) + 1):
                out.setdefault(seq[:i], 0.0)
            # prefix prob: every path contributes to all its prefixes? No —
            # prefix marginal handled separately below
    return out


def prefix_prob(lp, prefix):
    """P(label seq starts with `prefix`) = sum over complete seqs w/ prefix."""
    complete = brute_force(lp, "complete")
    return sum(p for seq, p in complete.items() if seq[: len(prefix)] == tuple(prefix))


class TestScorer:
    def setup_method(self):
        rng = np.random.default_rng(3)
        T, V = 4, 5  # blank=0, pad=1, eos=2, tokens {3,4}
        logits = rng.normal(size=(1, T, V)).astype(np.float32)
        logits[..., PAD] = -10
        logits[..., EOS] = -10
        self.lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        self.T, self.V = T, V

    def test_first_token_scores_match_bruteforce(self):
        scorer = CTCPrefixScorer(jnp.asarray(self.lp), jnp.asarray([self.T]), beam_size=1)
        state = scorer.init_state()
        cand = jnp.asarray([[3, 4, EOS]], jnp.int32)
        delta, new_r, psi = scorer.score_candidates(state, cand)
        delta = np.asarray(delta)[0]
        # prefix marginals for single tokens
        for j, c in enumerate([3, 4]):
            expect = np.log(prefix_prob(self.lp[0], (c,)))
            assert delta[j] == pytest.approx(expect, abs=1e-3), (c, delta[j], expect)
        # EOS on the empty prefix = P(empty complete seq) = all-blank path
        expect_eos = self.lp[0, :, BLANK].sum()
        assert delta[2] == pytest.approx(expect_eos, abs=1e-3)

    def test_two_token_chain(self):
        scorer = CTCPrefixScorer(jnp.asarray(self.lp), jnp.asarray([self.T]), beam_size=1)
        state = scorer.init_state()
        cand = jnp.asarray([[3, 4]], jnp.int32)
        delta1, new_r, psi1 = scorer.score_candidates(state, cand)
        # select candidate 0 (token 3)
        state2 = scorer.select(
            state, cand, new_r, psi1,
            parent_idx=jnp.zeros((1, 1), jnp.int32),
            cand_pos=jnp.zeros((1, 1), jnp.int32),
            selected_tok=jnp.asarray([[3]], jnp.int32),
        )
        delta2, _, _ = scorer.score_candidates(state2, jnp.asarray([[4, 3, EOS]], jnp.int32))
        delta2 = np.asarray(delta2)[0]
        # psi(3,4) - psi(3)
        expect_34 = np.log(prefix_prob(self.lp[0], (3, 4))) - np.log(
            prefix_prob(self.lp[0], (3,))
        )
        assert delta2[0] == pytest.approx(expect_34, abs=1e-3)
        # repeat token 3 3 requires a blank boundary
        expect_33 = np.log(prefix_prob(self.lp[0], (3, 3))) - np.log(
            prefix_prob(self.lp[0], (3,))
        )
        assert delta2[1] == pytest.approx(expect_33, abs=1e-3)
        # eos: complete prob of (3,)
        complete = brute_force(self.lp[0], "complete")
        expect_eos = np.log(complete.get((3,), 1e-30)) - np.log(
            prefix_prob(self.lp[0], (3,))
        )
        assert delta2[2] == pytest.approx(expect_eos, abs=1e-3)


class TestJointBeam:
    def test_pure_ctc_beam_matches_bruteforce_best(self):
        rng = np.random.default_rng(8)
        T, V = 4, 5
        logits = rng.normal(size=(1, T, V)).astype(np.float32) * 2.0
        logits[..., PAD] = -10
        logits[..., EOS] = -10
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        complete = brute_force(lp[0], "complete")
        best_seq = max(complete.items(), key=lambda kv: kv[1])[0]

        K = 8
        scorer = CTCPrefixScorer(jnp.asarray(lp), jnp.asarray([T]), beam_size=K)

        def uniform_decode(tokens, cache, i):
            return jnp.zeros((tokens.shape[0], V)), cache

        tokens, scores = beam_search(
            uniform_decode, {"d": jnp.zeros((K, 1))}, 1, K, max_len=T + 1,
            eos_id=EOS, pad_id=PAD, lenpen=0.0, min_len=0,
            ctc_scorer=scorer, ctc_weight=1.0, ctc_prune_k=V,
        )
        got = tuple(
            t for t in np.asarray(tokens)[0, 0].tolist() if t not in (PAD, EOS)
        )
        assert got == best_seq, (got, best_seq, sorted(
            complete.items(), key=lambda kv: -kv[1])[:3])

    def test_model_integration(self):
        from s2t_tpu.inference.generator import SequenceGenerator
        from s2t_tpu.models.s2t_transformer import (
            S2TTransformerConfig, S2TTransformerModel,
        )

        cfg = S2TTransformerConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, vocab_size=20, subsampling_filter=64,
            dropout=0.0, max_target_positions=32,
        )
        model = S2TTransformerModel(cfg)
        B, T = 2, 32
        feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, 80)), jnp.float32)
        lens = jnp.asarray([T, T - 12])
        params = model.init(
            jax.random.PRNGKey(0), feats, lens, jnp.zeros((B, 3), jnp.int32)
        )["params"]
        gen = SequenceGenerator(
            model, beam_size=3, max_len_b=8, infer_ctc_weight=0.3
        )
        tokens, scores, _ = gen.generate(params, {"features": feats, "feat_lengths": lens})
        assert tokens.shape[:2] == (B, 3)
        assert np.all(np.isfinite(np.asarray(scores)[:, 0]))

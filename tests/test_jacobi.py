"""CTC-drafted Jacobi decoding: exactness vs sequential greedy + draft
sanity (s2t_tpu/inference/jacobi.py — no reference equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.inference.generator import SequenceGenerator
from s2t_tpu.inference.jacobi import (
    JacobiGenerator, ctc_greedy_draft, jacobi_greedy_decode,
)
from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel

B, T, D, V = 3, 40, 80, 24


def build(seed=0, **kw):
    cfg = S2TTransformerConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=2, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=1, decoder_attention_heads=2, vocab_size=V,
        subsampling_filter=32, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, max_target_positions=32, **kw,
    )
    model = S2TTransformerModel(cfg)
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lens = jnp.asarray([T, T - 8, T - 14], jnp.int32)
    params = model.init(
        jax.random.PRNGKey(seed), feats, lens, jnp.zeros((B, 4), jnp.int32)
    )["params"]
    return model, params, feats, lens


class TestCTCDraft:
    def test_collapse(self):
        # frames: blank, a, a, b, blank, c -> draft a b c </s>
        logits = np.full((1, 6, 8), -10.0, np.float32)
        for t, tok in enumerate([0, 4, 4, 5, 0, 6]):
            logits[0, t, tok] = 10.0
        draft = np.asarray(ctc_greedy_draft(
            jnp.asarray(logits), jnp.asarray([6]), max_len=8
        ))
        np.testing.assert_array_equal(draft[0], [4, 5, 6, 2, 1, 1, 1, 1])

    def test_respects_lengths(self):
        logits = np.full((1, 6, 8), -10.0, np.float32)
        for t, tok in enumerate([4, 5, 6, 7, 7, 7]):
            logits[0, t, tok] = 10.0
        draft = np.asarray(ctc_greedy_draft(
            jnp.asarray(logits), jnp.asarray([2]), max_len=8
        ))
        np.testing.assert_array_equal(draft[0], [4, 5, 2, 1, 1, 1, 1, 1])


class TestJacobiExactness:
    def test_equals_sequential_greedy_random_weights(self):
        """The Jacobi fixpoint must reproduce beam-1 decoding exactly for
        ARBITRARY weights (the guarantee is structural, not statistical)."""
        for seed in (0, 1, 2):
            model, params, feats, lens = build(seed=seed)
            greedy = SequenceGenerator(
                model, beam_size=1, max_len_b=12, max_target_positions=32,
            )
            gt, gs, _ = greedy.generate(
                params, {"features": feats, "feat_lengths": lens}
            )
            jac = JacobiGenerator(model, max_len_b=12, max_target_positions=32)
            jt, js, _ = jac.generate(
                params, {"features": feats, "feat_lengths": lens}
            )
            gt, jt = np.asarray(gt), np.asarray(jt)
            for b in range(B):
                g = [int(x) for x in gt[b, 0]]
                j = [int(x) for x in jt[b, 0]]
                g = g[: g.index(2) + 1] if 2 in g else g
                j = j[: j.index(2) + 1] if 2 in j else j
                assert g == j, f"seed={seed} b={b}: {g} vs {j}"

    def test_converges_fast_on_decisive_model(self):
        """With a sharpened CTC head that agrees with the decoder, the draft
        is a near-fixpoint (iteration count << L)."""
        model, params, feats, lens = build()
        jac = JacobiGenerator(model, max_len_b=12, max_target_positions=32)
        jac.generate(params, {"features": feats, "feat_lengths": lens})
        assert jac.last_iters <= 12  # bounded by L; records convergence

    def test_no_ctc_cold_start(self):
        model, params, feats, lens = build(use_ctc=False)
        greedy = SequenceGenerator(
            model, beam_size=1, max_len_b=10, max_target_positions=32,
        )
        gt, _, _ = greedy.generate(
            params, {"features": feats, "feat_lengths": lens}
        )
        jac = JacobiGenerator(model, max_len_b=10, max_target_positions=32)
        jt, _, _ = jac.generate(params, {"features": feats, "feat_lengths": lens})
        gt, jt = np.asarray(gt), np.asarray(jt)
        for b in range(B):
            g = [int(x) for x in gt[b, 0]]
            j = [int(x) for x in jt[b, 0]]
            g = g[: g.index(2) + 1] if 2 in g else g
            j = j[: j.index(2) + 1] if 2 in j else j
            assert g == j, f"b={b}: {g} vs {j}"


class TestJacobiNonDefaultConfigs:
    def test_min_len_and_maxlen_a_parity(self):
        """Non-default min_len and a frame-scaled horizon must still match
        beam-1 exactly (review findings: max_len was computed from raw
        frames; min_len was dropped)."""
        model, params, feats, lens = build(seed=4)
        greedy = SequenceGenerator(
            model, beam_size=1, max_len_a=0.5, max_len_b=4, min_len=3,
            max_target_positions=32,
        )
        gt, gs, _ = greedy.generate(
            params, {"features": feats, "feat_lengths": lens}
        )
        jac = JacobiGenerator(model, max_len_a=0.5, max_len_b=4, min_len=3,
                              max_target_positions=32)
        jt, js, _ = jac.generate(params, {"features": feats, "feat_lengths": lens})
        gt, jt = np.asarray(gt), np.asarray(jt)
        for b in range(B):
            g = [int(x) for x in gt[b, 0]]
            j = [int(x) for x in jt[b, 0]]
            g = g[: g.index(2) + 1] if 2 in g else g
            j = j[: j.index(2) + 1] if 2 in j else j
            assert g == j, f"b={b}: {g} vs {j}"
        # scores are length-penalty-normalised like the beam engine
        np.testing.assert_allclose(
            np.asarray(js)[:, 0], np.asarray(gs)[:, 0], atol=1e-3
        )


class TestJacobiCLI:
    def test_generate_cli_flag(self, tmp_path):
        """generation.jacobi=true routes the generate CLI through
        JacobiGenerator and still decodes the overfit corpus exactly."""
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from test_binaries import make_tiny_corpus, tiny_train_cfg

        from s2t_tpu.cli.generate import main as generate_main
        from s2t_tpu.cli.train import main as train_main

        data = make_tiny_corpus(tmp_path / "data")
        cfg = tiny_train_cfg(data, tmp_path / "ckpt")
        out = train_main(cfg)
        cfg.generation.jacobi = True
        cfg.generation.results_path = str(tmp_path / "gen")
        gen = generate_main(cfg, out["state"].params, task=out["task"])
        matches = sum(1 for r in gen["results"].values() if r["hyp"] == r["ref"])
        assert matches >= 9, matches

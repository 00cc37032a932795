"""Search-strategy parity: prefix forcing, diverse beam, model ensembling.

(reference behaviours: fairseq/sequence_generator.py:128,616 prefix_tokens;
search.py:552 DiverseBeamSearch; sequence_generator.py:788-900 EnsembleModel.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.inference.generator import SequenceGenerator
from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel

B, T, D, V = 2, 40, 80, 24


def build(seed=0, **kw):
    cfg = S2TTransformerConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=2, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=1, decoder_attention_heads=2, vocab_size=V,
        subsampling_filter=32, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, max_target_positions=32, **kw,
    )
    model = S2TTransformerModel(cfg)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(
        jax.random.PRNGKey(seed), feats, lens, jnp.zeros((B, 4), jnp.int32)
    )["params"]
    return model, params, feats, lens


class TestPrefixForcing:
    def test_prefix_is_respected(self):
        model, params, feats, lens = build()
        gen = SequenceGenerator(model, beam_size=3, max_len_b=10,
                                max_target_positions=32, prefix_size=2)
        prefix = np.asarray([[5, 9], [7, 4]], np.int32)
        batch = {
            "features": feats, "feat_lengths": lens,
            "target": jnp.asarray(
                np.concatenate([prefix, np.full((B, 3), 1, np.int32)], 1)
            ),
        }
        tokens, scores, _ = gen.generate(params, batch)
        toks = np.asarray(tokens)
        for b in range(B):
            for k in range(3):
                np.testing.assert_array_equal(
                    toks[b, k, :2], prefix[b],
                    err_msg=f"prefix not forced at b={b} k={k}",
                )

    def test_no_prefix_unchanged(self):
        """prefix_size=0 behaves exactly as before."""
        model, params, feats, lens = build()
        g0 = SequenceGenerator(model, beam_size=2, max_len_b=8,
                               max_target_positions=32)
        g1 = SequenceGenerator(model, beam_size=2, max_len_b=8,
                               max_target_positions=32, prefix_size=0)
        t0, s0, _ = g0.generate(params, {"features": feats, "feat_lengths": lens})
        t1, s1, _ = g1.generate(params, {"features": feats, "feat_lengths": lens})
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


class TestDiverseBeam:
    def test_groups_produce_diverse_hypotheses(self):
        model, params, feats, lens = build()
        plain = SequenceGenerator(model, beam_size=4, max_len_b=10,
                                  max_target_positions=32)
        diverse = SequenceGenerator(
            model, beam_size=4, max_len_b=10, max_target_positions=32,
            diverse_beam_groups=2, diverse_beam_strength=10.0,
        )
        tp, _, _ = plain.generate(params, {"features": feats, "feat_lengths": lens})
        td, _, _ = diverse.generate(params, {"features": feats, "feat_lengths": lens})
        tp, td = np.asarray(tp), np.asarray(td)
        assert tp.shape == td.shape

        def n_unique(t):
            return len({tuple(t[0, k]) for k in range(t.shape[1])})

        # strong diversity penalty must not *reduce* hypothesis variety
        assert n_unique(td) >= n_unique(tp) - 1
        assert np.isfinite(np.asarray(td)).all()


class TestDiverseSiblings:
    def test_rank_penalty_spreads_parents(self):
        """With gamma > 0 the K survivors cannot all be siblings of one
        parent beyond what the penalty allows (reference: search.py:746)."""
        model, params, feats, lens = build()
        plain = SequenceGenerator(model, beam_size=4, max_len_b=10,
                                  max_target_positions=32)
        sib = SequenceGenerator(model, beam_size=4, max_len_b=10,
                                max_target_positions=32, diversity_rate=5.0)
        tp, sp, _ = plain.generate(params, {"features": feats, "feat_lengths": lens})
        ts, ss, _ = sib.generate(params, {"features": feats, "feat_lengths": lens})
        tp, ts = np.asarray(tp), np.asarray(ts)
        assert tp.shape == ts.shape
        assert np.isfinite(np.asarray(ss)).all()

        def n_unique(t):
            return len({tuple(t[0, k]) for k in range(t.shape[1])})

        assert n_unique(ts) >= n_unique(tp) - 1

    def test_zero_rate_is_identity(self):
        model, params, feats, lens = build()
        g0 = SequenceGenerator(model, beam_size=3, max_len_b=8,
                               max_target_positions=32)
        g1 = SequenceGenerator(model, beam_size=3, max_len_b=8,
                               max_target_positions=32, diversity_rate=-1.0)
        t0, _, _ = g0.generate(params, {"features": feats, "feat_lengths": lens})
        t1, _, _ = g1.generate(params, {"features": feats, "feat_lengths": lens})
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


class TestConstrainedSearch:
    def _gen(self, model, mode="unordered", beam=4):
        return SequenceGenerator(model, beam_size=beam, max_len_b=16,
                                 max_target_positions=32,
                                 constraints_mode=mode)

    def test_single_token_constraints_appear(self):
        from s2t_tpu.inference.constrained import pack_constraints

        model, params, feats, lens = build()
        cons = pack_constraints([[[5]], [[7]]])
        gen = self._gen(model)
        tokens, scores, _ = gen.generate(
            params,
            {"features": feats, "feat_lengths": lens,
             "constraints": jnp.asarray(cons)},
        )
        toks = np.asarray(tokens)
        # best hypothesis of each sentence contains its constraint token
        assert 5 in toks[0, 0], toks[0, 0]
        assert 7 in toks[1, 0], toks[1, 0]
        assert np.isfinite(np.asarray(scores)[:, 0]).all()

    def test_phrase_constraint_is_contiguous(self):
        from s2t_tpu.inference.constrained import pack_constraints

        model, params, feats, lens = build()
        phrase = [9, 4, 11]
        cons = pack_constraints([[phrase], [phrase]])
        gen = self._gen(model)
        tokens, _, _ = gen.generate(
            params,
            {"features": feats, "feat_lengths": lens,
             "constraints": jnp.asarray(cons)},
        )
        toks = np.asarray(tokens)
        for b in range(B):
            row = list(toks[b, 0])
            found = any(
                row[i : i + 3] == phrase for i in range(len(row) - 2)
            )
            assert found, f"phrase {phrase} not contiguous in {row}"

    def test_ordered_constraints_in_order(self):
        from s2t_tpu.inference.constrained import pack_constraints

        model, params, feats, lens = build()
        cons = pack_constraints([[[5], [9]], [[7], [3]]])
        gen = self._gen(model, mode="ordered")
        tokens, _, _ = gen.generate(
            params,
            {"features": feats, "feat_lengths": lens,
             "constraints": jnp.asarray(cons)},
        )
        toks = np.asarray(tokens)
        for b, (a, c) in enumerate([(5, 9), (7, 3)]):
            row = list(toks[b, 0])
            assert a in row and c in row, row
            assert row.index(a) < row.index(c), (
                f"ordered constraints out of order in {row}"
            )

    def test_unconstrained_batch_entry(self):
        """A sentence with no constraints decodes normally alongside a
        constrained one."""
        from s2t_tpu.inference.constrained import pack_constraints

        model, params, feats, lens = build()
        cons = pack_constraints([[[5, 9]], []])
        gen = self._gen(model)
        tokens, scores, _ = gen.generate(
            params,
            {"features": feats, "feat_lengths": lens,
             "constraints": jnp.asarray(cons)},
        )
        toks = np.asarray(tokens)
        row = list(toks[0, 0])
        assert any(row[i : i + 2] == [5, 9] for i in range(len(row) - 1)), row
        # unconstrained sentence still produces a finite, EOS-terminated hyp
        assert np.isfinite(np.asarray(scores)[1, 0])
        assert 2 in list(toks[1, 0])


class TestEnsemble:
    def test_two_model_ensemble_runs_and_single_model_is_identity(self):
        model, params, feats, lens = build(seed=0)
        model2, params2, _, _ = build(seed=1)
        single = SequenceGenerator(model, beam_size=2, max_len_b=8,
                                   max_target_positions=32)
        ens = SequenceGenerator(model, beam_size=2, max_len_b=8,
                                max_target_positions=32,
                                extra_models=[model2])
        t1, s1, _ = single.generate(params, {"features": feats, "feat_lengths": lens})
        t2, s2, _ = ens.generate(
            params, {"features": feats, "feat_lengths": lens},
            extra_params=[params2],
        )
        assert np.isfinite(np.asarray(s2)).all()
        # ensembling with an identical copy == single model
        ens_same = SequenceGenerator(model, beam_size=2, max_len_b=8,
                                     max_target_positions=32,
                                     extra_models=[model])
        t3, s3, _ = ens_same.generate(
            params, {"features": feats, "feat_lengths": lens},
            extra_params=[params],
        )
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t3))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s3), atol=1e-4)


class TestInteractiveConstraints:
    def test_tab_separated_constraints_line(self, tmp_path):
        """fairseq_cli/interactive.py --constraints input format: the source
        line carries tab-separated constraint phrases."""
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from test_text_tasks import make_mt_corpus, mt_cfg

        from s2t_tpu.cli.interactive import encode_line
        from s2t_tpu.tasks import setup_task

        data = make_mt_corpus(tmp_path / "data")
        cfg = mt_cfg(data, tmp_path / "ckpt")
        cfg.generation.constraints = "unordered"
        task = setup_task(cfg)
        batch = encode_line(task, "aa bb cc\tAA BB\tCC")
        assert "constraints" in batch
        cons = np.asarray(batch["constraints"])
        assert cons.shape[0] == 1 and cons.shape[1] == 2  # two phrases
        assert cons[0, 0, 0] == task.tgt_dict.index("AA")
        assert cons[0, 0, 1] == task.tgt_dict.index("BB")
        assert cons[0, 1, 0] == task.tgt_dict.index("CC")
        # source tokens exclude the constraint part
        assert batch["src_tokens"].shape[1] == 4  # aa bb cc </s>

    def test_no_tab_no_constraints(self, tmp_path):
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from test_text_tasks import make_mt_corpus, mt_cfg

        from s2t_tpu.cli.interactive import encode_line
        from s2t_tpu.tasks import setup_task

        data = make_mt_corpus(tmp_path / "data")
        cfg = mt_cfg(data, tmp_path / "ckpt")
        cfg.generation.constraints = "unordered"
        task = setup_task(cfg)
        batch = encode_line(task, "aa bb cc")
        assert "constraints" not in batch


class TestConstrainedBeamOne:
    def test_beam_one_enforces_constraints(self):
        """K=1 degenerates to constrained greedy: the single beam must
        still contain the constraint token (review finding: the free pick
        previously displaced the progress candidate entirely)."""
        from s2t_tpu.inference.constrained import pack_constraints

        model, params, feats, lens = build()
        cons = pack_constraints([[[5]], [[7]]])
        gen = SequenceGenerator(model, beam_size=1, max_len_b=16,
                                max_target_positions=32,
                                constraints_mode="unordered")
        tokens, scores, _ = gen.generate(
            params,
            {"features": feats, "feat_lengths": lens,
             "constraints": jnp.asarray(cons)},
        )
        toks = np.asarray(tokens)
        assert 5 in toks[0, 0], toks[0, 0]
        assert 7 in toks[1, 0], toks[1, 0]
        assert np.isfinite(np.asarray(scores)[:, 0]).all()


class TestConstrainedNBestDistinct:
    def test_no_duplicate_finished_hypotheses(self):
        """An EOS candidate must enter the finished set once, not through
        both banks (review finding: duplicated n-best entries)."""
        from s2t_tpu.inference.constrained import pack_constraints

        model, params, feats, lens = build()
        cons = pack_constraints([[[5]], [[7]]])
        gen = SequenceGenerator(model, beam_size=4, max_len_b=10,
                                max_target_positions=32,
                                constraints_mode="unordered")
        tokens, scores, _ = gen.generate(
            params,
            {"features": feats, "feat_lengths": lens,
             "constraints": jnp.asarray(cons)},
        )
        toks = np.asarray(tokens)
        for b in range(B):
            hyps = {tuple(toks[b, k]) for k in range(4)}
            assert len(hyps) == 4, f"duplicate hypotheses at b={b}: {toks[b]}"


class TestConstrainedEdgeCases:
    def test_unsatisfiable_constraints_finalize_at_horizon(self):
        """A constraint set longer than the budget still yields an
        EOS-terminated best-effort hypothesis with a finite-ish score
        (the reference finalizes at max_len)."""
        from s2t_tpu.inference.constrained import pack_constraints

        model, params, feats, lens = build()
        # 10-token phrase with max_len 6: impossible to satisfy
        cons = pack_constraints([[list(range(4, 14))], [list(range(4, 14))]])
        gen = SequenceGenerator(model, beam_size=2, max_len_b=6,
                                max_target_positions=32,
                                constraints_mode="unordered")
        tokens, scores, _ = gen.generate(
            params,
            {"features": feats, "feat_lengths": lens,
             "constraints": jnp.asarray(cons)},
        )
        toks = np.asarray(tokens)
        for b in range(B):
            assert 2 in list(toks[b, 0]), toks[b, 0]  # EOS-terminated
        # scores are real hypothesis scores, not NEG_INF artifacts
        assert (np.asarray(scores)[:, 0] > -1e6).all(), np.asarray(scores)

    def test_static_cross_kv_generate_matches_default(self):
        """Beam-shared precomputed cross-KV (the default) must decode
        identically to per-step recompute."""
        model, params, feats, lens = build()
        g0 = SequenceGenerator(model, beam_size=2, max_len_b=8,
                               max_target_positions=32, static_cross_kv=False)
        g1 = SequenceGenerator(model, beam_size=2, max_len_b=8,
                               max_target_positions=32, static_cross_kv=True)
        t0, s0, _ = g0.generate(params, {"features": feats, "feat_lengths": lens})
        t1, s1, _ = g1.generate(params, {"features": feats, "feat_lengths": lens})
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-4)

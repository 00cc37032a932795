"""Inter-mixup tests (reference: s2t_transformer.py inter_mixup +
label_smoothed_cross_entropy_with_ctc mixup-aware loss)."""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.criterions.build import build_criterion
from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel

B, T, D, V = 4, 40, 80, 24


def build_model(**kw):
    cfg = S2TTransformerConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=2, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=1, decoder_attention_heads=2, vocab_size=V,
        subsampling_filter=64, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, max_target_positions=32,
        inter_mixup=True, inter_mixup_prob=1.0,
        **{"inter_mixup_ratio": 1.0, **kw},
    )
    model = S2TTransformerModel(cfg)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, D)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    prev = jnp.zeros((B, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens, prev)
    return model, params, feats, lens, prev


class TestMixup:
    def test_train_forward_emits_mixup_info(self):
        model, params, feats, lens, prev = build_model()
        out = model.apply(
            params, feats, lens, prev, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert out["mixup"] is not None
        mu = out["mixup"]
        assert mu["index1"].shape == (B,) and mu["index2"].shape == (B,)
        assert mu["coef"].shape == (B,)
        assert np.all((np.asarray(mu["coef"]) >= 0) & (np.asarray(mu["coef"]) <= 1))
        # reference layout: kept originals first, mixed rows last
        m = int(mu["keep_boundary"])
        flag = np.asarray(mu["flag"])
        assert not flag[: B - m].any() and flag[B - m :].all()
        # eval mode: no mixup
        out_eval = model.apply(params, feats, lens, prev, deterministic=True)
        assert out_eval["mixup"] is None

    def test_mixup_loss_combines_both_targets(self):
        model, params, feats, lens, prev = build_model()
        criterion = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"label_smoothing": 0.0, "ctc": {"ctc_weight": 0.5}},
        )
        rng = np.random.default_rng(2)
        targets = rng.integers(4, V, size=(B, 5)).astype(np.int32)
        targets[:, -1] = 2
        batch = {
            "target": jnp.asarray(targets),
            "transcript": jnp.asarray(targets[:, :-1]),
            "transcript_lengths": jnp.full((B,), 4, jnp.int32),
            "ntokens": float(B * 5),
        }
        out = model.apply(
            params, feats, lens, prev, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        loss, ss, logs = criterion(out, batch)
        assert np.isfinite(float(loss))
        assert float(logs["ctc_loss"]) > 0

    def test_mixup_at_inner_layer(self):
        model, params, feats, lens, prev = build_model(inter_mixup_layer=1)
        out = model.apply(
            params, feats, lens, prev, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(4)},
        )
        assert out["mixup"] is not None

    def test_mixup_consistency_loss(self):
        model, params, feats, lens, prev = build_model(inter_mixup_ratio=0.5)
        criterion = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"label_smoothing": 0.0,
             "ctc": {"ctc_weight": 0.5, "ctc_mixup_consistent_weight": 1.0}},
        )
        rng = np.random.default_rng(2)
        targets = rng.integers(4, V, size=(B, 5)).astype(np.int32)
        targets[:, -1] = 2
        batch = {
            "target": jnp.asarray(targets),
            "transcript": jnp.asarray(targets[:, :-1]),
            "transcript_lengths": jnp.full((B,), 4, jnp.int32),
            "ntokens": float(B * 5),
        }
        out = model.apply(
            params, feats, lens, prev, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        loss, ss, logs = criterion(out, batch)
        assert "ctc_mixup_consistent_loss" in logs
        assert np.isfinite(float(logs["ctc_mixup_consistent_loss"]))
        assert float(logs["ctc_mixup_consistent_loss"]) >= 0


class TestAXCTC:
    def test_axctc_head_and_loss(self):
        model, params, feats, lens, prev = None, None, None, None, None
        cfg = S2TTransformerConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, vocab_size=V, subsampling_filter=64,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            max_target_positions=32, use_axctc=True, inter_axctc_layers=(1,),
        )
        model = S2TTransformerModel(cfg)
        feats = jnp.asarray(
            np.random.default_rng(0).normal(size=(B, T, D)), jnp.float32
        )
        lens = jnp.full((B,), T, jnp.int32)
        prev = jnp.zeros((B, 5), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, lens, prev)
        out = model.apply(params, feats, lens, prev)
        assert out["axctc_logits"] is not None
        assert len(out["inter_axctc_logits"]) == 1

        criterion = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"label_smoothing": 0.0,
             "ctc": {"ctc_weight": 0.0, "axctc_weight": 0.5,
                     "inter_axctc_weight": 0.25}},
        )
        rng = np.random.default_rng(2)
        targets = rng.integers(4, V, size=(B, 5)).astype(np.int32)
        targets[:, -1] = 2
        aligned = rng.integers(4, V, size=(B, 6)).astype(np.int32)
        aligned[:, -1] = 2
        batch = {
            "target": jnp.asarray(targets),
            "aligned_target": jnp.asarray(aligned),
            "ntokens": float(B * 5),
        }
        loss, ss, logs = criterion(out, batch)
        assert float(logs["axctc_loss"]) > 0
        assert float(logs["inter_axctc_loss"]) > 0


class TestMLO:
    def test_inter_ctc_mlo_levels(self):
        """Each inter-CTC head scores its own transcript level
        (reference: criterions/ctc.py:578-586)."""
        cfg = S2TTransformerConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, vocab_size=V, subsampling_filter=64,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            max_target_positions=32, inter_ctc_layers=(1, 2),
            share_inter_ctc=True,
        )
        model = S2TTransformerModel(cfg)
        feats = jnp.asarray(
            np.random.default_rng(0).normal(size=(B, T, D)), jnp.float32
        )
        lens = jnp.full((B,), T, jnp.int32)
        prev = jnp.zeros((B, 5), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, lens, prev)
        out = model.apply(params, feats, lens, prev)

        criterion = build_criterion(
            "ctc",
            {"ctc_weight": 1.0, "inter_ctc_weight": 0.5,
             "inter_ctc_mlo": (0, 1)},
        )
        rng = np.random.default_rng(2)
        tr0 = rng.integers(4, V, size=(B, 4)).astype(np.int32)
        tr1 = rng.integers(4, V, size=(B, 3)).astype(np.int32)
        targets = rng.integers(4, V, size=(B, 5)).astype(np.int32)
        batch = {
            "target": jnp.asarray(targets),
            "transcript": jnp.asarray(tr0),
            "transcript_lengths": jnp.full((B,), 4, jnp.int32),
            "transcript0": jnp.asarray(tr0),
            "transcript0_lengths": jnp.full((B,), 4, jnp.int32),
            "transcript1": jnp.asarray(tr1),
            "transcript1_lengths": jnp.full((B,), 3, jnp.int32),
            "ntokens": float(B * 5),
        }
        loss, ss, logs = criterion(out, batch)
        assert float(logs["inter_ctc_loss"]) > 0
        assert np.isfinite(float(loss))

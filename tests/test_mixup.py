"""Inter-mixup tests (reference: s2t_transformer.py inter_mixup +
label_smoothed_cross_entropy_with_ctc mixup-aware loss)."""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.criterions.build import build_criterion
from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel

B, T, D, V = 4, 40, 80, 24


def build_model(**kw):
    cfg = S2TTransformerConfig(**{
        "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
        "encoder_layers": 2, "encoder_attention_heads": 2,
        "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
        "decoder_layers": 1, "decoder_attention_heads": 2, "vocab_size": V,
        "subsampling_filter": 64, "dropout": 0.0, "attention_dropout": 0.0,
        "activation_dropout": 0.0, "max_target_positions": 32,
        "inter_mixup": True, "inter_mixup_prob": 1.0,
        "inter_mixup_ratio": 1.0, **kw,
    })
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


def _st_batch(seed=2):
    rng = np.random.default_rng(seed)
    targets = rng.integers(4, V, size=(B, 5)).astype(np.int32)
    targets[:, -1] = 2
    return {
        "target": jnp.asarray(targets),
        "transcript": jnp.asarray(targets[:, :-1]),
        "transcript_lengths": jnp.full((B,), 4, jnp.int32),
        "ntokens": float(B * 5),
    }


class TestAIPAMixup:
    """Append-based interpolation augmentation (reference:
    s2t_transformer.py apply_mixup keep_org branch :1622-1630 +
    egs/mustc/st/conf/reproduction_aipa_kd.yaml)."""

    def test_keep_org_appends_rows(self):
        model, params, feats, lens, prev = build_model(
            inter_mixup_keep_org=True, inter_mixup_ratio=0.5
        )
        out = model.apply(
            params, feats, lens, prev, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        mu = out["mixup"]
        m = max(int(B * 0.5), 1)
        assert mu["index1"].shape == (B + m,)
        assert int(mu["keep_boundary"]) == 0
        flag = np.asarray(mu["flag"])
        assert not flag[:B].any() and flag[B:].all()
        # originals sit at their own index, untouched by coef
        assert np.all(np.asarray(mu["index1"][:B]) == np.arange(B))
        assert np.allclose(np.asarray(mu["coef"][:B]), 1.0)
        # encoder/decoder outputs carry the expanded batch
        assert out["encoder_out"].shape[0] == B + m
        assert out["decoder_logits"].shape[0] == B + m

    def test_keep_org_full_loss_pipeline(self):
        model, params, feats, lens, prev = build_model(
            inter_mixup_keep_org=True, inter_mixup_ratio=1.0
        )
        criterion = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"label_smoothing": 0.1, "mixup_consistent_weight": 0.5,
             "ctc": {"ctc_weight": 0.3, "ctc_mixup_consistent_weight": 0.15}},
        )
        out = model.apply(
            params, feats, lens, prev, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        loss, ss, logs = criterion(out, _st_batch())
        assert np.isfinite(float(loss))
        assert float(logs["mixup_consistent_loss"]) >= 0
        assert float(logs["ctc_mixup_consistent_loss"]) >= 0

    def test_ratio_decay_deactivates_rows(self):
        model, params, feats, lens, prev = build_model(
            inter_mixup_keep_org=True, inter_mixup_ratio=1.0,
            inter_mixup_ratio_decay=True,
            inter_mixup_ratio_decay_params=(10.0, 20.0, 0.0),
        )

        def weights_at(step):
            out = model.apply(
                params, feats, lens, prev, deterministic=False,
                num_updates=jnp.asarray(step, jnp.int32),
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return np.asarray(out["mixup"]["weight"])

        w_early, w_mid, w_late = weights_at(0), weights_at(15), weights_at(100)
        # before the decay window every appended row is live
        assert w_early[B:].sum() == B
        # halfway through, roughly half are live; at the end, none
        assert 0 < w_mid[B:].sum() < B
        assert w_late[B:].sum() == 0
        # originals always carry weight 1
        for w in (w_early, w_mid, w_late):
            assert np.all(w[:B] == 1.0)

    def test_dead_rows_carry_no_loss(self):
        """With the ratio fully decayed, the loss equals the no-mixup loss
        on the same (original) rows."""
        model, params, feats, lens, prev = build_model(
            inter_mixup_keep_org=True, inter_mixup_ratio=1.0,
            inter_mixup_ratio_decay=True,
            inter_mixup_ratio_decay_params=(0.0, 1.0, 0.0),
            inter_mixup_beta=0.5,
        )
        criterion = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"label_smoothing": 0.1, "ctc": {"ctc_weight": 0.3}},
        )
        batch = _st_batch()
        out = model.apply(
            params, feats, lens, prev, deterministic=False,
            num_updates=jnp.asarray(1000, jnp.int32),
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        loss_decayed, _, _ = criterion(out, batch)
        plain = build_model(
            inter_mixup=False
        )[0]  # same arch, mixup off
        out_plain = plain.apply(
            params, feats, lens, prev, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        loss_plain, _, _ = criterion(out_plain, batch)
        np.testing.assert_allclose(
            float(loss_decayed), float(loss_plain), rtol=1e-5
        )

    def test_cal_mixup_loss_false_skips_mixed_ce(self):
        model, params, feats, lens, prev = build_model(
            inter_mixup_keep_org=True, inter_mixup_ratio=1.0
        )
        batch = _st_batch()
        out = model.apply(
            params, feats, lens, prev, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        crit_on = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"label_smoothing": 0.0, "ctc": {"ctc_weight": 0.0}},
        )
        crit_off = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"label_smoothing": 0.0, "cal_mixup_loss": False,
             "ctc": {"ctc_weight": 0.0}},
        )
        ce_on = float(crit_on(out, batch)[2]["ce_loss"])
        ce_off = float(crit_off(out, batch)[2]["ce_loss"])
        assert ce_off < ce_on  # mixed rows contribute nothing

    def test_layer_out_norm(self):
        model, params, feats, lens, prev = build_model(
            inter_mixup=False, layer_out_norm=True, layer_out_norm_interval=1
        )
        names = jax.tree_util.tree_flatten_with_path(params)[0]
        joined = str([p for p, _ in names])
        assert "layer_out_norm0" in joined and "layer_out_norm1" in joined
        out = model.apply(params, feats, lens, prev)
        assert np.all(np.isfinite(np.asarray(out["encoder_out"], np.float32)))


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

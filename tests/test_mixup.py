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
        inter_mixup=True, inter_mixup_ratio=1.0, inter_mixup_prob=1.0, **kw,
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
        assert out["mixup"]["perm"].shape == (B,)
        assert 0.0 <= float(out["mixup"]["coef"]) <= 1.0
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

"""Module variants: local attention, reduced-KV attention, activation
checkpointing (remat), layerdrop.

(reference behaviours: modules/local_multihead_attention.py,
reduced_multihead_attention.py, checkpoint_activations.py, layer_drop.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel

B, T, D, V = 2, 48, 80, 20


def build(**kw):
    cfg = S2TTransformerConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=2, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=1, decoder_attention_heads=2, vocab_size=V,
        subsampling_filter=32, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, max_target_positions=32, **kw,
    )
    model = S2TTransformerModel(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lens = jnp.asarray([T, T - 10], jnp.int32)
    prev = jnp.asarray([[2, 5, 6], [2, 7, 8]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens, prev)["params"]
    return model, params, feats, lens, prev


class TestLocalAttention:
    def test_window_changes_receptive_field(self):
        m_full, p, feats, lens, prev = build()
        m_loc = S2TTransformerModel(m_full.cfg.replace(encoder_attention_window=1))
        out_full = m_full.apply({"params": p}, feats, lens, prev)
        out_loc = m_loc.apply({"params": p}, feats, lens, prev)
        # same params, different masking -> different outputs, both finite
        assert np.isfinite(np.asarray(out_loc["encoder_out"])).all()
        assert not np.allclose(
            np.asarray(out_full["encoder_out"]), np.asarray(out_loc["encoder_out"])
        )

    def test_huge_window_equals_global(self):
        m_full, p, feats, lens, prev = build()
        m_loc = S2TTransformerModel(
            m_full.cfg.replace(encoder_attention_window=10_000)
        )
        a = m_full.apply({"params": p}, feats, lens, prev)
        b = m_loc.apply({"params": p}, feats, lens, prev)
        np.testing.assert_allclose(
            np.asarray(a["encoder_out"]), np.asarray(b["encoder_out"]), atol=1e-6
        )


class TestReducedAttention:
    def test_stride_runs_and_differs(self):
        m_full, p, feats, lens, prev = build()
        m_red = S2TTransformerModel(m_full.cfg.replace(encoder_attention_stride=2))
        out = m_red.apply({"params": p}, feats, lens, prev)
        assert out["encoder_out"].shape == (
            m_full.apply({"params": p}, feats, lens, prev)["encoder_out"].shape
        )
        assert np.isfinite(np.asarray(out["encoder_out"])).all()


class TestRemat:
    def test_checkpoint_activations_same_loss_and_grads(self):
        m_plain, p, feats, lens, prev = build()
        m_ckpt = S2TTransformerModel(m_plain.cfg.replace(checkpoint_activations=True))
        p_ckpt = m_ckpt.init(jax.random.PRNGKey(0), feats, lens, prev)["params"]

        def loss(model, params):
            out = model.apply({"params": params}, feats, lens, prev)
            return jnp.sum(out["decoder_logits"].astype(jnp.float32) ** 2)

        l1, g1 = jax.value_and_grad(lambda q: loss(m_plain, q))(p)
        l2, g2 = jax.value_and_grad(lambda q: loss(m_ckpt, q))(p)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestRematWithDropout:
    def test_checkpoint_activations_trains_with_dropout(self):
        """remat must work in the regime it exists for: training with
        dropout > 0 (regression: static_argnums previously marked the
        traced pos_emb static instead of the deterministic flag)."""
        model, _, feats, lens, prev = build()
        m = S2TTransformerModel(model.cfg.replace(
            checkpoint_activations=True, dropout=0.1, attention_dropout=0.1,
            encoder_attention_type="rel_pos",
        ))
        p = m.init(jax.random.PRNGKey(0), feats, lens, prev)["params"]

        def loss(p):
            o = m.apply({"params": p}, feats, lens, prev, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean(o["decoder_logits"].astype(jnp.float32) ** 2)

        g = jax.grad(loss)(p)
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


class TestLayerDrop:
    def test_layerdrop_trains_and_evals_clean(self):
        model, p, feats, lens, prev = build(encoder_layerdrop=0.5)
        out_train = model.apply(
            {"params": p}, feats, lens, prev, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        out_eval = model.apply({"params": p}, feats, lens, prev)
        assert np.isfinite(np.asarray(out_train["decoder_logits"])).all()
        # eval ignores layerdrop: deterministic path
        out_eval2 = model.apply({"params": p}, feats, lens, prev)
        np.testing.assert_array_equal(
            np.asarray(out_eval["decoder_logits"]),
            np.asarray(out_eval2["decoder_logits"]),
        )


class TestDynamicConvEncoder:
    """s2t_dynamic_transformer: conv layers replace encoder self-attention
    (reference: models/speech_to_text/s2t_dynamic_transformer.py:38)."""

    def test_forward_and_grads(self):
        for att in ("dynamic", "light"):
            model, params, feats, lens, prev = build(
                encoder_attention_type=att,
                encoder_lconv_kernels=(3, 7),
            )
            out = model.apply({"params": params}, feats, lens, prev)
            assert np.isfinite(np.asarray(out["decoder_logits"])).all()

            def loss(p):
                o = model.apply({"params": p}, feats, lens, prev)
                return jnp.mean(o["decoder_logits"].astype(jnp.float32) ** 2)

            g = jax.grad(loss)(params)
            assert all(
                np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g)
            )

    def test_registry_preset(self):
        from s2t_tpu.models.build import build_model

        m = build_model(
            "s2t_dynamic_transformer_s",
            {"encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
             "encoder_layers": 2, "encoder_attention_heads": 2,
             "decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
             "decoder_layers": 1, "decoder_attention_heads": 2,
             "subsampling_filter": 32, "dropout": 0.0},
            vocab_size=V,
        )
        assert m.cfg.encoder_attention_type == "dynamic"
        feats = jnp.ones((B, T, D))
        lens = jnp.asarray([T, T], jnp.int32)
        prev = jnp.zeros((B, 3), jnp.int32)
        p = m.init(jax.random.PRNGKey(0), feats, lens, prev)
        out = m.apply(p, feats, lens, prev)
        assert out["decoder_logits"].shape[-1] == V


class TestSqueezeExcitation:
    def test_se_gate_changes_output_and_trains(self):
        """--squeeze-excitation channel gate (reference:
        modules/squeeze_excitation.py, transformer_layer.py:77-79)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from s2t_tpu.models.transformer import (
            TransformerMTConfig, TransformerModel,
        )

        base = TransformerMTConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, dropout=0.0, vocab_size=V,
        )
        src = jnp.asarray([[4, 5, 6, 7]], jnp.int32)
        lens = jnp.asarray([4], jnp.int32)
        prev = jnp.asarray([[2, 4, 5]], jnp.int32)
        m_se = TransformerModel(base.replace(squeeze_excitation=True))
        p = m_se.init(jax.random.PRNGKey(0), src, lens, prev)["params"]
        assert "se_fc1" in p["encoder"]["layer0"]
        out = m_se.apply({"params": p}, src, lens, prev)
        assert np.isfinite(np.asarray(out["decoder_logits"])).all()

        def loss(p):
            o = m_se.apply({"params": p}, src, lens, prev)
            return jnp.mean(o["decoder_logits"].astype(jnp.float32) ** 2)

        g = jax.grad(loss)(p)
        se_g = g["encoder"]["layer0"]["se_fc1"]["kernel"]
        assert np.abs(np.asarray(se_g)).sum() > 0  # gate receives gradient


class TestQuantNoise:
    """iPQ quantization-noise training (reference: modules/quant_noise.py,
    --quant-noise-pq)."""

    def test_zero_p_is_identity(self):
        from s2t_tpu.modules.quant_noise import quant_noise_params

        params = {"layer": {"kernel": jnp.ones((16, 4)), "bias": jnp.ones((4,))}}
        out = quant_noise_params(params, jax.random.PRNGKey(0), 0.0, 4)
        assert out is params

    def test_block_structure_and_scaling(self):
        from s2t_tpu.modules.quant_noise import quant_noise_params

        kernel = jnp.ones((32, 8))
        params = {"m": {"kernel": kernel, "bias": jnp.ones((8,)),
                        "scale": jnp.ones((8,))}}
        out = quant_noise_params(params, jax.random.PRNGKey(1), 0.5, 4)
        k = np.asarray(out["m"]["kernel"])
        # bias / norm scale untouched
        np.testing.assert_array_equal(np.asarray(out["m"]["bias"]), 1.0)
        np.testing.assert_array_equal(np.asarray(out["m"]["scale"]), 1.0)
        # every value is either dropped (0) or rescaled by 1/(1-p) = 2
        assert set(np.unique(k)).issubset({0.0, 2.0})
        # mask is constant within each block_size-row block per column
        blocks = k.reshape(8, 4, 8)
        assert (blocks == blocks[:, :1, :]).all()
        # roughly p of the blocks dropped
        drop_frac = (blocks[:, 0, :] == 0).mean()
        assert 0.2 < drop_frac < 0.8

    def test_embedding_blocked_along_dim(self):
        from s2t_tpu.modules.quant_noise import quant_noise_params

        params = {"embed_tokens": {"embedding": jnp.ones((10, 16))}}
        out = quant_noise_params(params, jax.random.PRNGKey(2), 0.5, 4)
        e = np.asarray(out["embed_tokens"]["embedding"])
        blocks = e.reshape(10, 4, 4)
        assert (blocks == blocks[:, :, :1]).all()
        assert set(np.unique(e)).issubset({0.0, 2.0})

    def test_trainer_integration(self):
        """quant_noise_p > 0 trains (loss decreases) and perturbs the loss
        relative to the noise-free forward."""
        from s2t_tpu.config import OptimizationConfig
        from s2t_tpu.criterions import build_criterion
        from s2t_tpu.trainer import Trainer

        model, params, feats, lens, prev = build()
        crit = build_criterion(
            "label_smoothed_cross_entropy_with_ctc", {"ctc": {"ctc_weight": 0.3}}
        )
        tgt = jnp.asarray([[5, 6, 2], [7, 8, 2]], jnp.int32)
        B, U = tgt.shape
        batch = {
            "features": feats, "feat_lengths": lens, "prev_tokens": prev,
            "target": tgt, "transcript": tgt[:, :-1],
            "transcript_lengths": jnp.full((B,), U - 1, jnp.int32),
            "ntokens": float(B * U),
        }
        import jax as _jax
        from s2t_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(devices=_jax.devices()[:1])
        tr = Trainer(model, crit, OptimizationConfig(
            lr=1e-3, warmup_updates=10, clip_norm=5.0, quant_noise_p=0.2,
            quant_noise_block_size=8,
        ), mesh=mesh)
        state = tr.init_state(batch)
        l0 = None
        for i in range(15):
            state, m = tr.train_step(state, batch)
            if i == 0:
                l0 = float(m["loss"])
        assert float(m["loss"]) < l0
        assert np.isfinite(float(m["loss"]))


class TestElidedBiasMasking:
    """A None bias with a valid_mask must mask padding for EVERY attention
    variant — Shaw-relative and strided-KV ran unmasked when the encoder
    started eliding pure-padding biases (code-review r3 regression)."""

    def test_relative_and_strided_match_explicit_bias(self):
        from s2t_tpu.modules.attention import MultiHeadAttention, padding_bias

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 12, 16)), jnp.float32)
        valid = jnp.asarray(np.arange(12)[None] < np.array([[12], [6]]))
        for kw in (dict(attention_type="relative", max_relative_length=4),
                   dict(kv_stride=2)):
            m = MultiHeadAttention(16, 2, 0.0, **kw)
            p = m.init(jax.random.PRNGKey(0), x, x, x, None, True,
                       valid_mask=valid)
            o_none = m.apply(p, x, x, x, None, True, valid_mask=valid)[0]
            o_mask = m.apply(p, x, x, x, padding_bias(valid, x.dtype), True,
                             valid_mask=valid)[0]
            np.testing.assert_allclose(
                np.asarray(o_none[1, :6]), np.asarray(o_mask[1, :6]),
                atol=1e-6, err_msg=str(kw),
            )

"""Model tests: shapes, masking invariance, incremental-decode parity.

Mirrors the reference's encoder/decoder output-contract checks
(reference: tests/speech_recognition/asr_test_base.py:134-227) plus the gap
the reference never tested: inter-CTC/PAE forward and cache-step equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.models.build import build_model
from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel
from s2t_tpu.utils.masking import lengths_to_mask

B, T, D_FEAT, V = 2, 40, 80, 30


def tiny_cfg(**kw):
    base = dict(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=2, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=2, decoder_attention_heads=2, vocab_size=V,
        subsampling_filter=64, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, max_target_positions=64,
    )
    base.update(kw)
    return S2TTransformerConfig(**base)


def init_model(cfg, seed=0):
    model = S2TTransformerModel(cfg)
    feats = jnp.zeros((B, T, D_FEAT))
    lens = jnp.asarray([T, T // 2])
    prev = jnp.zeros((B, 5), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), feats, lens, prev)
    return model, params


class TestForward:
    def test_shapes(self):
        cfg = tiny_cfg()
        model, params = init_model(cfg)
        feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, D_FEAT)), jnp.float32)
        lens = jnp.asarray([T, T // 2])
        prev = jnp.asarray(np.random.default_rng(1).integers(4, V, size=(B, 7)), jnp.int32)
        out = model.apply(params, feats, lens, prev)
        T_sub = (T - 1) // 2 + 1
        T_sub = (T_sub - 1) // 2 + 1
        assert out["decoder_logits"].shape == (B, 7, V)
        assert out["encoder_out"].shape == (B, T_sub, 32)
        assert out["ctc_logits"].shape == (B, T_sub, V)
        np.testing.assert_array_equal(
            np.asarray(out["encoder_lengths"]), [T_sub, (((T // 2 - 1) // 2 + 1) - 1) // 2 + 1]
        )

    def test_padding_invariance(self):
        """Outputs at valid positions must not depend on padding amount."""
        cfg = tiny_cfg()
        model, params = init_model(cfg)
        rng = np.random.default_rng(2)
        feats_short = jnp.asarray(rng.normal(size=(1, 24, D_FEAT)), jnp.float32)
        feats_long = jnp.pad(feats_short, ((0, 0), (0, 16), (0, 0)))
        lens = jnp.asarray([24])
        prev = jnp.asarray([[0, 5, 6]], jnp.int32)
        out_s = model.apply(params, feats_short, lens, prev)
        out_l = model.apply(params, feats_long, lens, prev)
        L = int(out_s["encoder_lengths"][0])
        np.testing.assert_allclose(
            np.asarray(out_s["encoder_out"])[0, :L],
            np.asarray(out_l["encoder_out"])[0, :L],
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_s["decoder_logits"])[0],
            np.asarray(out_l["decoder_logits"])[0],
            atol=1e-4,
        )

    def test_inter_ctc_and_pae(self):
        cfg = tiny_cfg(inter_ctc_layers=(1,), ctc_pae="inter_league")
        model, params = init_model(cfg)
        feats = jnp.ones((B, T, D_FEAT))
        out = model.apply(params, feats, jnp.asarray([T, T]), jnp.zeros((B, 3), jnp.int32))
        assert len(out["inter_ctc_logits"]) == 1
        layer_idx, logits = out["inter_ctc_logits"][0]
        assert layer_idx == 1 and logits.shape[-1] == V

    def test_conformer_variant(self):
        cfg = tiny_cfg(
            encoder_attention_type="rel_pos", macaron_style=True, use_cnn_module=True,
            cnn_module_kernel=7, activation_fn="swish",
        )
        model, params = init_model(cfg)
        feats = jnp.ones((B, T, D_FEAT))
        out = model.apply(params, feats, jnp.asarray([T, T // 2]), jnp.zeros((B, 3), jnp.int32))
        assert np.all(np.isfinite(np.asarray(out["decoder_logits"])))

    def test_rope_variant(self):
        cfg = tiny_cfg(encoder_attention_type="rope")
        model, params = init_model(cfg)
        feats = jnp.ones((B, T, D_FEAT))
        out = model.apply(params, feats, jnp.asarray([T, T]), jnp.zeros((B, 3), jnp.int32))
        assert np.all(np.isfinite(np.asarray(out["decoder_logits"])))


class TestIncrementalDecode:
    def test_step_matches_full_forward(self):
        cfg = tiny_cfg()
        model, params = init_model(cfg)
        rng = np.random.default_rng(3)
        feats = jnp.asarray(rng.normal(size=(B, T, D_FEAT)), jnp.float32)
        lens = jnp.asarray([T, T - 8])
        U = 6
        tokens = jnp.asarray(rng.integers(4, V, size=(B, U)), jnp.int32)

        enc = model.apply(params, feats, lens, method=model.encode)
        enc_mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        full_logits = model.apply(
            params, tokens, enc["encoder_out"], enc_mask, method=model.decode
        )

        cache = model.apply(params, B, U, method=model.init_cache)
        step_logits = []
        for u in range(U):
            logits, cache = model.apply(
                params,
                tokens[:, u : u + 1],
                cache,
                jnp.asarray(u, jnp.int32),
                enc["encoder_out"],
                enc_mask,
                method=model.decode_step,
            )
            step_logits.append(logits)
        step_logits = jnp.stack(step_logits, axis=1)
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full_logits), atol=1e-4
        )


class TestRelShift:
    def test_rel_shift_matches_gather(self):
        from s2t_tpu.modules.attention import RelPositionMultiHeadAttention

        rng = np.random.default_rng(4)
        Tq = 5
        x = jnp.asarray(rng.normal(size=(1, 1, Tq, 2 * Tq - 1)), jnp.float32)
        shifted = RelPositionMultiHeadAttention._rel_shift(x)
        # table index l corresponds to relative position r = T-1-l
        # expected[i, j] should be table entry for r = i - j? ESPnet convention:
        # out[i, j] = x[i, (T-1) - (i - j)] = x[i, T-1-i+j]
        expect = np.zeros((Tq, Tq), np.float32)
        for i in range(Tq):
            for j in range(Tq):
                expect[i, j] = np.asarray(x)[0, 0, i, Tq - 1 - i + j]
        np.testing.assert_allclose(np.asarray(shifted)[0, 0], expect, atol=1e-6)


class TestBuildRegistry:
    def test_build_from_arch(self):
        m = build_model("s2t_transformer_s", {"encoder_layers": 2}, vocab_size=50)
        assert m.cfg.encoder_layers == 2
        assert m.cfg.vocab_size == 50
        assert m.cfg.encoder_embed_dim == 256

    def test_unknown_key(self):
        with pytest.raises(ValueError, match="unknown model config"):
            build_model("s2t_transformer_s", {"bogus_key": 1})


class TestShawRelativeAttention:
    """attention_type="relative" — Shaw clipped relative-key attention
    (reference: modules/relative_multihead_attention.py, preset
    s2t_transformer_s_relative)."""

    def test_relative_variant_forward(self):
        cfg = tiny_cfg(encoder_attention_type="relative",
                       max_encoder_relative_length=5,
                       max_decoder_relative_length=3)
        model, params = init_model(cfg)
        # the Shaw table exists in encoder and decoder self-attention
        flat = jax.tree_util.tree_leaves_with_path(params)
        paths = ["/".join(str(k.key) for k in p) for p, _ in flat]
        assert any("relative_position_keys" in p and "encoder" in p for p in paths)
        assert any("relative_position_keys" in p and "decoder" in p for p in paths)
        feats = jnp.asarray(
            np.random.default_rng(0).normal(size=(B, T, D_FEAT)), jnp.float32
        )
        prev = jnp.zeros((B, 3), jnp.int32)
        out = model.apply(params, feats, jnp.asarray([T, T]), prev)
        assert np.all(np.isfinite(np.asarray(out["decoder_logits"])))
        # relative term changes the output vs zeroing the table
        import flax
        zeroed = flax.traverse_util.flatten_dict(params)
        zeroed = {
            k: (jnp.zeros_like(v) if "relative_position_keys" in k else v)
            for k, v in zeroed.items()
        }
        zeroed = flax.traverse_util.unflatten_dict(zeroed)
        out0 = model.apply(zeroed, feats, jnp.asarray([T, T]), prev)
        assert not np.allclose(
            np.asarray(out["decoder_logits"]), np.asarray(out0["decoder_logits"])
        )

    def test_relative_incremental_matches_full(self):
        """Cache-mode distance computation must reproduce the teacher-forced
        relative self-attention exactly."""
        cfg = tiny_cfg(max_decoder_relative_length=3)
        model, params = init_model(cfg)
        rng = np.random.default_rng(5)
        feats = jnp.asarray(rng.normal(size=(B, T, D_FEAT)), jnp.float32)
        lens = jnp.asarray([T, T - 8])
        U = 6
        tokens = jnp.asarray(rng.integers(4, V, size=(B, U)), jnp.int32)

        enc = model.apply(params, feats, lens, method=model.encode)
        enc_mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        full_logits = model.apply(
            params, tokens, enc["encoder_out"], enc_mask, method=model.decode
        )
        cache = model.apply(params, B, U, method=model.init_cache)
        step_logits = []
        for u in range(U):
            logits, cache = model.apply(
                params, tokens[:, u : u + 1], cache, jnp.asarray(u, jnp.int32),
                enc["encoder_out"], enc_mask, method=model.decode_step,
            )
            step_logits.append(logits)
        np.testing.assert_allclose(
            np.asarray(jnp.stack(step_logits, axis=1)),
            np.asarray(full_logits), atol=1e-4,
        )


class TestCTCCompression:
    """CTC-blank sequence compression at inter-CTC layers (reference:
    s2t_transformer.py:1948-2040, --compression-layers)."""

    def _cfg(self, **kw):
        kw.setdefault("compression_threshold", 0.95)
        return tiny_cfg(
            inter_ctc_layers=(1,), compression_layers=(1,), **kw,
        )

    def test_lengths_shrink_and_pack(self):
        """With a biased CTC head (high blank logit on some frames) the
        valid length shrinks by exactly the dropped-frame count."""
        cfg = self._cfg(compression_threshold=0.5)
        model, params = init_model(cfg)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(B, T, D_FEAT)), jnp.float32)
        lens = jnp.asarray([T, T // 2])
        # push the shared CTC head's blank bias up so ~all frames are blank;
        # the never-empty guard must still leave one frame
        import flax

        p = flax.traverse_util.flatten_dict(params["params"])
        for k in list(p):
            if "ctc_head" in "/".join(k) and k[-1] == "bias":
                p[k] = p[k].at[0].set(50.0)
        biased = {"params": flax.traverse_util.unflatten_dict(p)}
        enc = model.apply(biased, feats, lens, method=model.encode)
        out_len = np.asarray(enc["encoder_lengths"])
        np.testing.assert_array_equal(out_len, [1, 1])
        assert np.isfinite(np.asarray(enc["encoder_out"])).all()

    def test_aggressive_threshold_compresses(self):
        """With an untrained CTC head, threshold 1.0 keeps everything and a
        sub-uniform threshold drops frames."""
        model_hi, params = init_model(self._cfg(compression_threshold=1.1))
        model_lo = S2TTransformerModel(
            model_hi.cfg.replace(compression_threshold=1.0 / V * 0.5)
        )
        rng = np.random.default_rng(1)
        feats = jnp.asarray(rng.normal(size=(B, T, D_FEAT)), jnp.float32)
        lens = jnp.asarray([T, T])
        hi = model_hi.apply(params, feats, lens, method=model_hi.encode)
        lo = model_lo.apply(params, feats, lens, method=model_lo.encode)
        hi_len = np.asarray(hi["encoder_lengths"])
        lo_len = np.asarray(lo["encoder_lengths"])
        T_sub = hi["encoder_out"].shape[1]
        np.testing.assert_array_equal(hi_len, [T_sub, T_sub])  # keeps all
        assert (lo_len >= 1).all()
        # the never-empty guard holds even when everything is "blank"
        assert (lo_len <= hi_len).all()

    def test_trains_with_compression(self):
        cfg = self._cfg(compression_norm=True, compression_pos=True)
        model, params = init_model(cfg)
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.normal(size=(B, T, D_FEAT)), jnp.float32)
        lens = jnp.asarray([T, T - 6])
        prev = jnp.asarray(rng.integers(4, V, size=(B, 5)), jnp.int32)
        assert "compression_norm1" in params["params"]["encoder"]

        def loss(p):
            out = model.apply(
                p, feats, lens, prev, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return jnp.mean(out["decoder_logits"].astype(jnp.float32) ** 2)

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


class TestCompressionValidation:
    def test_compression_requires_inter_ctc_layer(self):
        """compression_layers without a matching inter_ctc_layer (the logit
        source) must fail loudly, not silently no-op (review finding)."""
        cfg = tiny_cfg(compression_layers=(1,))  # no inter_ctc_layers
        model = S2TTransformerModel(cfg)
        with pytest.raises(ValueError, match="compression_layers"):
            model.init(
                jax.random.PRNGKey(0), jnp.zeros((B, T, D_FEAT)),
                jnp.asarray([T, T]), jnp.zeros((B, 3), jnp.int32),
            )

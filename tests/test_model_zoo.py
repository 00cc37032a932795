"""Model zoo tests: PDS, SATE, s2t_ctc, XCTC/BiL-CTC paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.models.build import build_model

B, T, D = 2, 64, 80
V = 40


def run_fwd(model, U=5, feats=None):
    feats = feats if feats is not None else jnp.asarray(
        np.random.default_rng(0).normal(size=(B, T, D)), jnp.float32
    )
    lens = jnp.asarray([T, T - 20])
    prev = jnp.zeros((B, U), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens, prev)
    return model.apply(params, feats, lens, prev), params


TINY = {
    "dropout": 0.0, "attention_dropout": 0.0, "activation_dropout": 0.0,
}


class TestPDS:
    def test_forward_shapes_16x(self):
        model = build_model(
            "pdss2t_transformer_s_16",
            {
                **TINY,
                "pds_embed_dims": [16, 16, 16, 16],
                "pds_ffn_ratios": [2, 2, 2, 2],
                "pds_attn_heads": [2, 2, 2, 2],
                "pds_layers": [1, 1, 1, 1],
                "decoder_layers": 1, "decoder_ffn_embed_dim": 32,
            },
            vocab_size=V,
        )
        out, _ = run_fwd(model)
        # total downsampling 16x
        assert out["encoder_out"].shape[1] == T // 16 + (1 if T % 16 else 0) or True
        exp_len = T
        for _ in range(4):
            exp_len = (exp_len - 1) // 2 + 1
        assert out["encoder_out"].shape[1] == exp_len
        assert out["ctc_logits"].shape[-1] == V
        assert out["decoder_logits"].shape == (B, 5, V)

    def test_per_stage_ctc_and_fusion(self):
        model = build_model(
            "pdss2t_transformer_s_8",
            {
                **TINY,
                "pds_embed_dims": [16, 16, 16, 16],
                "pds_ffn_ratios": [2, 2, 2, 2],
                "pds_attn_heads": [2, 2, 2, 2],
                "pds_layers": [1, 1, 1, 1],
                "pds_ctc": [0, 1, 1, 0],
                "ctc_pae": "inter_league",
                "pds_fusion": True,
                "decoder_layers": 1, "decoder_ffn_embed_dim": 32,
            },
            vocab_size=V,
        )
        out, _ = run_fwd(model)
        assert len(out["inter_ctc_logits"]) == 2
        assert np.all(np.isfinite(np.asarray(out["decoder_logits"])))


class TestSATE:
    def test_forward_league(self):
        model = build_model(
            "s2t_sate_s",
            {
                "acoustic_encoder_embed_dim": 32,
                "acoustic_encoder_ffn_embed_dim": 64,
                "acoustic_encoder_layers": 2,
                "acoustic_encoder_attention_heads": 2,
                "acoustic_decoder_embed_dim": 32,
                "acoustic_decoder_ffn_embed_dim": 64,
                "acoustic_decoder_layers": 1,
                "acoustic_decoder_attention_heads": 2,
                "acoustic_subsampling_filter": 32,
                "acoustic_dropout": 0.0,
                "adapter_type": "league",
                "text_encoder_layers": 2,
                "text_attention_heads": 2,
                "text_ffn_embed_dim": 64,
                "text_use_xctc": True,
            },
            vocab_size=V,
        )
        out, params = run_fwd(model)
        assert out["xctc_logits"] is not None
        assert out["xctc_logits"].shape[-1] == V
        assert out["decoder_logits"].shape == (B, 5, V)
        # param tree has acoustic / textual / adapter components for transplant
        enc = params["params"]["encoder"]
        assert "acoustic" in enc and "textual" in enc and "adapter" in enc

    def test_forward_shrink(self):
        model = build_model(
            "s2t_sate_s",
            {
                "acoustic_encoder_embed_dim": 32,
                "acoustic_encoder_ffn_embed_dim": 64,
                "acoustic_encoder_layers": 2,
                "acoustic_encoder_attention_heads": 2,
                "acoustic_decoder_layers": 1,
                "acoustic_decoder_embed_dim": 32,
                "acoustic_decoder_ffn_embed_dim": 64,
                "acoustic_decoder_attention_heads": 2,
                "acoustic_subsampling_filter": 32,
                "acoustic_dropout": 0.0,
                "adapter_type": "shrink",
                "text_encoder_layers": 1,
                "text_attention_heads": 2,
                "text_ffn_embed_dim": 64,
            },
            vocab_size=V,
        )
        out, _ = run_fwd(model)
        # shrink keeps static T but reduces valid lengths
        assert np.all(
            np.asarray(out["encoder_lengths"]) <= out["encoder_out"].shape[1]
        )
        assert np.all(np.isfinite(np.asarray(out["decoder_logits"])))


class TestS2TCTC:
    def test_encoder_only_with_xctc(self):
        model = build_model(
            "s2t_nast",
            {
                **TINY,
                "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
                "encoder_layers": 4, "encoder_attention_heads": 2,
                "inter_ctc_layers": [2], "inter_xctc_layers": [3],
                "xctc_pae": "inter_league",
                "subsampling_filter": 32,
            },
            vocab_size=V, src_vocab_size=V,
        )
        feats = jnp.ones((B, T, D))
        lens = jnp.asarray([T, T])
        params = model.init(jax.random.PRNGKey(0), feats, lens)
        out = model.apply(params, feats, lens)
        assert out["decoder_logits"] is None
        assert out["ctc_logits"] is not None
        assert out["xctc_logits"] is not None
        assert len(out["inter_ctc_logits"]) == 1
        assert len(out["inter_xctc_logits"]) == 1

    def test_ctc_decode_from_encoder_only(self):
        from s2t_tpu.inference.ctc_decoder import CTCDecoder

        model = build_model(
            "s2t_ctc",
            {**TINY, "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 64,
             "encoder_layers": 2, "encoder_attention_heads": 2,
             "subsampling_filter": 32},
            vocab_size=V,
        )
        feats = jnp.ones((B, T, D))
        lens = jnp.asarray([T, T // 2])
        params = model.init(jax.random.PRNGKey(0), feats, lens)
        enc = model.apply(params, feats, lens, method=model.encode)
        toks, out_lens = CTCDecoder().decode(enc)
        assert toks.shape[0] == B

"""Dual-stream speech+text model (s2t_dual), reference-faithful.

(reference: fairseq/models/speech_to_text/s2t_dual.py:36 — an ASR speech
encoder and an MT text encoder over the transcript; the MT encoder's layers
cross-attend the speech representation through the "league" collaboration
(modules/transformer_s2_layer.py: parallel = self-attn·r1 + s2-attn·r2
combined before the residual), and a transformer decoder attends the text
stream.  Upstream NOTE: the reference's own composition is bit-rotted — its
S2TDualEncoder.forward (s2t_dual.py:334) passes the speech tensor into
``return_all_hiddens`` and the padding mask into ``token_embeddings``, so the
model crashes on any forward; the evidently intended wiring is the
``set_s2`` hook (transformer_s2.py:70).  This implementation follows that
repaired semantics, and tests/test_fairseq_parity.py pins both facts: the
upstream crash, and numerical parity against the set_s2-repaired reference.

Training consumes (features, transcript, prev_tokens); at inference the text
stream defaults to the CTC greedy transcript of the speech encoder, so the
model still decodes from audio alone (a capability the reference never had —
its generator requires transcripts).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.models.s2t_transformer import (
    S2TTransformerConfig,
    S2TTransformerEncoder,
    s2t_transformer_s,
)
from s2t_tpu.models.transformer import TransformerMTConfig
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.modules.attention import padding_bias
from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.modules.positional import fairseq_sinusoidal_encoding
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class S2TDualConfig:
    speech: S2TTransformerConfig = dataclasses.field(
        default_factory=S2TTransformerConfig
    )
    text: TransformerMTConfig = dataclasses.field(default_factory=TransformerMTConfig)
    # league collaboration (reference: --encoder/decoder-collaboration-mode,
    # --*-league-s{1,2}-ratio; egs/mustc/st/conf/dual.yaml uses parallel 0.5/0.5)
    encoder_collaboration_mode: str = "parallel"
    decoder_collaboration_mode: str = "parallel"
    encoder_league_s1_ratio: float = 0.5
    encoder_league_s2_ratio: float = 0.5
    decoder_league_s1_ratio: float = 0.5
    decoder_league_s2_ratio: float = 0.5
    # feed the speech stream to the decoder league as s2.  The reference
    # constructs the decoder's s2_encoder_attn but its encoder never emits
    # "s2_encoder_out", so the branch never fires (transformer_s2.py:330-335,
    # s2t_dual.py:344-348 commented out) — False reproduces that; True is
    # this framework's extension (decoder attends BOTH streams).
    decoder_attend_speech: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    # the task's forward adapter threads batch["transcript"] into the model
    consumes_transcript: bool = True

    @property
    def vocab_size(self):
        return self.speech.vocab_size

    @property
    def decoder_layers(self):
        return self.speech.decoder_layers

    @property
    def max_target_positions(self):
        return self.speech.max_target_positions

    @property
    def subsampling_layers(self):
        return self.speech.subsampling_layers

    @property
    def subsampling_stride(self):
        return self.speech.subsampling_stride

    @property
    def dtype(self):
        return self.speech.dtype


class DualTextEncoder(nn.Module):
    """MT text encoder whose layers league-attend the speech stream
    (reference: TransformerS2Encoder, models/transformer_s2.py:45 with
    TransformerS2EncoderLayer; s2 norm is constructed upstream but never
    applied on this path — forward_scriptable:178 passes no s2_need_norm)."""

    cfg: S2TDualConfig

    @nn.compact
    def __call__(self, src_tokens, src_lengths, speech_out, speech_bias,
                 deterministic: bool = True):
        tc, dc = self.cfg.text, self.cfg
        dt = tc.dtype
        x = nn.Embed(
            tc.src_vocab, tc.encoder_embed_dim,
            embedding_init=nn.initializers.normal(tc.encoder_embed_dim**-0.5),
            dtype=dt, name="embed_tokens",
        )(src_tokens)
        if not tc.no_scale_embedding:
            x = x * jnp.sqrt(tc.encoder_embed_dim).astype(x.dtype)
        T = x.shape[1]
        x = x + fairseq_sinusoidal_encoding(
            T, tc.encoder_embed_dim, tc.pad_id, x.dtype
        )[None]
        if tc.layernorm_embedding:
            x = nn.LayerNorm(dtype=dt, name="emb_norm")(x)
        x = _FastDropout(tc.dropout)(x, deterministic=deterministic)
        valid = src_tokens != tc.pad_id
        # fairseq zeroes pad embeddings before the stack
        # (transformer.py forward_scriptable "account for padding")
        x = jnp.where(valid[..., None], x, 0.0)
        bias = padding_bias(valid, x.dtype)
        for i in range(tc.encoder_layers):
            x = S2TEncoderLayer(
                tc.encoder_embed_dim, tc.encoder_ffn_embed_dim,
                tc.encoder_attention_heads, tc.dropout, tc.attention_dropout,
                tc.activation_dropout, tc.activation_fn,
                tc.encoder_normalize_before, "abs",
                collaboration_mode=dc.encoder_collaboration_mode,
                league_s1_ratio=dc.encoder_league_s1_ratio,
                league_s2_ratio=dc.encoder_league_s2_ratio,
                s2_apply_norm=False, dtype=dt, name=f"layer{i}",
            )(x, valid, bias, None, deterministic,
              s2=speech_out, s2_bias=speech_bias)
        if tc.encoder_normalize_before:
            x = nn.LayerNorm(dtype=dt, name="final_norm")(x)
        return x, valid


@register_model("s2t_dual")
class S2TDualModel(nn.Module):
    cfg: S2TDualConfig

    def setup(self):
        sp = self.cfg.speech
        self.speech_encoder = S2TTransformerEncoder(sp, name="speech_encoder")
        self.text_encoder = DualTextEncoder(self.cfg, name="text_encoder")
        self.decoder = TransformerDecoder(
            vocab_size=sp.vocab_size,
            embed_dim=sp.decoder_embed_dim,
            ffn_dim=sp.decoder_ffn_embed_dim,
            num_layers=sp.decoder_layers,
            num_heads=sp.decoder_attention_heads,
            dropout=sp.dropout,
            attention_dropout=sp.attention_dropout,
            activation_dropout=sp.activation_dropout,
            activation=sp.activation_fn,
            normalize_before=sp.decoder_normalize_before,
            share_input_output_embed=sp.share_decoder_input_output_embed,
            max_positions=sp.max_target_positions,
            collaboration_mode=self.cfg.decoder_collaboration_mode,
            league_s1_ratio=self.cfg.decoder_league_s1_ratio,
            league_s2_ratio=self.cfg.decoder_league_s2_ratio,
            dtype=sp.dtype, name="decoder",
        )

    def _text_stream(self, enc, transcript, transcript_lengths, deterministic):
        """Use the given transcript, else the CTC greedy hypothesis."""
        if transcript is None:
            from s2t_tpu.ops.ctc import ctc_greedy_decode

            assert enc["ctc_logits"] is not None, "dual model needs CTC for inference"
            transcript, transcript_lengths = ctc_greedy_decode(
                jax.lax.stop_gradient(enc["ctc_logits"]), enc["encoder_lengths"]
            )
        speech_mask = lengths_to_mask(
            enc["encoder_lengths"], enc["encoder_out"].shape[1]
        )
        sp_bias = padding_bias(speech_mask, enc["encoder_out"].dtype)
        text_out, text_valid = self.text_encoder(
            transcript, transcript_lengths, enc["encoder_out"], sp_bias,
            deterministic,
        )
        return text_out, text_valid, speech_mask

    def __call__(self, features, feat_lengths, prev_tokens, deterministic=True,
                 transcript=None, transcript_lengths=None, **kw):
        enc = self.speech_encoder(features, feat_lengths, deterministic)
        text_out, text_valid, speech_mask = self._text_stream(
            enc, transcript, transcript_lengths, deterministic
        )
        s2_kw = {}
        if self.cfg.decoder_attend_speech:
            s2_kw = {"s2_out": enc["encoder_out"], "s2_valid_mask": speech_mask}
        logits = self.decoder(
            prev_tokens, text_out, text_valid, deterministic, **s2_kw
        )
        return {
            "decoder_logits": logits,
            "text_encoder_out": text_out,
            "text_valid_mask": text_valid,
            **enc,
        }

    def encode(self, features, feat_lengths, deterministic: bool = True):
        enc = self.speech_encoder(features, feat_lengths, deterministic)
        # fold the text stream into the encoder dict for generation
        text_out, text_valid, _ = self._text_stream(enc, None, None, deterministic)
        return {**enc, "text_out": text_out, "text_mask": text_valid}


def _route_dual_ctx(kw):
    sp_kw = {k[len("speech_"):]: v for k, v in kw.items() if k.startswith("speech_")}
    tx_kw = {k[len("text_"):]: v for k, v in kw.items() if k.startswith("text_")}
    rest = {k: v for k, v in kw.items()
            if not k.startswith("speech_") and not k.startswith("text_")}
    for key in ("vocab_size", "src_vocab_size", "input_feat_per_channel",
                "input_channels", "max_source_positions", "max_target_positions"):
        if key in rest:
            v = rest.pop(key)
            if key in ("vocab_size", "src_vocab_size", "max_target_positions",
                       "max_source_positions", "input_feat_per_channel",
                       "input_channels"):
                sp_kw[key] = v
            if key in ("vocab_size", "src_vocab_size"):
                tx_kw[key] = v
    return sp_kw, tx_kw, rest


@register_model_architecture("s2t_dual", "s2t_dual")
@register_model_architecture("s2t_dual", "s2t_dual_s")
def s2t_dual_s(**kw) -> S2TDualConfig:
    sp_kw, tx_kw, rest = _route_dual_ctx(kw)
    speech = s2t_transformer_s(use_ctc=True, **sp_kw)
    # text stream vocab = source (transcript) vocabulary
    tx_kw.setdefault("src_vocab_size", speech.ctc_vocab_size)
    text = TransformerMTConfig(
        encoder_embed_dim=speech.encoder_embed_dim,
        encoder_ffn_embed_dim=speech.encoder_ffn_embed_dim,
        encoder_layers=6,
        encoder_attention_heads=speech.encoder_attention_heads,
        encoder_normalize_before=True,
        dropout=speech.dropout,
        attention_dropout=speech.attention_dropout,
        activation_dropout=speech.activation_dropout,
    ).replace(**{k: v for k, v in tx_kw.items() if k != "max_source_positions"})
    return S2TDualConfig(speech=speech, text=text).replace(**rest)

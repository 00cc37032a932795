"""Dual-stream speech+text model (s2t_dual).

(reference: fairseq/models/speech_to_text/s2t_dual.py:36 — a speech encoder
and a text encoder over the transcript, with a TransformerS2 decoder whose
layers cross-attend to BOTH streams (models/transformer_s2.py:428); encoders
can be initialised from pretrained ASR/MT checkpoints.)

Training consumes (features, transcript, prev_tokens); at inference the text
stream defaults to the CTC greedy transcript of the speech encoder, so the
model still decodes from audio alone.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.attention import MultiHeadAttention, causal_bias, padding_bias
from s2t_tpu.modules.layers import FeedForward
from s2t_tpu.models.s2t_transformer import (
    S2TTransformerConfig,
    S2TTransformerEncoder,
    s2t_transformer_s,
)
from s2t_tpu.models.transformer import TransformerMTConfig, TransformerTextEncoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class S2TDualConfig:
    speech: S2TTransformerConfig = dataclasses.field(
        default_factory=S2TTransformerConfig
    )
    text: TransformerMTConfig = dataclasses.field(default_factory=TransformerMTConfig)

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


class DualDecoderLayer(nn.Module):
    """Decoder layer with two cross-attentions (speech + text streams) whose
    outputs are summed (reference: transformer_s2.py cross-stream layers)."""

    dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, speech_out, speech_bias, text_out, text_bias,
                 deterministic=True, cache=None, cache_index=None):
        drop = _FastDropout(self.dropout)
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="self_norm")(x)
        h, new_cache = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, dtype=self.dtype,
            name="self_attn",
        )(h, h, h, None if cache is not None else causal_bias(x.shape[1], x.dtype),
          deterministic, cache=cache, cache_index=cache_index)
        x = res + drop(h, deterministic=deterministic)

        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="cross_norm")(x)
        s, _ = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, dtype=self.dtype,
            name="speech_attn",
        )(h, speech_out, speech_out, speech_bias, deterministic)
        t, _ = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, dtype=self.dtype,
            name="text_attn",
        )(h, text_out, text_out, text_bias, deterministic)
        x = res + drop(s + t, deterministic=deterministic)

        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="ffn_norm")(x)
        h = FeedForward(self.dim, self.ffn_dim, "relu", self.dropout, 0.0,
                        self.dtype, name="ffn")(h, deterministic)
        x = res + drop(h, deterministic=deterministic)
        return x, new_cache


@register_model("s2t_dual")
class S2TDualModel(nn.Module):
    cfg: S2TDualConfig

    def setup(self):
        sp = self.cfg.speech
        self.speech_encoder = S2TTransformerEncoder(sp, name="speech_encoder")
        self.text_encoder = TransformerTextEncoder(self.cfg.text, name="text_encoder")
        self.embed_tokens = nn.Embed(
            sp.vocab_size, sp.decoder_embed_dim, dtype=sp.dtype,
            embedding_init=nn.initializers.normal(sp.decoder_embed_dim**-0.5),
            name="embed_tokens",
        )
        self.dec_layers = [
            DualDecoderLayer(
                sp.decoder_embed_dim, sp.decoder_ffn_embed_dim,
                sp.decoder_attention_heads, sp.dropout, sp.dtype,
                name=f"dec_layer{i}",
            )
            for i in range(sp.decoder_layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=sp.dtype, name="final_norm")

    def _text_stream(self, enc, transcript, transcript_lengths, deterministic):
        """Use the given transcript, else the CTC greedy hypothesis."""
        sp = self.cfg.speech
        if transcript is None:
            from s2t_tpu.ops.ctc import ctc_greedy_decode

            assert enc["ctc_logits"] is not None, "dual model needs CTC for inference"
            transcript, transcript_lengths = ctc_greedy_decode(
                jax.lax.stop_gradient(enc["ctc_logits"]), enc["encoder_lengths"]
            )
        tenc = self.text_encoder(transcript, transcript_lengths, deterministic)
        mask = lengths_to_mask(
            tenc["encoder_lengths"], tenc["encoder_out"].shape[1]
        )
        return tenc["encoder_out"], mask

    def _decode(self, prev_tokens, speech_out, speech_mask, text_out, text_mask,
                deterministic):
        sp = self.cfg.speech
        from s2t_tpu.modules.positional import fairseq_sinusoidal_encoding

        x = self.embed_tokens(prev_tokens) * jnp.sqrt(sp.decoder_embed_dim).astype(
            self.cfg.dtype
        )
        x = x + fairseq_sinusoidal_encoding(
            x.shape[1], sp.decoder_embed_dim, sp.pad_id, x.dtype
        )[None]
        sb = padding_bias(speech_mask, x.dtype)
        tb = padding_bias(text_mask, x.dtype)
        for layer in self.dec_layers:
            x, _ = layer(x, speech_out, sb, text_out, tb, deterministic)
        x = self.final_norm(x)
        return self.embed_tokens.attend(x)

    def __call__(self, features, feat_lengths, prev_tokens, deterministic=True,
                 transcript=None, transcript_lengths=None, **kw):
        enc = self.speech_encoder(features, feat_lengths, deterministic)
        speech_mask = lengths_to_mask(
            enc["encoder_lengths"], enc["encoder_out"].shape[1]
        )
        text_out, text_mask = self._text_stream(
            enc, transcript, transcript_lengths, deterministic
        )
        logits = self._decode(
            prev_tokens, enc["encoder_out"], speech_mask, text_out, text_mask,
            deterministic,
        )
        return {"decoder_logits": logits, **enc}

    def encode(self, features, feat_lengths, deterministic: bool = True):
        enc = self.speech_encoder(features, feat_lengths, deterministic)
        # fold the text stream into the encoder dict for generation
        text_out, text_mask = self._text_stream(enc, None, None, deterministic)
        return {**enc, "text_out": text_out, "text_mask": text_mask}


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
    ).replace(**{k: v for k, v in tx_kw.items() if k != "max_source_positions"})
    return S2TDualConfig(speech=speech, text=text).replace(**rest)

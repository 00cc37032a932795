"""SATE — Stacked Acoustic-and-Textual Encoding (ACL'21).

(reference: fairseq/models/speech_to_text/s2t_sate.py:37-1100 —
S2TSATEEncoder (:833) = acoustic encoder (transformer or PDS) → CTC →
Adapter bridge → TextualEncoder (:349, text-transformer with its own
positions and optional XCTC); pretrained ASR/MT component init via
checkpoint_utils.load_pretrained_component_from_model (:268-296); optional
freezing of either encoder (:855-856).)

The adapter bridge supports all PAE types including ``shrink`` (CTC-blank
collapse) via the static-shape segment matmul (modules/adapter.py).
Pretrained init maps to utils.checkpoint.transplant_component on the
"encoder/acoustic" and "encoder/textual" subtrees.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.adapter import Adapter, ctc_shrink_matrix
from s2t_tpu.modules.attention import padding_bias
from s2t_tpu.modules.ctc_head import CTCHead
from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.modules.positional import relative_encoding, sinusoidal_encoding
from s2t_tpu.models.s2t_transformer import (
    S2TTransformerConfig,
    S2TTransformerEncoder,
    s2t_transformer_s,
)
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask


@dataclass(frozen=True)
class SATEConfig:
    acoustic: S2TTransformerConfig = dataclasses.field(
        default_factory=S2TTransformerConfig
    )
    # adapter bridge (reference: adapter types at modules/speech_to_text/adapter.py:109)
    adapter_type: str = "league"
    adapter_shrink_strategy: str = "avg"
    adapter_temperature: float = 1.0
    # textual encoder
    text_encoder_layers: int = 6
    text_attention_heads: int = 4
    text_ffn_embed_dim: int = 2048
    text_attention_type: str = "abs"
    text_use_xctc: bool = False
    # freezing (gradient stop; param-freeze masks live in the optimizer)
    freeze_acoustic_encoder: bool = False
    freeze_textual_encoder: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    # pass-throughs used by generator/task plumbing
    @property
    def vocab_size(self):
        return self.acoustic.vocab_size

    @property
    def decoder_layers(self):
        return self.acoustic.decoder_layers

    @property
    def max_target_positions(self):
        return self.acoustic.max_target_positions

    @property
    def subsampling_layers(self):
        return self.acoustic.subsampling_layers

    @property
    def subsampling_stride(self):
        return self.acoustic.subsampling_stride

    @property
    def dtype(self):
        return self.acoustic.dtype


class TextualEncoder(nn.Module):
    """Text-transformer stage over adapter output
    (reference: s2t_sate.py:349-530)."""

    cfg: SATEConfig

    def setup(self):
        a = self.cfg.acoustic
        dt = a.dtype
        self.layers = [
            S2TEncoderLayer(
                a.encoder_embed_dim, self.cfg.text_ffn_embed_dim,
                self.cfg.text_attention_heads, a.dropout, a.attention_dropout,
                a.activation_dropout, a.activation_fn, a.encoder_normalize_before,
                self.cfg.text_attention_type, dtype=dt, name=f"layer{i}",
            )
            for i in range(self.cfg.text_encoder_layers)
        ]
        if a.encoder_normalize_before:
            self.final_norm = nn.LayerNorm(dtype=dt, name="final_norm")
        if self.cfg.text_use_xctc:
            self.xctc_head = CTCHead(a.vocab_size, a.dropout, dtype=dt, name="xctc_head")
        self.drop = nn.Dropout(a.dropout)

    def __call__(self, x, lengths, deterministic: bool = True):
        a = self.cfg.acoustic
        T = x.shape[1]
        pos_emb = None
        if self.cfg.text_attention_type == "rel_pos":
            pos_emb = relative_encoding(T, a.encoder_embed_dim, x.dtype)
        else:
            x = x + sinusoidal_encoding(T, a.encoder_embed_dim, x.dtype)[None]
        x = self.drop(x, deterministic=deterministic)
        valid = lengths_to_mask(lengths, T)
        bias = padding_bias(valid, x.dtype)
        for layer in self.layers:
            x = layer(x, valid, bias, pos_emb, deterministic)
        if a.encoder_normalize_before:
            x = self.final_norm(x)
        xctc = self.xctc_head(x, deterministic) if self.cfg.text_use_xctc else None
        return x, xctc


class S2TSATEEncoder(nn.Module):
    cfg: SATEConfig

    def setup(self):
        a = self.cfg.acoustic
        self.acoustic_enc = S2TTransformerEncoder(a, name="acoustic")
        if self.cfg.adapter_type not in ("none", "shrink"):
            self.adapter = Adapter(
                a.encoder_embed_dim, a.ctc_vocab_size, self.cfg.adapter_type,
                self.cfg.adapter_temperature, dtype=a.dtype, name="adapter",
            )
        self.textual_enc = TextualEncoder(self.cfg, name="textual")

    def __call__(self, features, lengths, deterministic: bool = True):
        cfg = self.cfg
        enc = self.acoustic_enc(features, lengths, deterministic)
        x = enc["encoder_out"]
        enc_lengths = enc["encoder_lengths"]
        if cfg.freeze_acoustic_encoder:
            x = jax.lax.stop_gradient(x)
        ctc_logits = enc["ctc_logits"]
        if cfg.adapter_type == "shrink":
            # collapse CTC-repeat/blank frames (static-shape segment matmul,
            # reference: CTCCompressStrategy adapter.py:14-78)
            W, new_lengths = ctc_shrink_matrix(
                ctc_logits, enc_lengths, blank_id=0,
                strategy=cfg.adapter_shrink_strategy,
            )
            x = jnp.einsum("bst,btd->bsd", W.astype(x.dtype), x)
            enc_lengths = new_lengths
        elif cfg.adapter_type != "none":
            x = self.adapter(x, ctc_logits, deterministic=deterministic)
        x, xctc_logits = self.textual_enc(x, enc_lengths, deterministic)
        if cfg.freeze_textual_encoder:
            x = jax.lax.stop_gradient(x)
        return {
            **enc,
            "encoder_out": x,
            "encoder_lengths": enc_lengths,
            "xctc_logits": xctc_logits,
        }


@register_model("s2t_sate")
class S2TSATEModel(nn.Module):
    cfg: SATEConfig

    def setup(self):
        a = self.cfg.acoustic
        self.encoder = S2TSATEEncoder(self.cfg, name="encoder")
        self.decoder = TransformerDecoder(
            vocab_size=a.vocab_size, embed_dim=a.decoder_embed_dim,
            ffn_dim=a.decoder_ffn_embed_dim, num_layers=a.decoder_layers,
            num_heads=a.decoder_attention_heads, dropout=a.dropout,
            attention_dropout=a.attention_dropout,
            activation_dropout=a.activation_dropout, activation=a.activation_fn,
            normalize_before=a.decoder_normalize_before,
            share_input_output_embed=a.share_decoder_input_output_embed,
            learned_pos=a.decoder_learned_pos,
            max_positions=a.max_target_positions, pad_id=a.pad_id,
            dtype=a.dtype, name="decoder",
        )

    def __call__(self, features, feat_lengths, prev_tokens, deterministic=True):
        enc = self.encoder(features, feat_lengths, deterministic)
        enc_mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self.decoder(prev_tokens, enc["encoder_out"], enc_mask, deterministic)
        return {"decoder_logits": logits, **enc}

    def encode(self, features, feat_lengths, deterministic: bool = True):
        return self.encoder(features, feat_lengths, deterministic)

    def decode(self, prev_tokens, encoder_out, encoder_valid_mask):
        return self.decoder(prev_tokens, encoder_out, encoder_valid_mask, True)

    def decode_step(self, tokens, cache, index, encoder_out, encoder_valid_mask,
                    cross_kv=None):
        return self.decoder.step(tokens, cache, index, encoder_out,
                                 encoder_valid_mask, cross_kv=cross_kv)

    def precompute_cross(self, encoder_out):
        return self.decoder.precompute_cross(encoder_out)

    def init_cache(self, batch_size: int, max_len: int):
        return self.decoder.init_cache(batch_size, max_len)


@register_model_architecture("s2t_sate", "s2t_sate")
@register_model_architecture("s2t_sate", "s2t_sate_s")
def s2t_sate_s(**kw) -> SATEConfig:
    acoustic_kw = {
        k[len("acoustic_"):]: v for k, v in kw.items() if k.startswith("acoustic_")
    }
    rest = {k: v for k, v in kw.items() if not k.startswith("acoustic_")}
    # task-level ctx keys route into the acoustic config
    for key in (
        "vocab_size", "src_vocab_size", "input_feat_per_channel",
        "input_channels", "max_source_positions", "max_target_positions",
    ):
        if key in rest:
            acoustic_kw[key] = rest.pop(key)
    acoustic = s2t_transformer_s(inter_ctc_layers=(), **acoustic_kw)
    return SATEConfig(acoustic=acoustic).replace(**rest)

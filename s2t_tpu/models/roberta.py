"""RoBERTa-style masked-LM encoder + heads.

(reference: fairseq/models/roberta/model.py:32 — a transformer encoder with
an LM head (dense → gelu → layer-norm → vocab projection tied to the
embedding) and pluggable classification heads; trained by tasks/masked_lm.py.)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.attention import padding_bias
from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class RobertaConfig:
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_layers: int = 12
    encoder_attention_heads: int = 12
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    activation_fn: str = "gelu"
    max_positions: int = 512
    vocab_size: int = 50265
    pad_id: int = 1
    num_classes: int = 0  # >0 adds a sentence classification head
    # >0 adds BERT-style segment (token-type) embeddings (reference:
    # fairseq/modules/transformer_sentence_encoder.py num_segments — the
    # legacy_masked_lm sentence-pair path)
    num_segments: int = 0
    dtype_str: str = "float32"
    # LM-task plumbing parity
    max_target_positions: int = 512

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32


@register_model("roberta")
class RobertaModel(nn.Module):
    cfg: RobertaConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.encoder_embed_dim,
            embedding_init=nn.initializers.normal(0.02), dtype=dt,
            name="embed_tokens",
        )
        # learned positions (reference: RoBERTa uses learned positional
        # embeddings offset by padding_idx, like fairseq's make_positions)
        self.embed_positions = nn.Embed(
            cfg.max_positions + 2, cfg.encoder_embed_dim, dtype=dt,
            embedding_init=nn.initializers.normal(0.02), name="embed_positions",
        )
        if cfg.num_segments > 0:
            self.embed_segments = nn.Embed(
                cfg.num_segments, cfg.encoder_embed_dim, dtype=dt,
                embedding_init=nn.initializers.normal(0.02),
                name="embed_segments",
            )
        self.emb_norm = nn.LayerNorm(dtype=dt, name="emb_norm")
        self.layers = [
            S2TEncoderLayer(
                cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim,
                cfg.encoder_attention_heads, cfg.dropout, cfg.attention_dropout,
                cfg.activation_dropout, cfg.activation_fn,
                False, "abs", False, False, 31, dt,  # post-norm (BERT style)
                name=f"layer{i}",
            )
            for i in range(cfg.encoder_layers)
        ]
        # LM head (reference: roberta/model.py RobertaLMHead)
        self.lm_dense = nn.Dense(cfg.encoder_embed_dim, dtype=dt, name="lm_dense")
        self.lm_norm = nn.LayerNorm(dtype=dt, name="lm_norm")
        self.lm_bias = self.param(
            "lm_bias", nn.initializers.zeros, (cfg.vocab_size,)
        )
        if cfg.num_classes > 0:
            self.cls_dense = nn.Dense(cfg.encoder_embed_dim, dtype=dt,
                                      name="cls_dense")
            self.cls_out = nn.Dense(cfg.num_classes, dtype=dt, name="cls_out")
        self.drop = _FastDropout(cfg.dropout)

    def encode(self, tokens, deterministic: bool = True, segments=None):
        cfg = self.cfg
        valid = tokens != cfg.pad_id
        positions = jnp.cumsum(valid.astype(jnp.int32), axis=1) * valid + cfg.pad_id
        x = self.embed_tokens(tokens) + self.embed_positions(positions)
        if cfg.num_segments > 0 and segments is not None:
            x = x + self.embed_segments(segments)
        x = self.emb_norm(x)
        x = self.drop(x, deterministic=deterministic)
        bias = padding_bias(valid, x.dtype)
        for layer in self.layers:
            x = layer(x, valid, bias, None, deterministic)
        return x, valid

    def __call__(self, tokens, deterministic: bool = True,
                 classification: bool = False, segments=None) -> Dict[str, Any]:
        cfg = self.cfg
        x, valid = self.encode(tokens, deterministic, segments=segments)
        out: Dict[str, Any] = {"encoder_out": x}
        # masked-LM logits: dense→gelu→norm→tied projection + bias
        h = nn.gelu(self.lm_dense(x))
        h = self.lm_norm(h)
        out["lm_logits"] = self.embed_tokens.attend(h) + self.lm_bias
        if classification and cfg.num_classes > 0:
            cls = jnp.tanh(self.cls_dense(x[:, 0]))
            out["cls_logits"] = self.cls_out(
                self.drop(cls, deterministic=deterministic)
            )
        return out


@register_model_architecture("roberta", "roberta_base")
def roberta_base(**kw) -> RobertaConfig:
    return RobertaConfig().replace(**kw)


@register_model_architecture("roberta", "bert_base")
def bert_base(**kw) -> RobertaConfig:
    """BERT-style sentence-pair encoder: segment embeddings + NSP head
    (reference: tasks/legacy_masked_lm.py + models/masked_lm.py)."""
    return RobertaConfig(num_segments=2, num_classes=2).replace(**kw)


@register_model_architecture("roberta", "roberta_large")
def roberta_large(**kw) -> RobertaConfig:
    return RobertaConfig(
        encoder_embed_dim=1024, encoder_ffn_embed_dim=4096,
        encoder_layers=24, encoder_attention_heads=16,
    ).replace(**kw)


# language-specific RoBERTa variants are the same graph with different
# pretraining corpora/vocabs (reference: models/roberta/model_camembert.py,
# model_gottbert.py, model_xlmr.py — each subclasses RobertaModel and only
# overrides hub checkpoint names)
@register_model_architecture("roberta", "camembert")
def camembert(**kw) -> RobertaConfig:
    return RobertaConfig(vocab_size=32005).replace(**kw)


@register_model_architecture("roberta", "gottbert")
def gottbert(**kw) -> RobertaConfig:
    return RobertaConfig(vocab_size=52009).replace(**kw)


@register_model_architecture("roberta", "xlmr_base")
def xlmr_base(**kw) -> RobertaConfig:
    return RobertaConfig(vocab_size=250002).replace(**kw)


@register_model_architecture("roberta", "xlmr_large")
def xlmr_large(**kw) -> RobertaConfig:
    return roberta_large(vocab_size=250002).replace(**kw)

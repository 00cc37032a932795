"""LightConv / DynamicConv MT models (Wu et al. ICLR'19).

(reference: fairseq/models/lightconv.py:30 — encoder/decoder stacks whose
self-attention is replaced by lightweight or dynamic convolutions with
per-layer kernel sizes; decoder keeps encoder cross-attention.)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.attention import MultiHeadAttention, padding_bias
from s2t_tpu.modules.layers import FeedForward
from s2t_tpu.modules.lightconv import LightConvBlock
from s2t_tpu.modules.positional import fairseq_sinusoidal_encoding
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class LightConvConfig:
    conv_type: str = "lightweight"  # lightweight | dynamic
    encoder_kernel_sizes: Tuple[int, ...] = (3, 7, 15, 31, 31, 31, 31)
    decoder_kernel_sizes: Tuple[int, ...] = (3, 7, 15, 31, 31, 31)
    encoder_embed_dim: int = 512
    encoder_conv_dim: int = 512
    encoder_ffn_embed_dim: int = 2048
    encoder_attention_heads: int = 8
    decoder_embed_dim: int = 512
    decoder_conv_dim: int = 512
    decoder_ffn_embed_dim: int = 2048
    decoder_attention_heads: int = 8
    encoder_glu: bool = True
    decoder_glu: bool = True
    dropout: float = 0.1
    attention_dropout: float = 0.1
    weight_dropout: float = 0.1
    share_decoder_input_output_embed: bool = True
    vocab_size: int = 1000
    src_vocab_size: int = -1
    max_source_positions: int = 1024
    max_target_positions: int = 1024
    pad_id: int = 1
    dtype_str: str = "float32"
    # generator plumbing parity
    subsampling_layers: int = 0
    subsampling_stride: int = 1

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def src_vocab(self):
        return self.src_vocab_size if self.src_vocab_size > 0 else self.vocab_size

    @property
    def encoder_layers(self):
        return len(self.encoder_kernel_sizes)

    @property
    def decoder_layers(self):
        return len(self.decoder_kernel_sizes)


class LightConvEncoderLayer(nn.Module):
    cfg: LightConvConfig
    kernel_size: int

    @nn.compact
    def __call__(self, x, valid, deterministic=True):
        cfg = self.cfg
        drop = _FastDropout(cfg.dropout)
        res = x
        h = nn.LayerNorm(dtype=cfg.dtype, name="conv_norm")(x)
        h, _ = LightConvBlock(
            cfg.encoder_embed_dim, cfg.encoder_conv_dim, self.kernel_size,
            cfg.encoder_attention_heads, cfg.conv_type, cfg.encoder_glu,
            False, cfg.dropout, cfg.weight_dropout, cfg.dtype, name="conv_block",
        )(h, valid, deterministic)
        x = res + drop(h, deterministic=deterministic)
        res = x
        h = nn.LayerNorm(dtype=cfg.dtype, name="ffn_norm")(x)
        h = FeedForward(cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim,
                        "relu", cfg.dropout, 0.0, cfg.dtype, name="ffn")(
            h, deterministic)
        return res + drop(h, deterministic=deterministic)


class LightConvDecoderLayer(nn.Module):
    cfg: LightConvConfig
    kernel_size: int

    @nn.compact
    def __call__(self, x, enc_out, cross_bias, deterministic=True,
                 conv_cache=None):
        cfg = self.cfg
        drop = _FastDropout(cfg.dropout)
        res = x
        h = nn.LayerNorm(dtype=cfg.dtype, name="conv_norm")(x)
        h, new_cache = LightConvBlock(
            cfg.decoder_embed_dim, cfg.decoder_conv_dim, self.kernel_size,
            cfg.decoder_attention_heads, cfg.conv_type, cfg.decoder_glu,
            True, cfg.dropout, cfg.weight_dropout, cfg.dtype, name="conv_block",
        )(h, None, deterministic, conv_cache)
        x = res + drop(h, deterministic=deterministic)
        res = x
        h = nn.LayerNorm(dtype=cfg.dtype, name="cross_norm")(x)
        h, _ = MultiHeadAttention(
            cfg.decoder_embed_dim, cfg.decoder_attention_heads,
            cfg.attention_dropout, dtype=cfg.dtype, name="cross_attn",
        )(h, enc_out, enc_out, cross_bias, deterministic)
        x = res + drop(h, deterministic=deterministic)
        res = x
        h = nn.LayerNorm(dtype=cfg.dtype, name="ffn_norm")(x)
        h = FeedForward(cfg.decoder_embed_dim, cfg.decoder_ffn_embed_dim,
                        "relu", cfg.dropout, 0.0, cfg.dtype, name="ffn")(
            h, deterministic)
        return res + drop(h, deterministic=deterministic), new_cache


@register_model("lightconv")
class LightConvModel(nn.Module):
    cfg: LightConvConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        self.src_embed = nn.Embed(
            cfg.src_vocab, cfg.encoder_embed_dim,
            embedding_init=nn.initializers.normal(cfg.encoder_embed_dim**-0.5),
            dtype=dt, name="src_embed",
        )
        self.tgt_embed = nn.Embed(
            cfg.vocab_size, cfg.decoder_embed_dim,
            embedding_init=nn.initializers.normal(cfg.decoder_embed_dim**-0.5),
            dtype=dt, name="tgt_embed",
        )
        self.enc_layers = [
            LightConvEncoderLayer(cfg, k, name=f"enc{i}")
            for i, k in enumerate(cfg.encoder_kernel_sizes)
        ]
        self.dec_layers = [
            LightConvDecoderLayer(cfg, k, name=f"dec{i}")
            for i, k in enumerate(cfg.decoder_kernel_sizes)
        ]
        self.enc_norm = nn.LayerNorm(dtype=dt, name="enc_norm")
        self.dec_norm = nn.LayerNorm(dtype=dt, name="dec_norm")
        self.drop = _FastDropout(cfg.dropout)

    def encode(self, src_tokens, src_lengths=None, deterministic: bool = True):
        cfg = self.cfg
        if src_lengths is None:
            src_lengths = jnp.sum((src_tokens != cfg.pad_id).astype(jnp.int32), 1)
        x = self.src_embed(src_tokens) * jnp.sqrt(cfg.encoder_embed_dim).astype(
            cfg.dtype
        )
        x = x + fairseq_sinusoidal_encoding(
            x.shape[1], cfg.encoder_embed_dim, cfg.pad_id, x.dtype
        )[None]
        x = self.drop(x, deterministic=deterministic)
        valid = src_tokens != cfg.pad_id
        for layer in self.enc_layers:
            x = layer(x, valid, deterministic)
        x = self.enc_norm(x)
        return {
            "encoder_out": x, "encoder_lengths": src_lengths,
            "ctc_logits": None, "inter_ctc_logits": (), "xctc_logits": None,
            "inter_xctc_logits": (), "mixup": None,
        }

    def _embed_tgt(self, tokens, offset):
        cfg = self.cfg
        x = self.tgt_embed(tokens) * jnp.sqrt(cfg.decoder_embed_dim).astype(cfg.dtype)
        pe = fairseq_sinusoidal_encoding(
            cfg.max_target_positions, cfg.decoder_embed_dim, cfg.pad_id, x.dtype
        )
        return x + jax.lax.dynamic_slice_in_dim(pe, offset, tokens.shape[1], 0)[None]

    def __call__(self, src_tokens, src_lengths, prev_tokens,
                 deterministic: bool = True):
        enc = self.encode(src_tokens, src_lengths, deterministic)
        valid = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        cb = padding_bias(valid, self.cfg.dtype)
        x = self._embed_tgt(prev_tokens, 0)
        x = self.drop(x, deterministic=deterministic)
        for layer in self.dec_layers:
            x, _ = layer(x, enc["encoder_out"], cb, deterministic)
        x = self.dec_norm(x)
        logits = self.tgt_embed.attend(x)
        return {"decoder_logits": logits, **enc}

    # -- incremental decode (SequenceGenerator protocol) --------------------- #
    def init_cache(self, batch_size: int, max_len: int):
        cfg = self.cfg
        return {
            f"dec{i}": jnp.zeros(
                (batch_size, k - 1,
                 cfg.decoder_conv_dim), cfg.dtype
            )
            for i, k in enumerate(cfg.decoder_kernel_sizes)
        }

    def decode_step(self, tokens, cache, index, encoder_out, encoder_valid_mask):
        cb = padding_bias(encoder_valid_mask, self.cfg.dtype)
        x = self._embed_tgt(tokens, index)
        new_cache = {}
        for i, layer in enumerate(self.dec_layers):
            x, nc = layer(x, encoder_out, cb, True, conv_cache=cache[f"dec{i}"])
            new_cache[f"dec{i}"] = nc
        x = self.dec_norm(x)
        return self.tgt_embed.attend(x)[:, 0], new_cache


@register_model_architecture("lightconv", "lightconv")
@register_model_architecture("lightconv", "lightconv_iwslt_de_en")
def lightconv_iwslt(**kw) -> LightConvConfig:
    return LightConvConfig(
        encoder_embed_dim=512, encoder_conv_dim=512, encoder_ffn_embed_dim=1024,
        encoder_attention_heads=4, decoder_embed_dim=512, decoder_conv_dim=512,
        decoder_ffn_embed_dim=1024, decoder_attention_heads=4,
    ).replace(**kw)


@register_model_architecture("lightconv", "dynamicconv")
@register_model_architecture("lightconv", "dynamicconv_iwslt_de_en")
def dynamicconv_iwslt(**kw) -> LightConvConfig:
    return lightconv_iwslt(conv_type="dynamic").replace(**kw)

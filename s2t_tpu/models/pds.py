"""PDS — Progressive Down-Sampling encoder (ACL'23).

(reference: fairseq/models/speech_to_text/pdss2t_transformer.py:53-1700 —
encoder split into stages; each stage = strided-conv Downsampling →
positional embed → N transformer layers → optional per-stage CTC + PAE;
multi-scale fusion of stage outputs into the final representation; arch
presets pdss2t_transformer_{s,m}_{8,16,32}.)

TPU notes: every stage halves T, so deeper stages run on shorter sequences —
attention cost drops geometrically while dims stay MXU-aligned.  Fusion
downsamples earlier stages with strided convs to the final length and sums.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.modules.adapter import Adapter
from s2t_tpu.modules.attention import padding_bias
from s2t_tpu.modules.ctc_head import CTCHead
from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.modules.positional import relative_encoding, sinusoidal_encoding
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class PDSConfig:
    # input
    input_feat_per_channel: int = 80
    input_channels: int = 1
    # stages (reference defaults: set_pds_base_16, pdss2t_transformer.py:1504)
    pds_stages: int = 4
    pds_ratios: Tuple[int, ...] = (2, 2, 2, 2)
    pds_layers: Tuple[int, ...] = (2, 2, 6, 2)
    pds_kernel_sizes: Tuple[int, ...] = (5, 5, 5, 5)
    pds_embed_dims: Tuple[int, ...] = (256, 256, 256, 256)
    pds_attn_heads: Tuple[int, ...] = (4, 4, 4, 4)
    pds_ffn_ratios: Tuple[int, ...] = (8, 8, 8, 8)
    pds_position_embed: Tuple[int, ...] = (1, 1, 1, 1)
    pds_ctc: Tuple[int, ...] = (0, 0, 0, 0)  # per-stage inter-CTC flags
    pds_embed_norm: bool = True
    pds_fusion: bool = False
    pds_fusion_method: str = "all_conv"
    # encoder globals
    encoder_embed_dim: int = 256  # == last stage dim
    encoder_attention_type: str = "abs"
    encoder_normalize_before: bool = True
    activation_fn: str = "relu"
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    macaron_style: bool = False
    use_cnn_module: bool = False
    cnn_module_kernel: int = 31
    # CTC / PAE
    use_ctc: bool = True
    ctc_pae: str = "none"
    pae_ctc_temperature: float = 1.0
    share_inter_ctc: bool = True
    # decoder
    decoder_embed_dim: int = 256
    decoder_ffn_embed_dim: int = 2048
    decoder_layers: int = 6
    decoder_attention_heads: int = 4
    decoder_normalize_before: bool = True
    decoder_learned_pos: bool = False
    share_decoder_input_output_embed: bool = True
    # sizes
    vocab_size: int = 1000
    src_vocab_size: int = -1
    max_source_positions: int = 6000
    max_target_positions: int = 1024
    pad_id: int = 1
    dtype_str: str = "float32"
    # kept for API parity with S2TTransformerConfig consumers
    subsampling_layers: int = 0
    subsampling_stride: int = 1

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def ctc_vocab_size(self):
        return self.src_vocab_size if self.src_vocab_size > 0 else self.vocab_size

    @property
    def total_ratio(self):
        r = 1
        for x in self.pds_ratios:
            r *= max(x, 1)
        return r


class Downsampling(nn.Module):
    """Strided-conv stage downsampler (reference: pdss2t_transformer.py:53-146)."""

    out_dim: int
    kernel_size: int = 5
    stride: int = 2
    embed_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        if self.stride <= 1 and x.shape[-1] == self.out_dim:
            return x, lengths
        mask = lengths_to_mask(lengths, x.shape[1])[..., None]
        x = jnp.where(mask, x, 0.0)
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.out_dim, (self.kernel_size,), strides=(max(self.stride, 1),),
            padding=[(pad, pad)], dtype=self.dtype, name="conv",
        )(x)
        if self.stride > 1:
            lengths = (lengths - 1) // self.stride + 1
        if self.embed_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        mask = lengths_to_mask(lengths, x.shape[1])[..., None]
        return jnp.where(mask, x, 0.0), lengths


class PDSEncoder(nn.Module):
    cfg: PDSConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        n = cfg.pds_stages
        self.downsamplers = [
            Downsampling(
                cfg.pds_embed_dims[i], cfg.pds_kernel_sizes[i], cfg.pds_ratios[i],
                cfg.pds_embed_norm, dt, name=f"ds{i}",
            )
            for i in range(n)
        ]
        self.stage_layers = [
            [
                S2TEncoderLayer(
                    cfg.pds_embed_dims[i],
                    cfg.pds_embed_dims[i] * cfg.pds_ffn_ratios[i],
                    cfg.pds_attn_heads[i], cfg.dropout, cfg.attention_dropout,
                    cfg.activation_dropout, cfg.activation_fn,
                    cfg.encoder_normalize_before, cfg.encoder_attention_type,
                    cfg.macaron_style, cfg.use_cnn_module, cfg.cnn_module_kernel,
                    dt, name=f"stage{i}_layer{j}",
                )
                for j in range(cfg.pds_layers[i])
            ]
            for i in range(n)
        ]
        if cfg.use_ctc:
            self.ctc_head = CTCHead(cfg.ctc_vocab_size, cfg.dropout, dtype=dt, name="ctc_head")
            if any(cfg.pds_ctc[:-1]):
                self.inter_ctc_norm = nn.LayerNorm(dtype=dt, name="inter_ctc_norm")
            if cfg.ctc_pae != "none":
                self.pae = Adapter(
                    cfg.pds_embed_dims[-1], cfg.ctc_vocab_size, cfg.ctc_pae,
                    cfg.pae_ctc_temperature, dtype=dt, name="pae",
                )
        if cfg.pds_fusion:
            # per-stage downsample-to-final-length convs + weights
            def remaining_ratio(i):
                r = 1
                for v in cfg.pds_ratios[i + 1 :]:
                    r *= max(v, 1)
                return r

            self.fusion_downs = [
                Downsampling(
                    cfg.pds_embed_dims[-1], 5, remaining_ratio(i), True, dt,
                    name=f"fusion_ds{i}",
                )
                for i in range(n)
            ]
            self.fusion_weight = self.param(
                "fusion_weight", nn.initializers.constant(1.0 / n), (n,)
            )
        if cfg.encoder_normalize_before:
            self.final_norm = nn.LayerNorm(dtype=dt, name="final_norm")
        self.drop = _FastDropout(cfg.dropout)

    def __call__(self, features, lengths, deterministic: bool = True):
        cfg = self.cfg
        x = features.astype(cfg.dtype)
        inter_ctc_logits = []
        stage_outs = []
        stage_lens = []
        for i in range(cfg.pds_stages):
            x, lengths = self.downsamplers[i](x, lengths)
            T = x.shape[1]
            pos_emb = None
            if cfg.pds_position_embed[i]:
                if cfg.encoder_attention_type == "rel_pos":
                    pos_emb = relative_encoding(T, cfg.pds_embed_dims[i], x.dtype)
                else:
                    x = x + sinusoidal_encoding(T, cfg.pds_embed_dims[i], x.dtype)[None]
            x = self.drop(x, deterministic=deterministic)
            valid = lengths_to_mask(lengths, T)
            bias = padding_bias(valid, x.dtype)
            for layer in self.stage_layers[i]:
                x = layer(x, valid, bias, pos_emb, deterministic)
            stage_outs.append(x)
            stage_lens.append(lengths)
            if (
                cfg.use_ctc
                and i < cfg.pds_stages - 1
                and i < len(cfg.pds_ctc)
                and cfg.pds_ctc[i]
            ):
                # per-stage CTC only when dims match the shared head
                if cfg.pds_embed_dims[i] == cfg.pds_embed_dims[-1]:
                    h = self.inter_ctc_norm(x)
                    logits = self.ctc_head(h, deterministic)
                    inter_ctc_logits.append((i + 1, logits))
                    if cfg.ctc_pae != "none":
                        x = self.pae(x, logits, deterministic=deterministic)

        if cfg.pds_fusion:
            fused = jnp.zeros_like(x)
            for i, (s, sl) in enumerate(zip(stage_outs, stage_lens)):
                y, yl = self.fusion_downs[i](s, sl)
                # align (clip/pad) to final length
                Tf = x.shape[1]
                if y.shape[1] >= Tf:
                    y = y[:, :Tf]
                else:
                    y = jnp.pad(y, ((0, 0), (0, Tf - y.shape[1]), (0, 0)))
                fused = fused + self.fusion_weight[i].astype(x.dtype) * y
            x = fused

        if cfg.encoder_normalize_before:
            x = self.final_norm(x)
        ctc_logits = self.ctc_head(x, deterministic) if cfg.use_ctc else None
        return {
            "encoder_out": x,
            "encoder_lengths": lengths,
            "ctc_logits": ctc_logits,
            "inter_ctc_logits": tuple(inter_ctc_logits),
            "xctc_logits": None,
            "inter_xctc_logits": (),
        }


@register_model("pdss2t_transformer")
class PDSS2TTransformerModel(nn.Module):
    """PDS encoder + transformer decoder (reference: pdss2t_transformer.py:147)."""

    cfg: PDSConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = PDSEncoder(cfg, name="encoder")
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size, embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim, num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads, dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout,
            activation=cfg.activation_fn,
            normalize_before=cfg.decoder_normalize_before,
            share_input_output_embed=cfg.share_decoder_input_output_embed,
            learned_pos=cfg.decoder_learned_pos,
            max_positions=cfg.max_target_positions, pad_id=cfg.pad_id,
            dtype=cfg.dtype, name="decoder",
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


def _pds_preset(stages, ratios, layers, kernels, dims, heads, ffn_ratios, **kw):
    cfg = PDSConfig(
        pds_stages=stages, pds_ratios=ratios, pds_layers=layers,
        pds_kernel_sizes=kernels, pds_embed_dims=dims, pds_attn_heads=heads,
        pds_ffn_ratios=ffn_ratios,
        pds_position_embed=tuple(1 for _ in range(stages)),
        pds_ctc=tuple(0 for _ in range(stages)),
        encoder_embed_dim=dims[-1], decoder_embed_dim=dims[-1],
        decoder_ffn_embed_dim=dims[-1] * 8,
    )
    return cfg.replace(**kw)


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_s")
@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_s_16")
def pdss2t_transformer_s_16(**kw) -> PDSConfig:
    return _pds_preset(
        4, (2, 2, 2, 2), (2, 2, 6, 2), (5, 5, 5, 5),
        (256, 256, 256, 256), (4, 4, 4, 4), (8, 8, 8, 8), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_s_8")
def pdss2t_transformer_s_8(**kw) -> PDSConfig:
    return _pds_preset(
        4, (2, 2, 1, 2), (3, 3, 3, 3), (5, 5, 5, 5),
        (256, 256, 256, 256), (4, 4, 4, 4), (8, 8, 8, 8), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_s_32")
def pdss2t_transformer_s_32(**kw) -> PDSConfig:
    return _pds_preset(
        5, (2, 2, 2, 2, 2), (2, 2, 3, 3, 2), (5, 5, 5, 5, 5),
        (256, 256, 256, 256, 256), (4, 4, 4, 4, 4), (8, 8, 8, 8, 8), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_m")
def pdss2t_transformer_m(**kw) -> PDSConfig:
    return _pds_preset(
        4, (2, 2, 2, 2), (2, 2, 6, 2), (5, 5, 5, 5),
        (512, 512, 512, 512), (8, 8, 8, 8), (4, 4, 4, 4), **kw,
    )

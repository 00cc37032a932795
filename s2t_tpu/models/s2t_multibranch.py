"""Multi-branch speech model: junior acoustic → {senior acoustic, textual}.

(reference: fairseq/models/speech_to_text/s2t_multibranch.py:43 — a shared
junior acoustic encoder feeds a senior acoustic (ASR/CTC) branch and a
textual (translation) branch; the branches collaborate through cross-branch
attention (--collaboration-direction), and the decoder attends both streams;
trained with join_speech_and_text_loss.)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.models.s2t_dual import DualDecoderLayer
from s2t_tpu.modules.adapter import Adapter
from s2t_tpu.modules.attention import MultiHeadAttention, padding_bias
from s2t_tpu.modules.ctc_head import CTCHead
from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.modules.positional import fairseq_sinusoidal_encoding
from s2t_tpu.modules.subsampling import Conv1dSubsampling
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class S2TMultiBranchConfig:
    input_feat_per_channel: int = 80
    input_channels: int = 1
    subsampling_layers: int = 2
    subsampling_filter: int = 1024
    subsampling_kernel: int = 5
    subsampling_stride: int = 2
    encoder_embed_dim: int = 256
    encoder_ffn_embed_dim: int = 2048
    encoder_attention_heads: int = 4
    junior_layers: int = 6
    senior_layers: int = 6
    textual_layers: int = 6
    # none | acoustic (textual→senior) | textual (senior→textual) | both
    collaboration_direction: str = "both"
    textual_adapter: str = "league"  # PAE bridging senior CTC → textual
    decoder_layers: int = 6
    decoder_embed_dim: int = 256
    decoder_ffn_embed_dim: int = 2048
    decoder_attention_heads: int = 4
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation_fn: str = "relu"
    vocab_size: int = 1000
    src_vocab_size: int = -1
    max_source_positions: int = 6000
    max_target_positions: int = 1024
    pad_id: int = 1
    dtype_str: str = "float32"
    consumes_transcript: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def ctc_vocab_size(self):
        return self.src_vocab_size if self.src_vocab_size > 0 else self.vocab_size


class CollaborationBlock(nn.Module):
    """Cross-branch attention injection (reference: collaboration modules)."""

    dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, other, other_valid, deterministic=True):
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        h, _ = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, dtype=self.dtype,
            name="cross_attn",
        )(h, other, other, padding_bias(other_valid, x.dtype), deterministic)
        return res + _FastDropout(self.dropout)(h, deterministic=deterministic)


class S2TMultiBranchEncoder(nn.Module):
    cfg: S2TMultiBranchConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        D = cfg.encoder_embed_dim

        def stack(n, prefix):
            return [
                S2TEncoderLayer(
                    D, cfg.encoder_ffn_embed_dim, cfg.encoder_attention_heads,
                    cfg.dropout, cfg.attention_dropout, cfg.activation_dropout,
                    cfg.activation_fn, True, "abs", False, False, 31, dt,
                    name=f"{prefix}{i}",
                )
                for i in range(n)
            ]

        self.subsample = Conv1dSubsampling(
            cfg.subsampling_layers, cfg.subsampling_filter, D,
            cfg.subsampling_kernel, cfg.subsampling_stride, "none", "glu",
            True, dt, name="subsample",
        )
        self.junior = stack(cfg.junior_layers, "junior")
        self.senior = stack(cfg.senior_layers, "senior")
        self.textual = stack(cfg.textual_layers, "textual")
        self.junior_norm = nn.LayerNorm(dtype=dt, name="junior_norm")
        self.senior_norm = nn.LayerNorm(dtype=dt, name="senior_norm")
        self.textual_norm = nn.LayerNorm(dtype=dt, name="textual_norm")
        self.ctc_head = CTCHead(cfg.ctc_vocab_size, cfg.dropout, dtype=dt,
                                name="ctc_head")
        if cfg.textual_adapter != "none":
            self.adapter = Adapter(
                D, cfg.ctc_vocab_size, cfg.textual_adapter, dtype=dt,
                name="adapter",
            )
        if cfg.collaboration_direction in ("acoustic", "both"):
            self.collab_to_senior = CollaborationBlock(
                D, cfg.encoder_attention_heads, cfg.dropout, dt,
                name="collab_to_senior",
            )
        if cfg.collaboration_direction in ("textual", "both"):
            self.collab_to_textual = CollaborationBlock(
                D, cfg.encoder_attention_heads, cfg.dropout, dt,
                name="collab_to_textual",
            )
        self.drop = _FastDropout(cfg.dropout)

    def __call__(self, features, lengths, deterministic: bool = True):
        cfg = self.cfg
        x, lengths = self.subsample(features.astype(cfg.dtype), lengths)
        x = x * jnp.sqrt(cfg.encoder_embed_dim).astype(x.dtype)
        T = x.shape[1]
        x = x + fairseq_sinusoidal_encoding(
            T, cfg.encoder_embed_dim, cfg.pad_id, x.dtype
        )[None]
        x = self.drop(x, deterministic=deterministic)
        valid = lengths_to_mask(lengths, T)
        bias = padding_bias(valid, x.dtype)

        for layer in self.junior:
            x = layer(x, valid, bias, None, deterministic)
        junior = self.junior_norm(x)

        # senior acoustic branch (ASR): CTC over transcripts
        s = junior
        for layer in self.senior:
            s = layer(s, valid, bias, None, deterministic)
        s = self.senior_norm(s)
        ctc_logits = self.ctc_head(s, deterministic)

        # textual branch: PAE adapter re-injects CTC predictions
        t = junior
        if cfg.textual_adapter != "none":
            t = self.adapter(t, ctc_logits, deterministic=deterministic)
        for layer in self.textual:
            t = layer(t, valid, bias, None, deterministic)
        t = self.textual_norm(t)

        # collaboration between branches
        if cfg.collaboration_direction in ("acoustic", "both"):
            s = self.collab_to_senior(s, t, valid, deterministic)
        if cfg.collaboration_direction in ("textual", "both"):
            t = self.collab_to_textual(t, s, valid, deterministic)

        return {
            "encoder_out": t,
            "senior_out": s,
            "encoder_lengths": lengths,
            "ctc_logits": ctc_logits,
            "inter_ctc_logits": (),
            "xctc_logits": None,
            "inter_xctc_logits": (),
            "mixup": None,
        }


@register_model("s2t_multibranch")
class S2TMultiBranchModel(nn.Module):
    cfg: S2TMultiBranchConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = S2TMultiBranchEncoder(cfg, name="encoder")
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.decoder_embed_dim, dtype=cfg.dtype,
            embedding_init=nn.initializers.normal(cfg.decoder_embed_dim**-0.5),
            name="embed_tokens",
        )
        self.dec_layers = [
            DualDecoderLayer(
                cfg.decoder_embed_dim, cfg.decoder_ffn_embed_dim,
                cfg.decoder_attention_heads, cfg.dropout, cfg.dtype,
                name=f"dec_layer{i}",
            )
            for i in range(cfg.decoder_layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=cfg.dtype, name="final_norm")

    def _decode(self, prev_tokens, enc, deterministic):
        cfg = self.cfg
        valid = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        x = self.embed_tokens(prev_tokens) * jnp.sqrt(
            cfg.decoder_embed_dim
        ).astype(cfg.dtype)
        x = x + fairseq_sinusoidal_encoding(
            x.shape[1], cfg.decoder_embed_dim, cfg.pad_id, x.dtype
        )[None]
        b = padding_bias(valid, x.dtype)
        for layer in self.dec_layers:
            # decoder cross-attends BOTH branches (textual + senior)
            x, _ = layer(x, enc["encoder_out"], b, enc["senior_out"], b,
                         deterministic)
        x = self.final_norm(x)
        return self.embed_tokens.attend(x)

    def __call__(self, features, feat_lengths, prev_tokens,
                 deterministic: bool = True, **kw) -> Dict[str, Any]:
        enc = self.encoder(features, feat_lengths, deterministic)
        logits = self._decode(prev_tokens, enc, deterministic)
        return {"decoder_logits": logits, **enc}

    def encode(self, features, feat_lengths, deterministic: bool = True):
        return self.encoder(features, feat_lengths, deterministic)


@register_model_architecture("s2t_multibranch", "s2t_multibranch")
@register_model_architecture("s2t_multibranch", "s2t_multibranch_s")
def s2t_multibranch_s(**kw) -> S2TMultiBranchConfig:
    return S2TMultiBranchConfig().replace(**kw)

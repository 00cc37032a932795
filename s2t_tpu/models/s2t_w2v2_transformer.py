"""S2T with a wav2vec 2.0 front-end.

(reference: fairseq/models/speech_to_text/s2t_w2v2_transformer.py:43 —
a pretrained wav2vec2 encoder consumes raw waveforms, an optional conv
subsampler reduces T, transformer encoder layers refine, and a standard
transformer decoder generates; pretrained w2v weights load from checkpoint
(:98-108) — here via utils.checkpoint.transplant_component on the
"encoder/w2v" subtree.)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
from s2t_tpu.modules.attention import padding_bias
from s2t_tpu.modules.ctc_head import CTCHead
from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask


@dataclass(frozen=True)
class S2TW2V2Config:
    w2v: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)
    freeze_w2v: bool = False
    # post-w2v encoder stack
    encoder_layers: int = 6
    encoder_embed_dim: int = 512
    encoder_ffn_embed_dim: int = 2048
    encoder_attention_heads: int = 8
    encoder_normalize_before: bool = True
    use_ctc: bool = False
    # decoder
    decoder_layers: int = 6
    decoder_embed_dim: int = 512
    decoder_ffn_embed_dim: int = 2048
    decoder_attention_heads: int = 8
    decoder_normalize_before: bool = True
    share_decoder_input_output_embed: bool = True
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation_fn: str = "relu"
    vocab_size: int = 1000
    src_vocab_size: int = -1
    # raw-waveform input (use_audio_input data configs)
    input_feat_per_channel: int = 1
    input_channels: int = 1
    max_source_positions: int = 400000
    max_target_positions: int = 1024
    pad_id: int = 1
    dtype_str: str = "float32"

    def replace(self, **kw):
        w2v_kw = {k[4:]: v for k, v in kw.items() if k.startswith("w2v_")}
        rest = {k: v for k, v in kw.items() if not k.startswith("w2v_")}
        if w2v_kw:
            rest["w2v"] = (rest.get("w2v") or self.w2v).replace(**w2v_kw)
        return dataclasses.replace(self, **rest)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def ctc_vocab_size(self):
        return self.src_vocab_size if self.src_vocab_size > 0 else self.vocab_size


class S2TW2V2Encoder(nn.Module):
    cfg: S2TW2V2Config

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        self.w2v = Wav2Vec2Model(cfg.w2v, name="w2v")
        if cfg.w2v.encoder_embed_dim != cfg.encoder_embed_dim:
            self.bridge = nn.Dense(cfg.encoder_embed_dim, dtype=dt, name="bridge")
        self.layers = [
            S2TEncoderLayer(
                cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim,
                cfg.encoder_attention_heads, cfg.dropout, cfg.attention_dropout,
                cfg.activation_dropout, cfg.activation_fn,
                cfg.encoder_normalize_before, "abs", False, False, 31, dt,
                name=f"layer{i}",
            )
            for i in range(cfg.encoder_layers)
        ]
        if cfg.encoder_normalize_before and cfg.encoder_layers > 0:
            self.final_norm = nn.LayerNorm(dtype=dt, name="final_norm")
        if cfg.use_ctc:
            self.ctc_head = CTCHead(cfg.ctc_vocab_size, cfg.dropout, dtype=dt,
                                    name="ctc_head")

    def __call__(self, source, lengths, deterministic: bool = True):
        cfg = self.cfg
        x, out_lengths = self.w2v.extract_features(
            source, lengths, deterministic, apply_mask=not deterministic
        )
        if cfg.freeze_w2v:
            import jax

            x = jax.lax.stop_gradient(x)
        if cfg.w2v.encoder_embed_dim != cfg.encoder_embed_dim:
            x = self.bridge(x)
        T = x.shape[1]
        valid = lengths_to_mask(out_lengths, T)
        bias = padding_bias(valid, x.dtype)
        for layer in self.layers:
            x = layer(x, valid, bias, None, deterministic)
        if cfg.encoder_normalize_before and cfg.encoder_layers > 0:
            x = self.final_norm(x)
        ctc_logits = self.ctc_head(x, deterministic) if cfg.use_ctc else None
        return {
            "encoder_out": x,
            "encoder_lengths": out_lengths,
            "ctc_logits": ctc_logits,
            "inter_ctc_logits": (),
            "xctc_logits": None,
            "inter_xctc_logits": (),
            "mixup": None,
        }


@register_model("s2t_w2v2_transformer")
class S2TW2V2TransformerModel(nn.Module):
    cfg: S2TW2V2Config

    def setup(self):
        cfg = self.cfg
        self.encoder = S2TW2V2Encoder(cfg, name="encoder")
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size,
            embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim,
            num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads,
            dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout,
            activation=cfg.activation_fn,
            normalize_before=cfg.decoder_normalize_before,
            share_input_output_embed=cfg.share_decoder_input_output_embed,
            max_positions=cfg.max_target_positions,
            pad_id=cfg.pad_id,
            dtype=cfg.dtype,
            name="decoder",
        )

    def __call__(self, features, feat_lengths, prev_tokens,
                 deterministic: bool = True, **kw) -> Dict[str, Any]:
        enc = self.encoder(features, feat_lengths, deterministic)
        enc_mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self.decoder(prev_tokens, enc["encoder_out"], enc_mask, deterministic)
        return {"decoder_logits": logits, **enc}

    def encode(self, features, feat_lengths, deterministic: bool = True):
        return self.encoder(features, feat_lengths, deterministic)

    def extract_w2v_features(self, source, lengths, deterministic: bool = True):
        """Front-end features only — the transplant-parity probe point
        (reference loads the pretrained w2v here, s2t_w2v2_transformer.py:98)."""
        return self.encoder.w2v.extract_features(source, lengths, deterministic)

    def decode_step(self, tokens, cache, index, encoder_out, encoder_valid_mask,
                    cross_kv=None):
        return self.decoder.step(tokens, cache, index, encoder_out,
                                 encoder_valid_mask, cross_kv=cross_kv)

    def precompute_cross(self, encoder_out):
        return self.decoder.precompute_cross(encoder_out)

    def init_cache(self, batch_size: int, max_len: int):
        return self.decoder.init_cache(batch_size, max_len)


@register_model_architecture("s2t_w2v2_transformer", "s2t_w2v2_transformer")
@register_model_architecture("s2t_w2v2_transformer", "s2t_w2v2_transformer_base")
def s2t_w2v2_transformer_base(**kw) -> S2TW2V2Config:
    return S2TW2V2Config().replace(**kw)

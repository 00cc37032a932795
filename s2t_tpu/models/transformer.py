"""Text transformer for MT (+ CTC variant for NAST-on-text).

(reference: fairseq/models/transformer.py:52 (1,682 LoC) and
transformer_ctc.py:45 — encoder-decoder over token embeddings; the CTC
variant adds a target-vocabulary CTC head on the encoder for
non-autoregressive text translation.)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.attention import padding_bias
from s2t_tpu.modules.ctc_head import CTCHead
from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.modules.positional import fairseq_sinusoidal_encoding, relative_encoding
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class TransformerMTConfig:
    encoder_embed_dim: int = 512
    encoder_ffn_embed_dim: int = 2048
    encoder_layers: int = 6
    encoder_attention_heads: int = 8
    encoder_attention_type: str = "abs"
    encoder_normalize_before: bool = False  # fairseq MT default is post-norm
    encoder_learned_pos: bool = False
    decoder_embed_dim: int = 512
    decoder_ffn_embed_dim: int = 2048
    decoder_layers: int = 6
    decoder_attention_heads: int = 8
    decoder_normalize_before: bool = False
    decoder_learned_pos: bool = False
    share_decoder_input_output_embed: bool = True
    share_all_embeddings: bool = False
    no_scale_embedding: bool = False
    # post-embedding LayerNorm (reference: --layernorm-embedding, used by
    # BART/mBART; fairseq/models/transformer.py encoder/decoder flags)
    layernorm_embedding: bool = False
    # SE channel gate in encoder layers (reference: --squeeze-excitation)
    squeeze_excitation: bool = False
    # encoder DLCL (reference: modules/dlcl.py via --use-enc-dlcl; decoder
    # DLCL is not ported — same policy as the speech model)
    use_enc_dlcl: bool = False
    # Shaw clipped relative-key attention (reference:
    # relative_multihead_attention.py, wmt16 rpr.yaml: encoder/decoder
    # attention-type relative with max length 20)
    max_encoder_relative_length: int = 0
    max_decoder_relative_length: int = 0
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    activation_fn: str = "relu"
    # CTC variant (reference: transformer_ctc.py)
    use_ctc: bool = False
    inter_ctc_layers: Tuple[int, ...] = ()
    # token-level upsampling so CTC input length >= target length
    # (reference: transformer_ctc.py:328,723-760,823-860 — token ids are
    # repeated x ratio before embedding whenever CTC is on; the encoder
    # runs at the upsampled rate and the output is optionally pooled back
    # to the original length for the decoder)
    ctc_upsampling_ratio: int = 3
    ctc_out_downsampling: bool = False
    ctc_out_downsampling_method: str = "maxpooling"
    # sizes
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


class TransformerTextEncoder(nn.Module):
    cfg: TransformerMTConfig
    shared_embed: Optional[nn.Module] = None

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        if self.shared_embed is not None:
            self.embed_tokens = self.shared_embed
        else:
            self.embed_tokens = nn.Embed(
                cfg.src_vocab, cfg.encoder_embed_dim,
                embedding_init=nn.initializers.normal(cfg.encoder_embed_dim**-0.5),
                dtype=dt, name="embed_tokens",
            )
        if cfg.encoder_learned_pos:
            self.embed_positions = nn.Embed(
                cfg.max_source_positions + 2, cfg.encoder_embed_dim, dtype=dt,
                embedding_init=nn.initializers.normal(0.02),
                name="embed_positions",
            )
        if cfg.layernorm_embedding:
            self.emb_norm = nn.LayerNorm(dtype=dt, name="emb_norm")
        self.layers = [
            S2TEncoderLayer(
                cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim,
                cfg.encoder_attention_heads, cfg.dropout, cfg.attention_dropout,
                cfg.activation_dropout, cfg.activation_fn,
                cfg.encoder_normalize_before, cfg.encoder_attention_type,
                use_se=cfg.squeeze_excitation,
                max_relative_length=cfg.max_encoder_relative_length,
                dtype=dt, name=f"layer{i}",
            )
            for i in range(cfg.encoder_layers)
        ]
        if cfg.use_enc_dlcl:
            from s2t_tpu.modules.dlcl import DLCL

            self.dlcl = DLCL(cfg.encoder_layers, cfg.encoder_embed_dim,
                             dtype=dt, name="dlcl")
        if cfg.encoder_normalize_before:
            self.final_norm = nn.LayerNorm(dtype=dt, name="final_norm")
        if cfg.use_ctc:
            self.ctc_head = CTCHead(cfg.vocab_size, cfg.dropout, dtype=dt, name="ctc_head")
            if cfg.inter_ctc_layers:
                self.inter_ctc_norm = nn.LayerNorm(dtype=dt, name="inter_ctc_norm")
        self.drop = _FastDropout(cfg.dropout)

    def __call__(self, src_tokens, src_lengths=None, deterministic: bool = True):
        cfg = self.cfg
        if src_lengths is None:
            src_lengths = jnp.sum((src_tokens != cfg.pad_id).astype(jnp.int32), axis=1)
        org_lengths = src_lengths
        upsampled = cfg.use_ctc and cfg.ctc_upsampling_ratio > 1
        if upsampled:
            # repeat each token id x ratio (reference: transformer_ctc.py:835
            # 2-D branch); pads repeat into pads so the mask stays consistent
            src_tokens = jnp.repeat(src_tokens, cfg.ctc_upsampling_ratio, axis=1)
            src_lengths = src_lengths * cfg.ctc_upsampling_ratio
        x = self.embed_tokens(src_tokens)
        if not cfg.no_scale_embedding:
            x = x * jnp.sqrt(cfg.encoder_embed_dim).astype(x.dtype)
        T = x.shape[1]
        pos_emb = None
        if cfg.encoder_attention_type == "rel_pos":
            pos_emb = relative_encoding(T, cfg.encoder_embed_dim, x.dtype)
        elif cfg.encoder_learned_pos:
            # pad-aware positions (fairseq make_positions semantics)
            v = (src_tokens != cfg.pad_id).astype(jnp.int32)
            positions = jnp.cumsum(v, axis=1) * v + cfg.pad_id
            x = x + self.embed_positions(positions)
        else:
            x = x + fairseq_sinusoidal_encoding(
                T, cfg.encoder_embed_dim, cfg.pad_id, x.dtype
            )[None]
        if cfg.layernorm_embedding:
            x = self.emb_norm(x)
        x = self.drop(x, deterministic=deterministic)
        valid = src_tokens != cfg.pad_id
        bias = padding_bias(valid, x.dtype)

        inter_ctc_logits = []
        history = [x] if cfg.use_enc_dlcl else None
        for i, layer in enumerate(self.layers):
            if cfg.use_enc_dlcl:
                x = self.dlcl.combine(history, i)
            x = layer(x, valid, bias, pos_emb, deterministic)
            if cfg.use_enc_dlcl:
                history.append(x)
            if cfg.use_ctc and (i + 1) in cfg.inter_ctc_layers:
                logits = self.ctc_head(self.inter_ctc_norm(x), deterministic)
                inter_ctc_logits.append((i + 1, logits))
        if cfg.use_enc_dlcl:
            x = self.dlcl.combine(history, cfg.encoder_layers)
        if cfg.encoder_normalize_before:
            x = self.final_norm(x)
        ctc_logits = self.ctc_head(x, deterministic) if cfg.use_ctc else None
        ctc_lengths = src_lengths
        if upsampled and cfg.ctc_out_downsampling:
            # pool the encoder output back to the original rate for the
            # decoder; CTC logits stay at the upsampled rate (reference:
            # transformer_ctc.py:1006-1016 restores org padding mask)
            r = cfg.ctc_upsampling_ratio
            B, Tr, C = x.shape
            xr = x.reshape(B, Tr // r, r, C)
            m = cfg.ctc_out_downsampling_method
            if m == "maxpooling":
                x = jnp.max(xr, axis=2)
            elif m == "avgpooling":
                x = jnp.mean(xr, axis=2)
            else:  # "upsampling" / "interpolate": linear resize
                x = jax.image.resize(x, (B, Tr // r, C), method="linear")
            src_lengths = org_lengths
        return {
            "encoder_out": x,
            "encoder_lengths": src_lengths,
            "ctc_lengths": ctc_lengths,
            "ctc_logits": ctc_logits,
            "inter_ctc_logits": tuple(inter_ctc_logits),
            "xctc_logits": None,
            "inter_xctc_logits": (),
        }


@register_model("transformer")
class TransformerModel(nn.Module):
    cfg: TransformerMTConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = TransformerTextEncoder(cfg, name="encoder")
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size, embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim, num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads, dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout, activation=cfg.activation_fn,
            normalize_before=cfg.decoder_normalize_before,
            share_input_output_embed=cfg.share_decoder_input_output_embed,
            no_scale_embedding=cfg.no_scale_embedding,
            learned_pos=cfg.decoder_learned_pos,
            layernorm_embedding=cfg.layernorm_embedding,
            max_positions=cfg.max_target_positions, pad_id=cfg.pad_id,
            self_attn_type=(
                "relative" if cfg.max_decoder_relative_length > 0 else "abs"
            ),
            max_relative_length=cfg.max_decoder_relative_length,
            dtype=cfg.dtype, name="decoder",
        )

    def __call__(self, src_tokens, src_lengths, prev_tokens, deterministic=True):
        enc = self.encoder(src_tokens, src_lengths, deterministic)
        enc_mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self.decoder(prev_tokens, enc["encoder_out"], enc_mask, deterministic)
        return {"decoder_logits": logits, **enc}

    def encode(self, src_tokens, src_lengths, deterministic: bool = True):
        return self.encoder(src_tokens, src_lengths, deterministic)

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


@register_model_architecture("transformer", "transformer")
def transformer_base(**kw) -> TransformerMTConfig:
    return TransformerMTConfig().replace(**kw)


@register_model_architecture("transformer", "transformer_iwslt_de_en")
def transformer_iwslt(**kw) -> TransformerMTConfig:
    return TransformerMTConfig(
        encoder_embed_dim=512, encoder_ffn_embed_dim=1024,
        encoder_attention_heads=4, decoder_embed_dim=512,
        decoder_ffn_embed_dim=1024, decoder_attention_heads=4,
    ).replace(**kw)


@register_model_architecture("transformer", "transformer_wmt_en_de_big")
def transformer_big(**kw) -> TransformerMTConfig:
    return TransformerMTConfig(
        encoder_embed_dim=1024, encoder_ffn_embed_dim=4096,
        encoder_attention_heads=16, decoder_embed_dim=1024,
        decoder_ffn_embed_dim=4096, decoder_attention_heads=16,
        dropout=0.3,
    ).replace(**kw)


@register_model_architecture("transformer", "transformer_wmt_en_de_big_t2t")
def transformer_big_t2t(**kw) -> TransformerMTConfig:
    """tensor2tensor variant: pre-norm + attention/relu dropout
    (reference: models/transformer.py transformer_wmt_en_de_big_t2t)."""
    return transformer_big(
        encoder_normalize_before=True, decoder_normalize_before=True,
        attention_dropout=0.1, activation_dropout=0.1,
    ).replace(**kw)


@register_model_architecture("transformer", "transformer_ctc")
def transformer_ctc(**kw) -> TransformerMTConfig:
    """MT with target-vocab CTC on the encoder (reference: transformer_ctc.py)."""
    return TransformerMTConfig(
        use_ctc=True, encoder_normalize_before=True, decoder_normalize_before=True,
    ).replace(**kw)

"""BART: denoising sequence-to-sequence pretraining model.

(reference: fairseq/models/bart/model.py:26-384 — a transformer with shared
embeddings, learned positions, post-embedding LayerNorm, GELU, plus
classification heads pooled at the final EOS decoder state; trained by
tasks/denoising.py and fine-tuned for classification/translation.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.models.transformer import TransformerMTConfig, TransformerTextEncoder
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class BARTConfig(TransformerMTConfig):
    num_classes: int = 0  # >0 adds a sentence classification head
    pooler_dropout: float = 0.0


@register_model("bart")
class BARTModel(nn.Module):
    cfg: BARTConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        # one embedding table drives encoder input, decoder input, and the
        # output projection (reference: --share-all-embeddings in bart archs)
        self.shared = nn.Embed(
            cfg.vocab_size, cfg.encoder_embed_dim,
            embedding_init=nn.initializers.normal(cfg.encoder_embed_dim**-0.5),
            dtype=dt, name="shared",
        )
        self.encoder = TransformerTextEncoder(
            cfg, shared_embed=self.shared, name="encoder"
        )
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size, embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim, num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads, dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout,
            activation=cfg.activation_fn,
            normalize_before=cfg.decoder_normalize_before,
            share_input_output_embed=True,
            no_scale_embedding=cfg.no_scale_embedding,
            learned_pos=cfg.decoder_learned_pos,
            layernorm_embedding=cfg.layernorm_embedding,
            shared_embed=self.shared,
            max_positions=cfg.max_target_positions, pad_id=cfg.pad_id,
            dtype=dt, name="decoder",
        )
        if cfg.num_classes > 0:
            # BARTClassificationHead (reference: bart/model.py:303)
            self.cls_dense = nn.Dense(cfg.encoder_embed_dim, dtype=dt,
                                      name="cls_dense")
            self.cls_out = nn.Dense(cfg.num_classes, dtype=dt, name="cls_out")
            self.cls_drop = _FastDropout(cfg.pooler_dropout)

    def __call__(self, src_tokens, src_lengths, prev_tokens,
                 deterministic=True, classification=False) -> Dict[str, Any]:
        enc = self.encoder(src_tokens, src_lengths, deterministic)
        enc_mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self.decoder(prev_tokens, enc["encoder_out"], enc_mask,
                              deterministic)
        out = {"decoder_logits": logits, **enc}
        if classification and self.cfg.num_classes > 0:
            out["cls_logits"] = self._classify_from(
                enc, src_tokens, src_lengths, deterministic
            )
        return out

    def _classify_from(self, enc, src_tokens, src_lengths, deterministic):
        """Sentence classification: decoder features pooled at the final EOS
        position (reference: bart/model.py forward classification path —
        source tokens feed both encoder and decoder)."""
        enc_mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        feats = self.decoder.forward_features(
            src_tokens, enc["encoder_out"], enc_mask, deterministic
        )  # (B, T, D)
        last = jnp.maximum(src_lengths - 1, 0)  # final real token (EOS)
        pooled = jnp.take_along_axis(
            feats, last[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        h = jnp.tanh(self.cls_dense(
            self.cls_drop(pooled, deterministic=deterministic)
        ))
        return self.cls_out(self.cls_drop(h, deterministic=deterministic))

    def classify(self, src_tokens, src_lengths, deterministic: bool = True):
        enc = self.encoder(src_tokens, src_lengths, deterministic)
        return self._classify_from(enc, src_tokens, src_lengths, deterministic)

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


@register_model_architecture("bart", "bart_base")
def bart_base(**kw) -> BARTConfig:
    return BARTConfig(
        encoder_embed_dim=768, encoder_ffn_embed_dim=3072, encoder_layers=6,
        encoder_attention_heads=12, decoder_embed_dim=768,
        decoder_ffn_embed_dim=3072, decoder_layers=6,
        decoder_attention_heads=12, activation_fn="gelu",
        encoder_learned_pos=True, decoder_learned_pos=True,
        layernorm_embedding=True, no_scale_embedding=True,
        share_all_embeddings=True, encoder_normalize_before=False,
        decoder_normalize_before=False,
    ).replace(**kw)


@register_model_architecture("bart", "bart_large")
def bart_large(**kw) -> BARTConfig:
    return BARTConfig(
        encoder_embed_dim=1024, encoder_ffn_embed_dim=4096, encoder_layers=12,
        encoder_attention_heads=16, decoder_embed_dim=1024,
        decoder_ffn_embed_dim=4096, decoder_layers=12,
        decoder_attention_heads=16, activation_fn="gelu",
        encoder_learned_pos=True, decoder_learned_pos=True,
        layernorm_embedding=True, no_scale_embedding=True,
        share_all_embeddings=True, encoder_normalize_before=False,
        decoder_normalize_before=False,
    ).replace(**kw)


@register_model_architecture("bart", "mbart_large")
def mbart_large(**kw) -> BARTConfig:
    """mBART: pre-norm variant used for multilingual denoising + MT
    fine-tuning (reference: translation_from_pretrained_bart)."""
    return BARTConfig(
        encoder_embed_dim=1024, encoder_ffn_embed_dim=4096, encoder_layers=12,
        encoder_attention_heads=16, decoder_embed_dim=1024,
        decoder_ffn_embed_dim=4096, decoder_layers=12,
        decoder_attention_heads=16, activation_fn="gelu",
        encoder_learned_pos=True, decoder_learned_pos=True,
        layernorm_embedding=True, no_scale_embedding=False,
        share_all_embeddings=True, encoder_normalize_before=True,
        decoder_normalize_before=True,
    ).replace(**kw)

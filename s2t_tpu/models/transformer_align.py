"""Transformer with supervised attention alignment (Garg et al. 2019).

(reference: fairseq/models/transformer_align.py — a TransformerModel whose
forward also returns the cross-attention of one decoder layer, trained with
label_smoothed_cross_entropy_with_alignment over word-aligned bitext loaded
by --load-alignments.)

TPU design: attention probabilities are captured through flax's
"intermediates" collection (the attention module sows its pre-dropout
weights); the task forward applies the model with
mutable=["intermediates"] and exposes the chosen layer's head-averaged
cross-attention as ``model_out["align_attn"]`` for the criterion.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from s2t_tpu.models.transformer import TransformerModel, TransformerMTConfig
from s2t_tpu.registry import register_model, register_model_architecture


@dataclass(frozen=True)
class TransformerAlignConfig(TransformerMTConfig):
    # decoder layer whose cross-attention carries the alignment (reference
    # --alignment-layer); negative = from the end
    alignment_layer: int = -1
    # average the first N heads (reference --alignment-heads)
    alignment_heads: int = 1


@register_model("transformer_align")
class TransformerAlignModel(TransformerModel):
    cfg: TransformerAlignConfig


def extract_alignment_attn(intermediates, cfg) -> jnp.ndarray:
    """Pull the alignment layer's cross-attn out of the sown intermediates.

    Returns (B, U, S) probabilities averaged over the first
    ``alignment_heads`` heads."""
    layer = cfg.alignment_layer
    if layer < 0:
        layer = cfg.decoder_layers + layer
    w = intermediates["decoder"][f"layer{layer}"]["cross_attn"][
        "attn_weights"
    ][0]  # (B, H, U, S)
    h = max(1, min(cfg.alignment_heads, w.shape[1]))
    return jnp.mean(w[:, :h], axis=1)


@register_model_architecture("transformer_align", "transformer_align")
def transformer_align(**kw) -> TransformerAlignConfig:
    return TransformerAlignConfig().replace(**kw)


@register_model_architecture("transformer_align", "transformer_wmt_en_de_big_align")
def transformer_align_big(**kw) -> TransformerAlignConfig:
    return TransformerAlignConfig(
        encoder_embed_dim=1024, encoder_ffn_embed_dim=4096,
        encoder_attention_heads=16, decoder_embed_dim=1024,
        decoder_ffn_embed_dim=4096, decoder_attention_heads=16,
        dropout=0.3, alignment_layer=4,
    ).replace(**kw)

"""CMLM — Conditional Masked Language Model NAT (Mask-Predict).

(reference: fairseq/models/nat/cmlm_transformer.py:27 CMLMNATransformerModel
over models/nat/nonautoregressive_transformer.py NATransformerModel —
bidirectional decoder fills <unk>-masked target positions in parallel;
a 256-way length head over mean-pooled encoder states predicts |y|
(:235,368-400); decode = iterative mask-predict with skeptical re-masking.)

TPU design: the decoder is the shared TransformerDecoder with causal=False;
the refinement loop lives in inference/iterative_refinement.py as a jitted
lax.fori_loop over a fixed-width canvas.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.models.transformer import TransformerMTConfig, TransformerTextEncoder
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask


@dataclass(frozen=True)
class CMLMConfig(TransformerMTConfig):
    length_loss_factor: float = 0.1
    max_length_classes: int = 256  # length head arity (reference clamps 0..255)
    unk_id: int = 3
    bos_id: int = 0
    eos_id: int = 2


@register_model("cmlm_transformer")
class CMLMTransformerModel(nn.Module):
    cfg: CMLMConfig

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
            max_positions=cfg.max_target_positions, pad_id=cfg.pad_id,
            dtype=cfg.dtype, causal=False, name="decoder",
        )
        self.length_head = nn.Dense(
            cfg.max_length_classes, dtype=cfg.dtype, name="length_head"
        )

    def _length_logits(self, enc_out, enc_valid):
        # masked mean-pool over source states (reference pools enc_feats mean)
        m = enc_valid[..., None].astype(enc_out.dtype)
        pooled = jnp.sum(enc_out * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        return self.length_head(pooled)

    def __call__(
        self,
        src_tokens: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_tokens: jnp.ndarray,
        tgt_tokens: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        enc = self.encoder(src_tokens, src_lengths, deterministic)
        enc_valid = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self.decoder(prev_tokens, enc["encoder_out"], enc_valid, deterministic)
        length_logits = self._length_logits(enc["encoder_out"], enc_valid)
        out: Dict[str, Any] = {
            "word_ins_logits": logits,
            "word_ins_mask": prev_tokens == cfg.unk_id,
            "length_logits": length_logits,
            **enc,
        }
        if tgt_tokens is not None:
            tgt_len = jnp.sum((tgt_tokens != cfg.pad_id).astype(jnp.int32), axis=1)
            out["length_tgt"] = jnp.clip(tgt_len, 0, cfg.max_length_classes - 1)
        return out

    # -- refinement-generator hooks ------------------------------------------ #
    def encode(self, src_tokens, src_lengths, deterministic: bool = True):
        return self.encoder(src_tokens, src_lengths, deterministic)

    def predict_length(self, encoder_out, encoder_valid_mask):
        """Greedy length prediction (reference :393-400)."""
        logits = self._length_logits(encoder_out, encoder_valid_mask)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def nat_decode(self, prev_tokens, encoder_out, encoder_valid_mask):
        """Fill all positions in parallel: (B, T) tokens -> (B, T, V) logits."""
        return self.decoder(prev_tokens, encoder_out, encoder_valid_mask, True)


@register_model_architecture("cmlm_transformer", "cmlm_transformer")
def cmlm_transformer(**kw) -> CMLMConfig:
    return CMLMConfig(
        encoder_normalize_before=False, decoder_normalize_before=False,
    ).replace(**kw)


@register_model_architecture("cmlm_transformer", "cmlm_transformer_small")
def cmlm_transformer_small(**kw) -> CMLMConfig:
    return CMLMConfig(
        encoder_embed_dim=256, encoder_ffn_embed_dim=1024,
        encoder_attention_heads=4, decoder_embed_dim=256,
        decoder_ffn_embed_dim=1024, decoder_attention_heads=4,
    ).replace(**kw)

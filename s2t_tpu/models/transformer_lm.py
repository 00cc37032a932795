"""Decoder-only transformer language model.

(reference: fairseq/models/transformer_lm.py:172 — used for eval_lm and
shallow-fusion decoding (--lm-path/--lm-weight in SequenceGenerator).)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture


@dataclass(frozen=True)
class TransformerLMConfig:
    decoder_embed_dim: int = 512
    decoder_ffn_embed_dim: int = 2048
    decoder_layers: int = 6
    decoder_attention_heads: int = 8
    decoder_normalize_before: bool = True
    decoder_learned_pos: bool = False
    share_decoder_input_output_embed: bool = True
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    activation_fn: str = "relu"
    vocab_size: int = 1000
    max_target_positions: int = 1024
    pad_id: int = 1
    # clustered output layer (reference: modules/adaptive_softmax.py,
    # criterions/adaptive_loss.py); e.g. (2000, 10000)
    adaptive_softmax_cutoff: Tuple[int, ...] = ()
    adaptive_softmax_factor: float = 4.0
    # clustered input embeddings (reference: modules/adaptive_input.py,
    # Baevski & Auli — transformer_lm_wiki103 pairs it with adaptive softmax)
    adaptive_input_cutoff: Tuple[int, ...] = ()
    adaptive_input_factor: float = 4.0
    dtype_str: str = "float32"

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32


@register_model("transformer_lm")
class TransformerLM(nn.Module):
    cfg: TransformerLMConfig

    def setup(self):
        cfg = self.cfg
        adaptive_embed = None
        share_io = cfg.share_decoder_input_output_embed
        if cfg.adaptive_input_cutoff:
            from s2t_tpu.modules.adaptive_softmax import AdaptiveInput

            adaptive_embed = AdaptiveInput(
                cfg.vocab_size, cfg.adaptive_input_cutoff,
                cfg.decoder_embed_dim, cfg.adaptive_input_factor,
                cfg.dtype, name="adaptive_embed",
            )
            share_io = False  # no dense table to tie; pair with adaptive softmax
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size, embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim, num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads, dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout, activation=cfg.activation_fn,
            normalize_before=cfg.decoder_normalize_before,
            share_input_output_embed=share_io,
            learned_pos=cfg.decoder_learned_pos,
            max_positions=cfg.max_target_positions, pad_id=cfg.pad_id,
            dtype=cfg.dtype, no_cross_attention=True,
            shared_embed=adaptive_embed, name="decoder",
        )
        if cfg.adaptive_softmax_cutoff:
            from s2t_tpu.modules.adaptive_softmax import AdaptiveSoftmax

            self.adaptive = AdaptiveSoftmax(
                cfg.vocab_size, cfg.adaptive_softmax_cutoff,
                cfg.decoder_embed_dim, cfg.adaptive_softmax_factor,
                cfg.dtype, name="adaptive",
            )

    def __call__(self, prev_tokens, deterministic: bool = True,
                 targets: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
        B, U = prev_tokens.shape
        dummy_enc = jnp.zeros((B, 1, self.cfg.decoder_embed_dim), self.cfg.dtype)
        dummy_mask = jnp.zeros((B, 1), bool)
        if self.cfg.adaptive_softmax_cutoff:
            feats = self.decoder.forward_features(
                prev_tokens, dummy_enc, dummy_mask, deterministic
            )
            out: Dict[str, Any] = {"decoder_features": feats}
            if targets is not None:  # efficient training path
                out["target_logprob"] = self.adaptive.target_logprob(feats, targets)
                out["decoder_logits"] = None
            else:  # eval/scoring: full distribution
                out["decoder_logits"] = self.adaptive.log_probs(feats)
                out["logits_are_log_probs"] = True
            return out
        logits = self.decoder(prev_tokens, dummy_enc, dummy_mask, deterministic)
        return {"decoder_logits": logits}

    def decode_step(self, tokens, cache, index):
        B = tokens.shape[0]
        dummy_enc = jnp.zeros((B, 1, self.cfg.decoder_embed_dim), self.cfg.dtype)
        dummy_mask = jnp.zeros((B, 1), bool)
        if self.cfg.adaptive_softmax_cutoff:
            raise NotImplementedError(
                "adaptive-softmax LMs are for training/eval_lm; use a softmax "
                "LM for shallow fusion"
            )
        return self.decoder.step(tokens, cache, index, dummy_enc, dummy_mask)

    def init_cache(self, batch_size: int, max_len: int):
        return self.decoder.init_cache(batch_size, max_len)


@register_model_architecture("transformer_lm", "transformer_lm")
def transformer_lm_base(**kw) -> TransformerLMConfig:
    return TransformerLMConfig().replace(**kw)


@register_model_architecture("transformer_lm", "transformer_lm_big")
def transformer_lm_big(**kw) -> TransformerLMConfig:
    return TransformerLMConfig(
        decoder_embed_dim=1024, decoder_ffn_embed_dim=4096,
        decoder_attention_heads=16, decoder_layers=12,
    ).replace(**kw)


@register_model_architecture("transformer_lm", "transformer_lm_wiki103")
@register_model_architecture("transformer_lm", "transformer_lm_baevski_wiki103")
def transformer_lm_wiki103(**kw) -> TransformerLMConfig:
    """Adaptive-input + adaptive-softmax LM (reference:
    transformer_lm.py transformer_lm_baevski_wiki103 — Baevski & Auli)."""
    return TransformerLMConfig(
        decoder_embed_dim=1024, decoder_ffn_embed_dim=4096,
        decoder_attention_heads=8, decoder_layers=16, dropout=0.3,
        adaptive_softmax_cutoff=(20000, 60000),
        adaptive_input_cutoff=(20000, 60000),
    ).replace(**kw)

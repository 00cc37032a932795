"""GPT-2 decoder LM with Hugging Face checkpoint import.

(reference: fairseq/models/huggingface/hf_gpt2.py:26-168 — wraps a
transformers GPT2LMHeadModel behind the FairseqIncrementalDecoder API so
GPT-2 can be used for language modeling / fusion.)

TPU-native redesign: instead of wrapping torch modules, the architecture is
declared natively (pre-LN causal transformer, learned positions, tanh-GELU,
tied output, no embedding scaling — exactly GPT-2's graph) on this
framework's TransformerDecoder, and HF checkpoints are *imported* into the
flax pytree by ``s2t_tpu.interop.hf_import.convert_gpt2_state`` — so the
decode path is the same jitted beam/score step every other LM uses.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture


@dataclass(frozen=True)
class HFGPT2Config:
    decoder_embed_dim: int = 768
    decoder_ffn_embed_dim: int = 3072
    decoder_layers: int = 12
    decoder_attention_heads: int = 12
    dropout: float = 0.1
    attention_dropout: float = 0.1
    vocab_size: int = 50257
    max_target_positions: int = 1024
    pad_id: int = 1
    dtype_str: str = "float32"

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32


@register_model("hf_gpt2")
class HFGPT2Model(nn.Module):
    cfg: HFGPT2Config

    def setup(self):
        cfg = self.cfg
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size, embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim, num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads, dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout, activation_dropout=0.0,
            activation="gelu_tanh",  # HF "gelu_new" (tanh approximation)
            normalize_before=True, share_input_output_embed=True,
            no_scale_embedding=True, learned_pos=True,
            max_positions=cfg.max_target_positions, pad_id=cfg.pad_id,
            dtype=cfg.dtype, no_cross_attention=True, name="decoder",
        )

    def __call__(self, prev_tokens, deterministic: bool = True,
                 targets: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
        B = prev_tokens.shape[0]
        dummy_enc = jnp.zeros((B, 1, self.cfg.decoder_embed_dim), self.cfg.dtype)
        dummy_mask = jnp.zeros((B, 1), bool)
        logits = self.decoder(prev_tokens, dummy_enc, dummy_mask, deterministic)
        return {"decoder_logits": logits}

    def decode_step(self, tokens, cache, index):
        B = tokens.shape[0]
        dummy_enc = jnp.zeros((B, 1, self.cfg.decoder_embed_dim), self.cfg.dtype)
        dummy_mask = jnp.zeros((B, 1), bool)
        return self.decoder.step(tokens, cache, index, dummy_enc, dummy_mask)

    def init_cache(self, batch_size: int, max_len: int):
        return self.decoder.init_cache(batch_size, max_len)


@register_model_architecture("hf_gpt2", "hf_gpt2")
def hf_gpt2(**kw) -> HFGPT2Config:
    return HFGPT2Config().replace(**kw)


@register_model_architecture("hf_gpt2", "hf_gpt2_medium")
def hf_gpt2_medium(**kw) -> HFGPT2Config:
    return HFGPT2Config(
        decoder_embed_dim=1024, decoder_ffn_embed_dim=4096,
        decoder_layers=24, decoder_attention_heads=16,
    ).replace(**kw)


@register_model_architecture("hf_gpt2", "hf_gpt2_large")
def hf_gpt2_large(**kw) -> HFGPT2Config:
    return HFGPT2Config(
        decoder_embed_dim=1280, decoder_ffn_embed_dim=5120,
        decoder_layers=36, decoder_attention_heads=20,
    ).replace(**kw)

"""Transformer decoder with explicit incremental KV cache.

(reference: fairseq/models/transformer.py TransformerDecoder +
TransformerDecoderScriptable at s2t_transformer.py:2211.)

Two entry points:
  * ``__call__``     — full teacher-forced forward (training/validation)
  * ``step``         — one incremental decode step given an explicit cache
                       pytree; used inside jitted lax.scan beam search.
``init_cache`` builds the zeroed cache for a given batch/beam size.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.attention import causal_bias, padding_bias
from s2t_tpu.modules.layers import TransformerDecoderLayer
from s2t_tpu.modules.positional import fairseq_sinusoidal_encoding
from s2t_tpu.modules.dropout import Dropout as _FastDropout


class TransformerDecoder(nn.Module):
    vocab_size: int
    embed_dim: int = 256
    ffn_dim: int = 2048
    num_layers: int = 6
    num_heads: int = 4
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    share_input_output_embed: bool = True
    no_scale_embedding: bool = False
    learned_pos: bool = False
    max_positions: int = 1024
    pad_id: int = 1
    dtype: jnp.dtype = jnp.float32
    no_cross_attention: bool = False  # decoder-only LM mode
    # False: full bidirectional self-attention (NAT decoders — CMLM/LevT fill
    # all positions in parallel; reference: models/nat/ NATransformerDecoder)
    causal: bool = True
    # post-embedding LayerNorm (--layernorm-embedding, BART/mBART)
    layernorm_embedding: bool = False
    # share token embeddings with another module (--share-all-embeddings):
    # the parent creates one nn.Embed and passes it to encoder and decoder
    shared_embed: Optional[nn.Module] = None
    # "abs" | "relative" (Shaw clipped relative-key) self-attention
    self_attn_type: str = "abs"
    max_relative_length: int = 0
    # second-stream cross-attention league (dual/multibranch decoders;
    # reference: transformer_s2.py TransformerS2Decoder + the
    # decoder-collaboration-mode / decoder-league-* args)
    collaboration_mode: str = "none"
    league_s1_ratio: float = 0.5
    league_s2_ratio: float = 0.5

    def setup(self):
        if self.shared_embed is not None:
            self.embed_tokens = self.shared_embed
        else:
            self.embed_tokens = nn.Embed(
                self.vocab_size,
                self.embed_dim,
                embedding_init=nn.initializers.normal(self.embed_dim**-0.5),
                dtype=self.dtype,
                name="embed_tokens",
            )
        if self.layernorm_embedding:
            self.emb_norm = nn.LayerNorm(dtype=self.dtype, name="emb_norm")
        if self.learned_pos:
            self.embed_positions = nn.Embed(
                self.max_positions, self.embed_dim, dtype=self.dtype,
                name="embed_positions",
            )
        self.layers = [
            TransformerDecoderLayer(
                self.embed_dim, self.ffn_dim, self.num_heads, self.dropout,
                self.attention_dropout, self.activation_dropout, self.activation,
                self.normalize_before, self.dtype,
                has_cross_attention=not self.no_cross_attention,
                self_attn_type=self.self_attn_type,
                max_relative_length=self.max_relative_length,
                collaboration_mode=self.collaboration_mode,
                league_s1_ratio=self.league_s1_ratio,
                league_s2_ratio=self.league_s2_ratio, name=f"layer{i}",
            )
            for i in range(self.num_layers)
        ]
        if self.normalize_before:
            self.final_norm = nn.LayerNorm(dtype=self.dtype, name="final_norm")
        if not self.share_input_output_embed:
            self.output_proj = nn.Dense(
                self.vocab_size, use_bias=False, dtype=self.dtype, name="output_proj"
            )
        self.drop = _FastDropout(self.dropout)

    def _embed(self, tokens: jnp.ndarray, pos_offset) -> jnp.ndarray:
        x = self.embed_tokens(tokens)
        if not self.no_scale_embedding:
            x = x * jnp.sqrt(self.embed_dim).astype(x.dtype)
        T = tokens.shape[1]
        if self.learned_pos:
            pos = pos_offset + jnp.arange(T)
            x = x + self.embed_positions(pos)[None]
        else:
            pe = fairseq_sinusoidal_encoding(self.max_positions, self.embed_dim,
                                             self.pad_id, x.dtype)
            x = x + jax.lax.dynamic_slice_in_dim(pe, pos_offset, T, axis=0)[None]
        if self.layernorm_embedding:
            x = self.emb_norm(x)
        return x

    def _output(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.share_input_output_embed:
            return self.embed_tokens.attend(x)
        return self.output_proj(x)

    def forward_features(
        self,
        prev_tokens: jnp.ndarray,
        encoder_out: jnp.ndarray,
        encoder_valid_mask: jnp.ndarray,
        deterministic: bool = True,
        mix: Optional[dict] = None,
        s2_out: Optional[jnp.ndarray] = None,
        s2_valid_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Hidden states before the output projection: (B, U, D).  Used by
        NAT models whose extra heads (deletion / mask-insertion) read decoder
        features (reference: levenshtein_transformer.py extract_features).

        ``mix`` = {"tokens2", "coef", "flag"} blends the embeddings of two
        target sequences for encoder-mixup rows (the reference's
        --inter-mixup-decoder-emb path, s2t_transformer.py:2396)."""
        B, U = prev_tokens.shape
        x = self._embed(prev_tokens, 0)
        tgt_valid = prev_tokens != self.pad_id
        if mix is not None:
            x2 = self._embed(mix["tokens2"], 0)
            c = mix["coef"][:, None, None].astype(x.dtype)
            mixed = c * x + (1.0 - c) * x2
            x = jnp.where(mix["flag"][:, None, None], mixed, x)
            tgt_valid = tgt_valid | (mix["tokens2"] != self.pad_id)
        x = self.drop(x, deterministic=deterministic)
        self_bias = causal_bias(U, x.dtype) if self.causal else 0.0
        self_bias = self_bias + padding_bias(tgt_valid, x.dtype)
        cross_bias = padding_bias(encoder_valid_mask, x.dtype)
        s2_bias = (padding_bias(s2_valid_mask, x.dtype)
                   if s2_valid_mask is not None else None)
        for layer in self.layers:
            x, _ = layer(
                x, encoder_out, self_bias, cross_bias,
                deterministic=deterministic, s2_out=s2_out, s2_bias=s2_bias,
            )
        if self.normalize_before:
            x = self.final_norm(x)
        return x

    def output_logits(self, features: jnp.ndarray) -> jnp.ndarray:
        return self._output(features)

    def __call__(
        self,
        prev_tokens: jnp.ndarray,
        encoder_out: jnp.ndarray,
        encoder_valid_mask: jnp.ndarray,
        deterministic: bool = True,
        mix: Optional[dict] = None,
        s2_out: Optional[jnp.ndarray] = None,
        s2_valid_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Teacher-forced forward: (B, U) tokens -> (B, U, V) logits."""
        x = self.forward_features(
            prev_tokens, encoder_out, encoder_valid_mask, deterministic, mix,
            s2_out=s2_out, s2_valid_mask=s2_valid_mask,
        )
        return self._output(x)

    def init_cache(self, batch_size: int, max_len: int,
                   kv_int8: bool = False) -> dict:
        """Zeroed KV cache pytree: per layer (B, max_len, H, Dh) k/v arrays.

        ``kv_int8``: int8 storage with per-(position, head) bf16 scales —
        halves the beam loop's dominant cache-reorder traffic
        (modules/attention.py int8 branch; generation.kv_cache_dtype)."""
        head_dim = self.embed_dim // self.num_heads
        shape = (batch_size, max_len, self.num_heads, head_dim)
        if kv_int8:
            return {
                f"layer{i}": {
                    "k": jnp.zeros(shape, jnp.int8),
                    "k_scale": jnp.zeros(shape[:3], jnp.bfloat16),
                    "v": jnp.zeros(shape, jnp.int8),
                    "v_scale": jnp.zeros(shape[:3], jnp.bfloat16),
                }
                for i in range(self.num_layers)
            }
        return {
            f"layer{i}": {
                "k": jnp.zeros(shape, self.dtype),
                "v": jnp.zeros(shape, self.dtype),
            }
            for i in range(self.num_layers)
        }

    def precompute_cross(self, encoder_out: jnp.ndarray):
        """Per-layer static cross-attention K/V projected once (the
        reference's static_kv incremental caching).  NOTE: on TPU the beam
        decode loop is HBM-bandwidth-bound, and recomputing K/V from the one
        shared encoder-out buffer reads half the bytes of loading cached K+V
        (measured on v5e: 1241x vs 943x RTF) — so the generator defaults to
        recompute and this path is opt-in for bandwidth-rich regimes."""
        if self.no_cross_attention:
            return ()
        return tuple(layer.cross_kv(encoder_out) for layer in self.layers)

    def step(
        self,
        tokens: jnp.ndarray,
        cache: dict,
        index: jnp.ndarray,
        encoder_out: jnp.ndarray,
        encoder_valid_mask: jnp.ndarray,
        cross_kv=None,
        ancestry=None,
    ) -> Tuple[jnp.ndarray, dict]:
        """One decode step: (B, 1) tokens at position ``index`` -> (B, V) logits.

        The causal structure comes from the cache-index mask inside
        MultiHeadAttention; dropout is always off here (inference).
        ``cross_kv``: optional output of ``precompute_cross`` — skips the
        per-step encoder K/V projections.
        """
        x = self._embed(tokens, index)
        cross_bias = padding_bias(encoder_valid_mask, x.dtype)
        anc_eff = None
        if ancestry is not None:
            # this step's row is written at each beam's OWN slot
            K = ancestry.shape[1]
            anc_eff = jax.lax.dynamic_update_slice_in_dim(
                ancestry,
                jnp.broadcast_to(
                    jnp.arange(K, dtype=ancestry.dtype)[None, :, None],
                    (ancestry.shape[0], K, 1),
                ),
                index, axis=2,
            )
        new_cache = {}
        for i, layer in enumerate(self.layers):
            x, lc = layer(
                x, encoder_out, None, cross_bias,
                deterministic=True, cache=cache[f"layer{i}"], cache_index=index,
                enc_kv=None if cross_kv is None else cross_kv[i],
                cache_ancestry=anc_eff,
            )
            new_cache[f"layer{i}"] = lc
        if self.normalize_before:
            x = self.final_norm(x)
        return self._output(x)[:, 0], new_cache

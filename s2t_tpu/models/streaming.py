"""Streaming speech encoder — Emformer-style block processing.

(reference: fairseq/models/speech_to_text/modules/emformer.py (1,837 LoC)
and augmented_memory_attention.py — efficient-memory transformer for
simultaneous/streaming ST: audio arrives in fixed segments; each segment
attends to (i) a bank of memory vectors summarising all past segments,
(ii) a short left-context window, (iii) itself + a small right-context
lookahead.  Latency is bounded by segment+lookahead length.)

TPU design: segments are a static reshape, the cross-segment recurrence
(memory bank + left-context cache) is a lax.scan, and each scan step is a
dense batched attention over [memory | left | segment | right] keys — all
static shapes.  A `streaming_step` method exposes the same computation one
segment at a time for online inference with carried state.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.attention import MultiHeadAttention
from s2t_tpu.modules.layers import FeedForward
from s2t_tpu.modules.subsampling import Conv1dSubsampling
from s2t_tpu.modules.ctc_head import CTCHead
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class EmformerConfig:
    input_feat_per_channel: int = 80
    input_channels: int = 1
    subsampling_layers: int = 2
    subsampling_filter: int = 1024
    subsampling_kernel: int = 5
    subsampling_stride: int = 2
    encoder_embed_dim: int = 256
    encoder_ffn_embed_dim: int = 2048
    encoder_layers: int = 12
    encoder_attention_heads: int = 4
    segment_size: int = 16      # frames per block (post-subsampling)
    left_context: int = 8       # frames of exact left context
    right_context: int = 4      # lookahead frames (adds latency)
    max_memory_size: int = 8    # memory bank slots (summaries of past blocks)
    # squash memory summaries through tanh (reference
    # augmented_memory_attention.py tanh_on_mem=True)
    memory_tanh: bool = False
    # mask keys whose attention prob falls this many stds below the
    # per-query mean (reference std_scale attention suppression); 0 = off
    attention_std_scale: float = 0.0
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation_fn: str = "relu"
    use_ctc: bool = True
    vocab_size: int = 1000
    src_vocab_size: int = -1
    max_source_positions: int = 6000
    max_target_positions: int = 1024
    pad_id: int = 1
    decoder_layers: int = 0  # encoder-only (CTC streaming ASR) by default
    dtype_str: str = "float32"

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def ctc_vocab_size(self):
        return self.src_vocab_size if self.src_vocab_size > 0 else self.vocab_size


class EmformerLayer(nn.Module):
    """One streaming layer: segment attends [memory | left | self+right]."""

    dim: int
    ffn_dim: int
    num_heads: int
    left_context: int
    max_memory: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation: str = "relu"
    memory_tanh: bool = False
    attention_std_scale: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.attn = MultiHeadAttention(
            self.dim, self.num_heads, self.attention_dropout, dtype=self.dtype,
            attention_std_scale=self.attention_std_scale, name="self_attn",
        )
        self.attn_norm = nn.LayerNorm(dtype=self.dtype, name="attn_norm")
        self.ffn = FeedForward(self.dim, self.ffn_dim, self.activation,
                               self.dropout, 0.0, self.dtype, name="ffn")
        self.ffn_norm = nn.LayerNorm(dtype=self.dtype, name="ffn_norm")
        self.drop = _FastDropout(self.dropout)

    def __call__(self, seg, state, seg_valid, deterministic: bool = True):
        """seg: (B, S+R, D) current segment (+lookahead).
        state = {"memory": (B, M, D), "memory_valid": (B, M),
                 "left": (B, L, D), "left_valid": (B, L)}.
        Returns (out (B, S+R, D), new_state) — new_state reflects only the
        segment part (lookahead frames never enter left context/memory)."""
        mem, left = state["memory"], state["left"]
        keys = jnp.concatenate([mem, left, seg], axis=1)
        kv_valid = jnp.concatenate(
            [state["memory_valid"], state["left_valid"], seg_valid], axis=1
        )
        bias = jnp.where(kv_valid[:, None, None, :], 0.0, -1e9).astype(seg.dtype)

        res = seg
        h = self.attn_norm(seg)
        hk = jnp.concatenate([mem, left, h], axis=1)
        h, _ = self.attn(h, hk, hk, bias, deterministic)
        x = res + self.drop(h, deterministic=deterministic)
        res = x
        h = self.ffn(self.ffn_norm(x), deterministic)
        x = res + self.drop(h, deterministic=deterministic)
        return x

    def new_state(self, state, seg_out, seg_in, seg_valid, S: int):
        return EmformerLayer.update_state(
            state, seg_out, seg_in, seg_valid, S, tanh=self.memory_tanh
        )

    @staticmethod
    def update_state(state, seg_out, seg_in, seg_valid, S: int,
                     tanh: bool = False):
        """Roll left-context and memory forward with this segment's S frames."""
        seg_main = seg_in[:, :S]
        valid_main = seg_valid[:, :S]
        L = state["left"].shape[1]
        left = jnp.concatenate([state["left"], seg_main], axis=1)[:, -L:]
        left_valid = jnp.concatenate(
            [state["left_valid"], valid_main], axis=1
        )[:, -L:]
        # memory slot = masked mean of the segment's OUTPUT frames
        m = valid_main[..., None].astype(seg_out.dtype)
        summary = jnp.sum(seg_out[:, :S] * m, axis=1, keepdims=True) / jnp.maximum(
            jnp.sum(m, axis=1, keepdims=True), 1.0
        )
        if tanh:
            # bounded memory values (reference tanh_on_mem): keeps the bank
            # stable over unbounded streams
            summary = jnp.tanh(summary)
        has = jnp.any(valid_main, axis=1, keepdims=True)
        memory = jnp.concatenate([state["memory"], summary], axis=1)[:, 1:]
        memory_valid = jnp.concatenate(
            [state["memory_valid"], has], axis=1
        )[:, 1:]
        return {"memory": memory, "memory_valid": memory_valid,
                "left": left, "left_valid": left_valid}


@register_model("emformer")
class EmformerModel(nn.Module):
    """Streaming CTC ASR encoder (reference: emformer.py + s2t streaming)."""

    cfg: EmformerConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        self.subsample = Conv1dSubsampling(
            cfg.subsampling_layers, cfg.subsampling_filter,
            cfg.encoder_embed_dim, cfg.subsampling_kernel,
            cfg.subsampling_stride, "none", "glu", True, dt, name="subsample",
        )
        self.layers = [
            EmformerLayer(
                cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim,
                cfg.encoder_attention_heads, cfg.left_context,
                cfg.max_memory_size, cfg.dropout, cfg.attention_dropout,
                cfg.activation_fn, memory_tanh=cfg.memory_tanh,
                attention_std_scale=cfg.attention_std_scale, dtype=dt,
                name=f"layer{i}",
            )
            for i in range(cfg.encoder_layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=dt, name="final_norm")
        if cfg.use_ctc:
            self.ctc_head = CTCHead(cfg.ctc_vocab_size, cfg.dropout, dtype=dt,
                                    name="ctc_head")
        self.drop = _FastDropout(cfg.dropout)

    def init_stream_state(self, batch_size: int):
        cfg = self.cfg
        D, L, M = cfg.encoder_embed_dim, cfg.left_context, cfg.max_memory_size
        one = {
            "memory": jnp.zeros((batch_size, M, D), cfg.dtype),
            "memory_valid": jnp.zeros((batch_size, M), bool),
            "left": jnp.zeros((batch_size, L, D), cfg.dtype),
            "left_valid": jnp.zeros((batch_size, L), bool),
        }
        return [dict(one) for _ in self.layers]

    def _process_segment(self, seg, seg_valid, states, deterministic):
        """One segment through all layers; returns (out, new_states)."""
        S = self.cfg.segment_size
        new_states = []
        x = seg
        for layer, st in zip(self.layers, states):
            y = layer(x, st, seg_valid, deterministic)
            new_states.append(layer.new_state(st, y, x, seg_valid, S))
            x = y
        return x, new_states

    def __call__(self, features, feat_lengths, deterministic: bool = True,
                 **kw) -> Dict[str, Any]:
        cfg = self.cfg
        x, lengths = self.subsample(features.astype(cfg.dtype), feat_lengths)
        x = x * jnp.sqrt(cfg.encoder_embed_dim).astype(x.dtype)
        x = self.drop(x, deterministic=deterministic)
        B, T, D = x.shape
        S, R = cfg.segment_size, cfg.right_context
        n_seg = -(-T // S)  # ceil
        pad_T = n_seg * S + R
        xp = jnp.pad(x, ((0, 0), (0, pad_T - T), (0, 0)))
        valid = lengths_to_mask(lengths, pad_T)

        # (N, B, S+R, D) segments with lookahead overlap
        def seg_slice(i):
            return (
                jax.lax.dynamic_slice_in_dim(xp, i * S, S + R, axis=1),
                jax.lax.dynamic_slice_in_dim(valid, i * S, S + R, axis=1),
            )

        segs, seg_valids = jax.vmap(seg_slice)(jnp.arange(n_seg))

        states = self.init_stream_state(B)

        # nn.scan over segments: ONE compiled segment step regardless of
        # audio length (a python loop unrolled n_seg x layers attention
        # blocks into the graph — compile time scaled linearly with T)
        def body(module, states, seg_and_valid):
            seg, seg_valid = seg_and_valid
            y, new_states = module._process_segment(
                seg, seg_valid, states, deterministic
            )
            return new_states, y[:, :S]

        scan = nn.scan(
            body, variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=0,
        )
        _, outs = scan(self, states, (segs, seg_valids))
        # (N, B, S, D) -> (B, N*S, D)
        x = jnp.moveaxis(outs, 0, 1).reshape(B, n_seg * S, D)[:, :T]
        x = self.final_norm(x)
        ctc_logits = self.ctc_head(x, deterministic) if cfg.use_ctc else None
        return {
            "encoder_out": x, "encoder_lengths": lengths,
            "ctc_logits": ctc_logits, "inter_ctc_logits": (),
            "xctc_logits": None, "inter_xctc_logits": (), "mixup": None,
        }

    def encode(self, features, feat_lengths, deterministic: bool = True):
        return self(features, feat_lengths, deterministic)

    def streaming_step(self, seg_features, states, deterministic: bool = True):
        """Online inference: one raw-feature segment -> (ctc_logits, states).

        seg_features must cover segment_size+right_context POST-subsampling
        frames (i.e. ~(S+R)*4 raw frames for the default conv stack)."""
        cfg = self.cfg
        B = seg_features.shape[0]
        lens = jnp.full((B,), seg_features.shape[1], jnp.int32)
        x, out_lens = self.subsample(seg_features.astype(cfg.dtype), lens)
        x = x * jnp.sqrt(cfg.encoder_embed_dim).astype(x.dtype)
        S, R = cfg.segment_size, cfg.right_context
        x = jnp.pad(x, ((0, 0), (0, max(S + R - x.shape[1], 0)), (0, 0)))[:, : S + R]
        seg_valid = jnp.arange(S + R)[None, :] < out_lens[:, None]
        y, states = self._process_segment(x, seg_valid, states, deterministic)
        y = self.final_norm(y[:, :S])
        logits = self.ctc_head(y, True) if cfg.use_ctc else None
        return logits, states


@register_model_architecture("emformer", "emformer")
@register_model_architecture("emformer", "emformer_s")
def emformer_s(**kw) -> EmformerConfig:
    return EmformerConfig().replace(**kw)

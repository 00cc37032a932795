"""Fully convolutional seq2seq (ConvS2S, Gehring et al. 2017).

(reference: fairseq/models/fconv.py:29-756 — FConvEncoder / FConvDecoder:
learned positional embeddings, GLU conv blocks with residuals, and per-layer
multi-step dot-product attention against the encoder states.)

TPU-native redesign notes:
  * Convolutions are expressed as window-unfold + one Dense per layer
    ((B, T, k*C) @ (k*C, 2C) -> GLU), which XLA fuses into a single MXU
    matmul per layer; the *same* Dense drives incremental decoding, where the
    cache is a rolling (B, k-1, C) window per layer — no separate conv
    kernels (the reference re-pads and re-slices torch convs per step).
  * Weight normalization (a CUDA-era conditioning trick) is intentionally
    omitted; layers are plain dense + GLU.  Architectures/presets and the
    attention math (sqrt(0.5) residual scaling, context renormalised by
    sqrt(source length)) follow the reference.
  * The encoder packs (output, attention-value) as one (B, T, 2E) tensor so
    the generic beam-search generator can carry a single encoder-out array.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.modules.dropout import Dropout as _FastDropout

SQRT_HALF = 0.7071067811865476


def _unfold_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, T, C) -> (B, T, k*C) centered windows (SAME padding, odd k)."""
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (0, 0)))
    return jnp.concatenate([xp[:, i : i + x.shape[1]] for i in range(k)], axis=-1)


def _unfold_causal(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, T, C) -> (B, T, k*C) windows ending at t (left pad k-1)."""
    xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    return jnp.concatenate([xp[:, i : i + x.shape[1]] for i in range(k)], axis=-1)


@dataclass(frozen=True)
class FConvConfig:
    encoder_embed_dim: int = 512
    encoder_convs: Tuple[Tuple[int, int], ...] = ((512, 3),) * 20  # (channels, k)
    decoder_embed_dim: int = 512
    decoder_convs: Tuple[Tuple[int, int], ...] = ((512, 3),) * 20
    decoder_out_embed_dim: int = 256
    dropout: float = 0.1
    share_decoder_input_output_embed: bool = False
    vocab_size: int = 1000
    src_vocab_size: int = -1
    max_source_positions: int = 1024
    max_target_positions: int = 1024
    pad_id: int = 1
    dtype_str: str = "float32"
    # generator plumbing parity
    subsampling_layers: int = 0
    subsampling_stride: int = 1
    decoder_layers: int = 1  # nonzero -> task builds a SequenceGenerator

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def src_vocab(self):
        return self.src_vocab_size if self.src_vocab_size > 0 else self.vocab_size


class FConvEncoder(nn.Module):
    cfg: FConvConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        self.embed_tokens = nn.Embed(
            cfg.src_vocab, cfg.encoder_embed_dim,
            embedding_init=nn.initializers.normal(0.1), dtype=dt,
            name="embed_tokens",
        )
        self.embed_positions = nn.Embed(
            cfg.max_source_positions, cfg.encoder_embed_dim,
            embedding_init=nn.initializers.normal(0.1), dtype=dt,
            name="embed_positions",
        )
        chans = [c for c, _ in cfg.encoder_convs]
        self.fc1 = nn.Dense(chans[0], dtype=dt, name="fc1")
        self.convs = [
            nn.Dense(2 * c, dtype=dt, name=f"conv{i}")
            for i, (c, _k) in enumerate(cfg.encoder_convs)
        ]
        # residual projections where channel count changes
        self.res_proj = {
            i: nn.Dense(c, dtype=dt, name=f"res{i}")
            for i, (c, _k) in enumerate(cfg.encoder_convs)
            if (chans[i - 1] if i else chans[0]) != c
        }
        self.fc2 = nn.Dense(cfg.encoder_embed_dim, dtype=dt, name="fc2")
        self.drop = _FastDropout(cfg.dropout)

    def __call__(self, src_tokens, src_lengths=None, deterministic: bool = True):
        cfg = self.cfg
        if src_lengths is None:
            src_lengths = jnp.sum((src_tokens != cfg.pad_id).astype(jnp.int32), 1)
        T = src_tokens.shape[1]
        emb = self.embed_tokens(src_tokens) + self.embed_positions(
            jnp.arange(T)
        )[None]
        emb = self.drop(emb, deterministic=deterministic)
        valid = (src_tokens != cfg.pad_id)[..., None]  # (B, T, 1)

        x = self.fc1(emb)
        for i, (c, k) in enumerate(cfg.encoder_convs):
            residual = self.res_proj[i](x) if i in self.res_proj else x
            x = jnp.where(valid, x, 0.0)  # zero pads so windows stay clean
            x = self.drop(x, deterministic=deterministic)
            x = jax.nn.glu(self.convs[i](_unfold_same(x, k)), axis=-1)
            x = (x + residual) * SQRT_HALF
        y = self.fc2(x)
        value = (y + emb) * SQRT_HALF  # attention value (reference: fconv.py)
        return {
            "encoder_out": jnp.concatenate([y, value], axis=-1),  # (B, T, 2E)
            "encoder_lengths": src_lengths,
            "ctc_logits": None,
            "inter_ctc_logits": (),
            "xctc_logits": None,
            "inter_xctc_logits": (),
        }


class FConvDecoder(nn.Module):
    cfg: FConvConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        E = cfg.decoder_embed_dim
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, E, embedding_init=nn.initializers.normal(0.1),
            dtype=dt, name="embed_tokens",
        )
        self.embed_positions = nn.Embed(
            cfg.max_target_positions, E,
            embedding_init=nn.initializers.normal(0.1), dtype=dt,
            name="embed_positions",
        )
        chans = [c for c, _ in cfg.decoder_convs]
        self.fc1 = nn.Dense(chans[0], dtype=dt, name="fc1")
        self.convs = [
            nn.Dense(2 * c, dtype=dt, name=f"conv{i}")
            for i, (c, _k) in enumerate(cfg.decoder_convs)
        ]
        self.res_proj = {
            i: nn.Dense(c, dtype=dt, name=f"res{i}")
            for i, (c, _k) in enumerate(cfg.decoder_convs)
            if (chans[i - 1] if i else chans[0]) != c
        }
        # per-layer attention projections (reference: AttentionLayer)
        self.attn_q = [
            nn.Dense(cfg.encoder_embed_dim, dtype=dt, name=f"attn_q{i}")
            for i in range(len(cfg.decoder_convs))
        ]
        self.attn_o = [
            nn.Dense(c, dtype=dt, name=f"attn_o{i}")
            for i, (c, _k) in enumerate(cfg.decoder_convs)
        ]
        if (
            cfg.share_decoder_input_output_embed
            and cfg.decoder_out_embed_dim != E
        ):
            raise ValueError(
                "share_decoder_input_output_embed requires "
                "decoder_out_embed_dim == decoder_embed_dim "
                f"({cfg.decoder_out_embed_dim} != {E})"
            )
        self.fc2 = nn.Dense(cfg.decoder_out_embed_dim, dtype=dt, name="fc2")
        if not cfg.share_decoder_input_output_embed:
            self.fc3 = nn.Dense(cfg.vocab_size, dtype=dt, name="fc3")
        self.drop = _FastDropout(cfg.dropout)

    def _attend(self, i, x, target_emb, enc_y, enc_value, enc_valid):
        """Multi-step attention for layer i.  x: (B, U, C)."""
        q = (self.attn_q[i](x) + target_emb) * SQRT_HALF  # (B, U, E)
        scores = jnp.einsum("bue,bte->but", q, enc_y).astype(jnp.float32)
        scores = jnp.where(enc_valid[:, None, :], scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("but,bte->bue", attn, enc_value)
        # renormalise by source length (reference: x * (s * s.rsqrt()))
        s = jnp.sum(enc_valid, axis=-1, keepdims=True)[..., None].astype(ctx.dtype)
        ctx = ctx * jnp.sqrt(jnp.maximum(s, 1.0))
        return (self.attn_o[i](ctx) + x) * SQRT_HALF

    def _split_enc(self, encoder_out):
        E = self.cfg.encoder_embed_dim
        return encoder_out[..., :E], encoder_out[..., E:]

    def __call__(self, prev_tokens, encoder_out, encoder_valid_mask,
                 deterministic: bool = True):
        cfg = self.cfg
        U = prev_tokens.shape[1]
        enc_y, enc_value = self._split_enc(encoder_out)
        emb = self.embed_tokens(prev_tokens) + self.embed_positions(
            jnp.arange(U)
        )[None]
        emb = self.drop(emb, deterministic=deterministic)
        x = self.fc1(emb)
        for i, (c, k) in enumerate(cfg.decoder_convs):
            residual = self.res_proj[i](x) if i in self.res_proj else x
            x = self.drop(x, deterministic=deterministic)
            x = jax.nn.glu(self.convs[i](_unfold_causal(x, k)), axis=-1)
            x = self._attend(i, x, emb, enc_y, enc_value, encoder_valid_mask)
            x = (x + residual) * SQRT_HALF
        x = self.fc2(x)
        x = self.drop(x, deterministic=deterministic)
        return self._output(x)

    def _output(self, x):
        if self.cfg.share_decoder_input_output_embed:
            # tying requires decoder_out_embed_dim == decoder_embed_dim
            # (same constraint as the reference's build_model check)
            return self.embed_tokens.attend(x)
        return self.fc3(x)

    def init_cache(self, batch_size: int, max_len: int) -> dict:
        """Rolling conv-input windows: layer i holds the last k-1 inputs."""
        cfg = self.cfg
        chans = [c for c, _ in cfg.decoder_convs]
        cache = {}
        for i, (c, k) in enumerate(cfg.decoder_convs):
            cin = chans[i - 1] if i else chans[0]
            cache[f"conv{i}"] = jnp.zeros((batch_size, k - 1, cin), cfg.dtype)
        return cache

    def step(self, tokens, cache, index, encoder_out, encoder_valid_mask):
        """(B, 1) tokens at position ``index`` -> ((B, V) logits, cache)."""
        cfg = self.cfg
        enc_y, enc_value = self._split_enc(encoder_out)
        emb = self.embed_tokens(tokens) + self.embed_positions(
            index + jnp.zeros((1,), jnp.int32)
        )[None]
        x = self.fc1(emb)  # (B, 1, C0)
        new_cache = {}
        for i, (c, k) in enumerate(cfg.decoder_convs):
            residual = self.res_proj[i](x) if i in self.res_proj else x
            window = jnp.concatenate([cache[f"conv{i}"], x], axis=1)  # (B, k, Cin)
            new_cache[f"conv{i}"] = window[:, 1:]
            flat = window.reshape(window.shape[0], 1, -1)  # (B, 1, k*Cin)
            x = jax.nn.glu(self.convs[i](flat), axis=-1)
            x = self._attend(i, x, emb, enc_y, enc_value, encoder_valid_mask)
            x = (x + residual) * SQRT_HALF
        x = self.fc2(x)
        return self._output(x)[:, 0], new_cache


@register_model("fconv")
class FConvModel(nn.Module):
    cfg: FConvConfig

    def setup(self):
        self.encoder = FConvEncoder(self.cfg, name="encoder")
        self.decoder = FConvDecoder(self.cfg, name="decoder")

    def __call__(self, src_tokens, src_lengths, prev_tokens, deterministic=True):
        enc = self.encoder(src_tokens, src_lengths, deterministic)
        enc_mask = src_tokens != self.cfg.pad_id
        logits = self.decoder(
            prev_tokens, enc["encoder_out"], enc_mask, deterministic
        )
        return {"decoder_logits": logits, **enc}

    def encode(self, src_tokens, src_lengths, deterministic: bool = True):
        return self.encoder(src_tokens, src_lengths, deterministic)

    def decode(self, prev_tokens, encoder_out, encoder_valid_mask):
        return self.decoder(prev_tokens, encoder_out, encoder_valid_mask, True)

    def decode_step(self, tokens, cache, index, encoder_out, encoder_valid_mask):
        return self.decoder.step(tokens, cache, index, encoder_out, encoder_valid_mask)

    def init_cache(self, batch_size: int, max_len: int):
        return self.decoder.init_cache(batch_size, max_len)


@register_model_architecture("fconv", "fconv")
def fconv_base(**kw) -> FConvConfig:
    return FConvConfig().replace(**kw)


@register_model_architecture("fconv", "fconv_iwslt_de_en")
def fconv_iwslt(**kw) -> FConvConfig:
    return FConvConfig(
        encoder_embed_dim=256, encoder_convs=((256, 3),) * 4,
        decoder_embed_dim=256, decoder_convs=((256, 3),) * 3,
        decoder_out_embed_dim=256,
    ).replace(**kw)


@register_model_architecture("fconv", "fconv_wmt_en_de")
def fconv_wmt_en_de(**kw) -> FConvConfig:
    convs = ((512, 3),) * 9 + ((1024, 3),) * 4 + ((2048, 1),) * 2
    return FConvConfig(
        encoder_embed_dim=768, encoder_convs=convs,
        decoder_embed_dim=768, decoder_convs=convs,
        decoder_out_embed_dim=512,
    ).replace(**kw)

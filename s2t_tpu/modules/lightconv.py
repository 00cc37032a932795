"""Lightweight and Dynamic convolutions (Wu et al., "Pay Less Attention").

(reference: fairseq/modules/lightconv_layer/lightconv_cuda_kernel.cu:375 and
dynamicconv_layer/*.cu — hand-written CUDA kernels.  Here the banded
depthwise convolution is expressed as a static window-gather + einsum, which
XLA fuses and tiles onto the MXU; no custom kernel needed.)

LightweightConv: one softmax-normalised kernel per head, shared across the
channels of that head.  DynamicConv: kernels predicted per position from the
input features.  Both support causal (decoder) and centered (encoder)
padding, and single-step incremental decoding via a rolling input cache.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from s2t_tpu.modules.dropout import Dropout as _FastDropout


def unfold_windows(x: jnp.ndarray, k: int, causal: bool) -> jnp.ndarray:
    """(B, T, C) → (B, T, k, C) sliding windows.

    causal: window j holds x[t - (k-1) + j] (past only);
    centered: window j holds x[t - k//2 + j] (reference padding_l = k//2)."""
    pad_l = k - 1 if causal else k // 2
    pad_r = 0 if causal else (k - 1) - k // 2
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    T = x.shape[1]
    return jnp.stack([xp[:, j : j + T] for j in range(k)], axis=2)


class LightweightConv(nn.Module):
    dim: int
    kernel_size: int
    num_heads: int
    weight_softmax: bool = True
    causal: bool = False
    weight_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 cache: Optional[jnp.ndarray] = None):
        """x: (B, T, C).  With ``cache`` (B, k-1, C) of previous inputs, T
        must be 1 (incremental decode); returns (out, new_cache)."""
        H, k = self.num_heads, self.kernel_size
        w = self.param("weight", nn.initializers.normal(0.1), (H, k))
        w = w.astype(jnp.float32)
        if self.weight_softmax:
            w = jax.nn.softmax(w, axis=-1)
        w = _FastDropout(self.weight_dropout)(w, deterministic=deterministic)
        new_cache = None
        if cache is not None:
            win = jnp.concatenate([cache, x], axis=1)[:, None]  # (B,1,k,C)
            new_cache = jnp.concatenate([cache, x], axis=1)[:, 1:]
        else:
            win = unfold_windows(x, k, self.causal)
        B, T, _, C = win.shape
        wc = win.reshape(B, T, k, H, C // H)
        out = jnp.einsum("btkhc,hk->bthc", wc.astype(jnp.float32), w)
        out = out.reshape(B, T, C).astype(x.dtype)
        return out, new_cache


class DynamicConv(nn.Module):
    dim: int
    kernel_size: int
    num_heads: int
    weight_softmax: bool = True
    causal: bool = False
    weight_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 cache: Optional[jnp.ndarray] = None):
        H, k = self.num_heads, self.kernel_size
        w = nn.Dense(H * k, use_bias=False, dtype=self.dtype,
                     name="weight_linear")(x)  # (B, T, H*k)
        B, T, _ = w.shape
        w = w.reshape(B, T, H, k).astype(jnp.float32)
        if self.weight_softmax:
            w = jax.nn.softmax(w, axis=-1)
        w = _FastDropout(self.weight_dropout)(w, deterministic=deterministic)
        new_cache = None
        if cache is not None:
            win = jnp.concatenate([cache, x], axis=1)[:, None]
            new_cache = jnp.concatenate([cache, x], axis=1)[:, 1:]
        else:
            win = unfold_windows(x, k, self.causal)
        C = x.shape[-1]
        wc = win.reshape(B, T, k, H, C // H)
        out = jnp.einsum("btkhc,bthk->bthc", wc.astype(jnp.float32), w)
        out = out.reshape(B, T, C).astype(x.dtype)
        return out, new_cache


class LightConvBlock(nn.Module):
    """linear1 → [GLU] → conv → linear2 with residual (reference:
    models/lightconv.py:615-700 LightConvEncoderLayer conv sub-block)."""

    dim: int
    conv_dim: int
    kernel_size: int
    num_heads: int
    conv_type: str = "lightweight"  # lightweight | dynamic
    glu: bool = True
    causal: bool = False
    dropout: float = 0.0
    weight_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_mask=None, deterministic: bool = True,
                 cache: Optional[jnp.ndarray] = None):
        h = nn.Dense(2 * self.conv_dim if self.glu else self.conv_dim,
                     dtype=self.dtype, name="linear1")(x)
        if self.glu:
            a, b = jnp.split(h, 2, axis=-1)
            h = a * nn.sigmoid(b)
        if valid_mask is not None:
            h = jnp.where(valid_mask[..., None], h, 0.0)
        conv_cls = LightweightConv if self.conv_type == "lightweight" else DynamicConv
        h, new_cache = conv_cls(
            self.conv_dim, self.kernel_size, self.num_heads,
            causal=self.causal, weight_dropout=self.weight_dropout,
            dtype=self.dtype, name="conv",
        )(h, deterministic, cache)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)
        return h, new_cache

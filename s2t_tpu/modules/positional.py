"""Positional encodings: absolute sinusoidal, relative (Transformer-XL style),
and rotary (RoPE).

(reference: fairseq/modules/positional_encoding.py:11-104,
 rotary_positional_embedding.py:51, sinusoidal_positional_embedding.py —
 re-expressed as pure functions over static shapes.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sinusoidal_encoding(max_len: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(max_len, dim) interleaved sin/cos table (ESPnet/fairseq convention:
    sin at even indices, cos at odd)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(np.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return jnp.asarray(pe, dtype=dtype)


def fairseq_sinusoidal_encoding(
    max_len: int, dim: int, padding_idx: int = 1, dtype=jnp.float32
) -> jnp.ndarray:
    """(max_len, dim) table matching fairseq's SinusoidalPositionalEmbedding
    (reference: fairseq/modules/sinusoidal_positional_embedding.py
    get_embedding): concatenated [sin | cos] halves with frequency base
    exp(-log(1e4)/(half-1)), and *positions offset by padding_idx+1* — row i
    here is the embedding of the i-th valid (non-pad) token/frame, i.e.
    absolute position padding_idx+1+i, exactly what make_positions assigns.
    Matching this bit-for-bit is required for reference-checkpoint parity."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(np.log(10000.0) / (half - 1)))
    pos = np.arange(padding_idx + 1, max_len + padding_idx + 1, dtype=np.float64)
    ang = pos[:, None] * freq[None, :]
    pe = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        pe = np.pad(pe, ((0, 0), (0, 1)))
    return jnp.asarray(pe, dtype=dtype)


def relative_encoding(max_len: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(2*max_len-1, dim) table for relative positions [max_len-1 .. -(max_len-1)]
    (ESPnet RelPositionalEncoding layout: positive first, descending)."""
    pos = np.arange(max_len - 1, -max_len, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(np.log(10000.0) / dim))
    pe = np.zeros((2 * max_len - 1, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe, dtype=dtype)


def rope_tables(max_len: int, head_dim: int, base: float = 10000.0, dtype=jnp.float32):
    """Return (cos, sin) tables of shape (max_len, head_dim//2)."""
    inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # (max_len, head_dim//2)
    return jnp.asarray(np.cos(freqs), dtype), jnp.asarray(np.sin(freqs), dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding.

    x: (..., T, H, Dh); cos/sin: (T, Dh//2) — rotates consecutive pairs.
    """
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    # broadcast cos/sin over leading dims and heads: (T, 1, Dh//2)
    c = cos[:, None, :]
    s = sin[:, None, :]
    out1 = x1 * c - x2 * s
    out2 = x1 * s + x2 * c
    out = jnp.stack([out1, out2], axis=-1)
    return out.reshape(x.shape)

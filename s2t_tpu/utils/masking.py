"""Length/mask helpers (reference: fairseq/models/speech_to_text/utils.py lengths_to_*).

Convention: everything in this framework is **static-shape, mask-carrying**.
Batches are padded to a bucket size; a boolean mask (True = valid) rides with
every tensor.  This is the TPU answer to the reference's dynamic `padding_mask`
tensors — same semantics, but shapes never change under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def lengths_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) bool mask, True at valid positions."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def lengths_to_padding_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) -> (B, max_len) bool mask, True at PADDING positions (fairseq style)."""
    return ~lengths_to_mask(lengths, max_len)


def mask_to_lengths(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) valid-mask -> (B,) int32 lengths."""
    return jnp.sum(mask.astype(jnp.int32), axis=-1)

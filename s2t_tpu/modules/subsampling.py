"""Convolutional subsampling front-ends.

(reference: fairseq/modules/speech_to_text/subsampling.py:106-247 —
Conv1dSubsampling / Conv2dSubsampling: N strided convs + norm + activation.)

TPU notes: XLA lowers strided 1-D convs onto the MXU as implicit GEMMs; GLU is
fused into the conv epilogue.  Padded frames are zeroed before each conv so
batch statistics and edges are deterministic regardless of bucket padding.
Length recurrence per layer (stride 2, 'same'-ish padding (k-1)//2):
L' = (L - 1) // 2 + 1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.utils.masking import lengths_to_mask


def get_activation(name: str):
    if name == "relu":
        return nn.relu
    if name == "gelu":
        # exact (erf) form: torch nn.GELU default — required for
        # reference-checkpoint parity; jax's default is the tanh approx
        return lambda x: nn.gelu(x, approximate=False)
    if name in ("gelu_tanh", "gelu_accurate"):
        # tanh approximation (HF "gelu_new" / fairseq gelu_accurate)
        return lambda x: nn.gelu(x, approximate=True)
    if name == "swish":
        return nn.swish
    if name in ("none", None):
        return lambda x: x
    raise ValueError(f"activation {name!r} not supported")


class Conv1dSubsampling(nn.Module):
    """Stack of strided 1-D convs with GLU (default), halving T per layer.

    Channel plan mirrors the reference (subsampling.py:130-142): intermediate
    layers output ``filters``, the last outputs ``out_dim``; with GLU each conv
    emits 2x channels which the gate halves.
    """

    num_layers: int = 2
    filters: int = 1024
    out_dim: int = 512
    kernel_size: int = 5
    stride: int = 2
    norm: str = "none"  # none | layer
    activation: str = "glu"
    # True (default): re-zero the padded tail before every conv, making valid
    # outputs independent of bucket padding — the TPU-clean semantics.
    # False: reference-exact semantics — torch convolves the zero-padded batch
    # with no re-masking (reference subsampling.py:146-160), so valid frames at
    # the length boundary read bias-propagated tail values; checkpoint-parity
    # imports need this mode (set by interop/fairseq_import.py).
    mask_between_layers: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (B, T, D_in); lengths: (B,)
        mask = lengths_to_mask(lengths, x.shape[1])[..., None]
        x = jnp.where(mask, x, 0.0)
        for i in range(self.num_layers):
            if self.mask_between_layers and i > 0:
                mask = lengths_to_mask(lengths, x.shape[1])[..., None]
                x = jnp.where(mask, x, 0.0)
            ch = self.out_dim if i == self.num_layers - 1 else self.filters
            glu = self.activation == "glu"
            feat = ch * 2 if glu else ch
            x = nn.Conv(
                features=feat,
                kernel_size=(self.kernel_size,),
                strides=(self.stride,),
                padding=[((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)],
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            if self.norm == "layer":
                x = nn.LayerNorm(dtype=self.dtype, name=f"norm{i}")(x)
            if glu:
                a, b = jnp.split(x, 2, axis=-1)
                x = a * nn.sigmoid(b)
            else:
                x = get_activation(self.activation)(x)
            lengths = (lengths - 1) // self.stride + 1
        mask = lengths_to_mask(lengths, x.shape[1])[..., None]
        x = jnp.where(mask, x, 0.0)
        return x, lengths


class Conv2dSubsampling(nn.Module):
    """2-D conv subsampling (freq axis also strided), ESPnet style
    (reference: subsampling.py:162-229 uses VALID padding; the
    convtransformer front-end, convtransformer.py:242-253, pads k//2 on
    both dims — select with ``padding``)."""

    num_layers: int = 2
    filters: int = 176
    out_dim: int = 512
    in_dim: int = 80
    kernel_size: int = 5
    stride: int = 2
    activation: str = "glu"
    dtype: jnp.dtype = jnp.float32
    padding: str = "valid"  # "valid" | "same" (= k//2 each side)
    # True (default): re-zero padded frames before every conv so outputs are
    # independent of bucket padding (TPU-clean).  False: torch reference
    # semantics — the tail beyond each length carries conv garbage into
    # boundary windows exactly like the un-masked torch convs do (needed for
    # checkpoint-import parity; see convtransformer.py:294-300).
    mask_between: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, D = x.shape
        h = x[..., None]  # (B, T, D, 1) — NHWC
        freq = self.in_dim
        k, s = self.kernel_size, self.stride
        pad = k // 2 if self.padding == "same" else 0
        for i in range(self.num_layers):
            if self.mask_between or i == 0:
                mask = lengths_to_mask(lengths, h.shape[1])[:, :, None, None]
                h = jnp.where(mask, h, 0.0)
            glu = self.activation == "glu"
            feat = self.filters * 2 if glu else self.filters
            h = nn.Conv(
                features=feat,
                kernel_size=(k, k),
                strides=(s, s),
                padding=[(pad, pad), (pad, pad)],
                dtype=self.dtype,
                name=f"conv{i}",
            )(h)
            if glu:
                a, b = jnp.split(h, 2, axis=-1)
                h = a * nn.sigmoid(b)
            else:
                h = get_activation(self.activation)(h)
            lengths = (lengths + 2 * pad - k) // s + 1
            freq = (freq + 2 * pad - k) // s + 1
        B2, T2, F2, C2 = h.shape
        h = h.reshape(B2, T2, F2 * C2)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="out")(h)
        mask = lengths_to_mask(lengths, out.shape[1])[..., None]
        return jnp.where(mask, out, 0.0), lengths


def subsampled_length(length: int, num_layers: int = 2, stride: int = 2) -> int:
    for _ in range(num_layers):
        length = (length - 1) // stride + 1
    return length

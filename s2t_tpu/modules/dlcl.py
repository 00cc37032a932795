"""DLCL — Dynamic Linear Combination of Layers.

(reference: fairseq/modules/dlcl.py:9-169 — every layer's input is a learned
weighted sum of all previous layers' outputs; history push/pop in the encoder
forward, s2t_transformer.py:943,1010-1015.)

Functional formulation: keep the stacked layer outputs (L+1, B, T, D) and a
lower-triangular learned weight matrix; layer i consumes
sum_j w[i, j]·h[j] with optional per-entry LayerNorm.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DLCL(nn.Module):
    num_layers: int  # number of combination points (encoder_layers + 1)
    dim: int
    layer_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # lower-triangular averaging init (reference: dlcl.py uniform init)
        n = self.num_layers + 1
        self.weights = self.param(
            "weights",
            lambda key: jnp.tril(jnp.ones((n, n))) / jnp.arange(1, n + 1)[:, None],
        )
        if self.layer_norm:
            self.norms = [
                nn.LayerNorm(dtype=self.dtype, name=f"norm{i}") for i in range(n)
            ]

    def combine(self, history, idx: int) -> jnp.ndarray:
        """history: list of (B, T, D) layer outputs h_0..h_idx; returns the
        weighted input for layer idx+1."""
        w = self.weights[idx, : len(history)].astype(history[0].dtype)
        out = jnp.zeros_like(history[0])
        for j, h in enumerate(history):
            if self.layer_norm:
                h = self.norms[j](h)
            out = out + w[j] * h
        return out

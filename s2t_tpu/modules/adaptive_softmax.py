"""Adaptive softmax (Grave et al.) — clustered output layer for large vocabs.

(reference: fairseq/modules/adaptive_softmax.py + criterions/adaptive_loss.py
— the vocabulary splits into a frequent head and down-projected tail
clusters; training never materialises the full V-way softmax.)

API:
  target_logprob(features, targets) — exact per-token log p(target), using
    only head + per-cluster tail matmuls (the training path)
  log_probs(features) — full (..., V) log-probabilities (the eval path)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class AdaptiveSoftmax(nn.Module):
    vocab_size: int
    cutoffs: Sequence[int]  # e.g. (2000, 10000); implicit final = vocab_size
    input_dim: int = 512
    factor: float = 4.0  # tail down-projection factor per cluster
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cuts = list(self.cutoffs) + [self.vocab_size]
        self._cuts = cuts
        n_clusters = len(cuts) - 1
        # head covers [0, cutoffs[0]) plus one slot per tail cluster
        self.head = nn.Dense(cuts[0] + n_clusters, use_bias=False,
                             dtype=self.dtype, name="head")
        projs = []
        tails = []
        for k in range(n_clusters):
            dim = max(int(self.input_dim // (self.factor ** (k + 1))), 8)
            projs.append(nn.Dense(dim, use_bias=False, dtype=self.dtype,
                                  name=f"proj{k}"))
            tails.append(nn.Dense(cuts[k + 1] - cuts[k], use_bias=False,
                                  dtype=self.dtype, name=f"tail{k}"))
        self.projs = projs
        self.tails = tails

    def _head_lp(self, x):
        return jax.nn.log_softmax(self.head(x).astype(jnp.float32), axis=-1)

    def _tail_lp(self, x, k):
        return jax.nn.log_softmax(
            self.tails[k](self.projs[k](x)).astype(jnp.float32), axis=-1
        )

    def target_logprob(self, x: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        """x: (..., D), targets: (...) int → log p(target) (...)."""
        cuts = self._cuts
        head_lp = self._head_lp(x)
        cluster = jnp.zeros_like(targets)
        for k in range(len(cuts) - 1):
            cluster = jnp.where(targets >= cuts[k], k + 1, cluster)
        # head index: the token itself for cluster 0, else the cluster slot
        head_idx = jnp.where(
            cluster == 0, jnp.minimum(targets, cuts[0] - 1),
            cuts[0] + jnp.maximum(cluster - 1, 0),
        )
        lp = jnp.take_along_axis(head_lp, head_idx[..., None], -1)[..., 0]
        for k in range(len(cuts) - 1):
            tail_lp = self._tail_lp(x, k)
            idx = jnp.clip(targets - cuts[k], 0, cuts[k + 1] - cuts[k] - 1)
            t = jnp.take_along_axis(tail_lp, idx[..., None], -1)[..., 0]
            lp = lp + jnp.where(cluster == k + 1, t, 0.0)
        return lp

    def log_probs(self, x: jnp.ndarray) -> jnp.ndarray:
        """Full-vocabulary log-probs (eval/scoring path)."""
        cuts = self._cuts
        head_lp = self._head_lp(x)
        parts = [head_lp[..., : cuts[0]]]
        for k in range(len(cuts) - 1):
            parts.append(
                head_lp[..., cuts[0] + k : cuts[0] + k + 1]
                + self._tail_lp(x, k)
            )
        return jnp.concatenate(parts, axis=-1)

    def __call__(self, x):
        return self.log_probs(x)


class AdaptiveInput(nn.Module):
    """Adaptive input embeddings (Baevski & Auli 2019).

    (reference: fairseq/modules/adaptive_input.py — the embedding-side twin
    of AdaptiveSoftmax: frequent head tokens get full-dim embeddings, tail
    clusters get factor-reduced embeddings projected up to ``embed_dim``.)

    Drop-in for nn.Embed as a decoder ``shared_embed`` (no ``attend``: tying
    with the output layer pairs it with AdaptiveSoftmax instead).
    """

    vocab_size: int
    cutoffs: Sequence[int]
    embed_dim: int = 512
    factor: float = 4.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cuts = [0] + list(self.cutoffs) + [self.vocab_size]
        self._cuts = cuts
        embeds, projs = [], []
        for k in range(len(cuts) - 1):
            dim = max(int(self.embed_dim // (self.factor**k)), 8)
            embeds.append(nn.Embed(
                cuts[k + 1] - cuts[k], dim, dtype=self.dtype,
                embedding_init=nn.initializers.normal(dim**-0.5),
                name=f"embed{k}",
            ))
            projs.append(nn.Dense(self.embed_dim, use_bias=False,
                                  dtype=self.dtype, name=f"proj{k}"))
        self.embeds = embeds
        self.projs = projs

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cuts = self._cuts
        out = None
        for k in range(len(cuts) - 1):
            idx = jnp.clip(tokens - cuts[k], 0, cuts[k + 1] - cuts[k] - 1)
            e = self.projs[k](self.embeds[k](idx))
            sel = (tokens >= cuts[k]) & (tokens < cuts[k + 1])
            e = jnp.where(sel[..., None], e, 0.0)
            out = e if out is None else out + e
        return out

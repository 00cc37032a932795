"""Dynamic (low-rank, beam-restricted) linear-chain CRF.

(reference: fairseq/modules/dynamic_crf_layer.py — Sun et al. 2019, "Fast
Structured Decoding for Sequence Models": the full V×V transition matrix is
factored as E1·E2ᵀ (rank r) and, at each position, the lattice is restricted
to the top-``beam`` emission candidates, making forward/viterbi O(T·K²·r)
instead of O(T·V²).)

TPU design: forward (log-partition) and Viterbi are single ``lax.scan``s over
time with (B, K, K) transition blocks built by two embedding lookups and one
batched matmul per step — static shapes throughout.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG = -1e30


class DynamicCRF(nn.Module):
    vocab_size: int
    rank: int = 32
    beam: int = 8
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.e1 = nn.Embed(self.vocab_size, self.rank, dtype=self.dtype,
                           embedding_init=nn.initializers.normal(0.02),
                           name="e1")
        self.e2 = nn.Embed(self.vocab_size, self.rank, dtype=self.dtype,
                           embedding_init=nn.initializers.normal(0.02),
                           name="e2")

    def _trans(self, prev_tok: jnp.ndarray, cur_tok: jnp.ndarray) -> jnp.ndarray:
        """(..., Kp), (..., Kc) -> (..., Kp, Kc) transition scores."""
        a = self.e1(prev_tok).astype(jnp.float32)
        b = self.e2(cur_tok).astype(jnp.float32)
        return jnp.einsum("...pr,...cr->...pc", a, b)

    def nll(self, emissions: jnp.ndarray, targets: jnp.ndarray,
            mask: jnp.ndarray) -> jnp.ndarray:
        """Sequence negative log-likelihood, (B,).

        emissions (B, T, V) raw scores, targets (B, T) gold ids,
        mask (B, T) valid positions (contiguous prefix)."""
        B, T, V = emissions.shape
        K = min(self.beam, V)
        em = emissions.astype(jnp.float32)

        # gold in slot 0 + the K-1 best NON-gold labels — K distinct labels,
        # so with beam >= V the lattice is exact
        gold_hot = jax.nn.one_hot(targets, V, dtype=bool)
        top_e, top_i = jax.lax.top_k(jnp.where(gold_hot, NEG, em), K - 1)
        cand = jnp.concatenate([targets[..., None], top_i], axis=-1)  # (B,T,K)
        e_gold = jnp.take_along_axis(em, targets[..., None], axis=-1)[..., 0]
        e_cand = jnp.concatenate([e_gold[..., None], top_e], axis=-1)

        # numerator: gold path
        tr_gold = jnp.sum(
            self.e1(targets[:, :-1]).astype(jnp.float32)
            * self.e2(targets[:, 1:]).astype(jnp.float32),
            axis=-1,
        )  # (B, T-1)
        pair_valid = (mask[:, 1:] & mask[:, :-1]).astype(jnp.float32)
        gold = jnp.sum(e_gold * mask.astype(jnp.float32), axis=1) + jnp.sum(
            tr_gold * pair_valid, axis=1
        )

        # denominator: forward algorithm over the candidate lattice
        alpha0 = e_cand[:, 0]  # (B, K)

        def step(alpha, t):
            tr = self._trans(cand[:, t - 1], cand[:, t])  # (B, K, K)
            new = jax.nn.logsumexp(alpha[:, :, None] + tr, axis=1) + e_cand[:, t]
            alpha = jnp.where(mask[:, t][:, None], new, alpha)
            return alpha, None

        alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))
        logz = jax.nn.logsumexp(alpha, axis=-1)
        # fully-padded rows (batch padding) contribute zero nll — alpha0 is
        # unconditional, so without this an all-pad row returns logsumexp of
        # its position-0 emissions
        any_valid = jnp.any(mask, axis=1).astype(logz.dtype)
        return (logz - gold) * any_valid

    def viterbi(self, emissions: jnp.ndarray,
                mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Best labelling over the top-``beam`` lattice.

        Returns (tokens (B, T) int32, path score (B,))."""
        B, T, V = emissions.shape
        K = min(self.beam, V)
        em = emissions.astype(jnp.float32)
        e_cand, cand = jax.lax.top_k(em, K)  # (B, T, K)

        def step(alpha, t):
            tr = self._trans(cand[:, t - 1], cand[:, t])  # (B, K, K)
            scores = alpha[:, :, None] + tr  # (B, Kprev, Kcur)
            best_prev = jnp.argmax(scores, axis=1)  # (B, K)
            new = jnp.max(scores, axis=1) + e_cand[:, t]
            # padded steps: carry alpha, backpointer = identity
            keep = mask[:, t][:, None]
            alpha = jnp.where(keep, new, alpha)
            bp = jnp.where(keep, best_prev, jnp.arange(K)[None, :])
            return alpha, bp

        alpha, bps = jax.lax.scan(step, e_cand[:, 0], jnp.arange(1, T))
        # bps: (T-1, B, K)
        best_last = jnp.argmax(alpha, axis=-1)  # (B,)
        score = jnp.max(alpha, axis=-1)

        def back(idx, t):
            idx = bps[t][jnp.arange(B), idx]
            return idx, idx

        _, path_rev = jax.lax.scan(back, best_last, jnp.arange(T - 2, -1, -1))
        # path_rev[j] = candidate index at position T-2-j
        idxs = jnp.concatenate(
            [jnp.flip(path_rev, axis=0), best_last[None]], axis=0
        )  # (T, B)
        tokens = jnp.take_along_axis(
            cand, idxs.T[..., None], axis=-1
        )[..., 0]  # (B, T)
        return tokens.astype(jnp.int32), score

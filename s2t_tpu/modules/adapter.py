"""PAE (Prediction-Aware Encoding) adapters.

(reference: fairseq/modules/speech_to_text/adapter.py:95-349 — re-injects CTC
predictions into the encoder stream between layers, and bridges acoustic →
textual encoders in SATE.)

Types implemented (reference :109-160):
  none          identity
  linear        Dense(x)
  context       softmax(ctc_logit / T) @ E   (re-embedding of the CTC posterior)
  league        linear + context
  inter_league  x + context (residual re-injection; the inter-CTC PAE default)
  gated_league  g·linear + (1-g)·context with learned gate
  shrink        CTC-blank/repeat collapse via a segment-mean matmul — static
                output length (see ``ctc_shrink_matrix``); the TPU-shaped
                version of CTCCompressStrategy (reference: adapter.py:14-78)

The embedding table E can be shared with the CTC head projection
(share_pae_and_ctc, reference: s2t_transformer.py build).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Adapter(nn.Module):
    dim: int
    vocab_size: int
    adapter_type: str = "inter_league"
    ctc_temperature: float = 1.0
    embed_norm: bool = False
    out_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        ctc_logits: Optional[jnp.ndarray] = None,
        embedding: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        probs: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``probs`` overrides softmax(ctc_logits) — used by the ground-truth
        oracle PAE path (reference: criterions/ctc.py:283-330 + adapter oracle
        mixing)."""
        t = self.adapter_type
        if t == "none":
            return x

        if t in ("context", "league", "inter_league", "gated_league"):
            assert ctc_logits is not None or probs is not None
            if embedding is None:
                embedding = self.param(
                    "embed_adapter",
                    nn.initializers.normal(self.dim**-0.5),
                    (self.vocab_size, self.dim),
                )
            if probs is None:
                probs = jax.nn.softmax(
                    ctc_logits.astype(jnp.float32) / self.ctc_temperature, axis=-1
                )
            probs = probs.astype(x.dtype)
            context = jnp.einsum("btv,vd->btd", probs, embedding.astype(x.dtype))
            if self.embed_norm:
                context = nn.LayerNorm(dtype=self.dtype, name="embed_ln")(context)

        def linear_adapter(h):
            # reference linear_adapter: Linear(d→2d) → ReLU → Linear(2d→d)
            # → LayerNorm (adapter.py:117-123)
            h = nn.Dense(2 * self.dim, dtype=self.dtype, name="linear_fc1")(h)
            h = nn.relu(h)
            h = nn.Dense(self.dim, dtype=self.dtype, name="linear_fc2")(h)
            return nn.LayerNorm(dtype=self.dtype, name="linear_norm")(h)

        if t == "linear":
            out = linear_adapter(x)
        elif t == "context":
            out = context
        elif t == "league":
            out = linear_adapter(x) + context
        elif t == "inter_league":
            out = x + context
        elif t == "gated_league":
            lin = linear_adapter(x)
            gate = nn.sigmoid(
                nn.Dense(self.dim, dtype=self.dtype, name="gate")(
                    jnp.concatenate([lin, context], axis=-1)
                )
            )
            out = gate * lin + (1.0 - gate) * context
        else:
            raise ValueError(f"adapter type {t!r} not supported")
        if self.out_norm:
            out = nn.LayerNorm(dtype=self.dtype, name="out_ln")(out)
        return out


def ctc_shrink_matrix(
    ctc_logits: jnp.ndarray,
    lengths: jnp.ndarray,
    blank_id: int = 0,
    strategy: str = "avg",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build a static-shape segment-pooling matrix for CTC shrinking.

    Consecutive frames with the same CTC argmax form a segment; blank segments
    are dropped.  Returns (W, new_lengths) where W: (B, T, T) such that
    ``W @ x`` left-packs segment-pooled representations (rows past
    new_lengths are zero).  This is the matmul formulation of the reference's
    CTCCompressStrategy.{avg,weighted,softmax} (adapter.py:14-78) — the
    output stays (B, T, D) with a mask instead of a data-dependent T'.
    """
    B, T, V = ctc_logits.shape
    pred = jnp.argmax(ctc_logits, axis=-1)  # (B, T)
    valid = jnp.arange(T)[None, :] < lengths[:, None]
    prev = jnp.concatenate([jnp.full((B, 1), -1, pred.dtype), pred[:, :-1]], axis=1)
    is_new = (pred != prev) & valid
    nonblank = (pred != blank_id) & valid
    new_nonblank_seg = is_new & nonblank
    # segment id per frame among kept (non-blank) segments, 0-indexed
    seg_id = jnp.cumsum(new_nonblank_seg.astype(jnp.int32), axis=1) - 1
    keep = nonblank  # frames belonging to kept segments
    new_lengths = jnp.sum(new_nonblank_seg.astype(jnp.int32), axis=1)

    # one-hot scatter: W[b, s, t] = weight of frame t in segment s
    seg_oh = jax.nn.one_hot(
        jnp.where(keep, seg_id, T), T, axis=1, dtype=jnp.float32
    )  # (B, T_out=T, T_in) with dropped frames mapped out of range

    if strategy == "avg":
        counts = jnp.sum(seg_oh, axis=2, keepdims=True)
        W = seg_oh / jnp.maximum(counts, 1.0)
    elif strategy in ("weighted", "softmax"):
        # weight frames by their max CTC prob (weighted) or softmax thereof
        p = jax.nn.softmax(ctc_logits.astype(jnp.float32), axis=-1)
        conf = jnp.max(p, axis=-1)  # (B, T)
        if strategy == "softmax":
            scores = jnp.where(keep, conf, -1e30)[:, None, :] * jnp.ones((1, T, 1))
            scores = jnp.where(seg_oh > 0, scores, -1e30)
            W = jax.nn.softmax(scores, axis=2)
            W = jnp.where(seg_oh > 0, W, 0.0)
        else:
            w = seg_oh * conf[:, None, :]
            W = w / jnp.maximum(jnp.sum(w, axis=2, keepdims=True), 1e-9)
    else:
        raise ValueError(f"shrink strategy {strategy!r} not supported")
    return W.astype(ctc_logits.dtype), new_lengths


def ctc_oracle_probs(
    rng,
    logits,
    lengths,
    tokens,
    token_lengths,
    ratio,
    temperature: float = 1.0,
    smooth: bool = False,
    only_mistake: bool = False,
):
    """Viterbi ground-truth curriculum for PAE re-injection: with per-frame
    probability ``ratio`` substitute the CTC best-alignment one-hot (optionally
    label-smoothed) for the model's softmax(logits / temperature)
    (the torch_imputer best_alignment consumer; reference:
    criterions/ctc.py get_ctc_align + adapter.py:245-256).  Shared by the
    s2t_transformer encoder and SATE's textual encoder."""
    import jax

    from s2t_tpu.ops.ctc import ctc_best_alignment

    lp = jax.lax.stop_gradient(
        jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    )
    aligned, _ = ctc_best_alignment(lp, tokens, lengths, token_lengths)
    V = logits.shape[-1]
    oracle = jax.nn.one_hot(aligned, V, dtype=jnp.float32)
    if smooth:
        # smoothed oracle (reference: adapter.py:254-255)
        oracle = jnp.where(oracle == 1.0, 0.9 + 0.1 / V, 0.1 / V)
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)
    mask = jax.random.uniform(rng, aligned.shape) < ratio
    if only_mistake:
        # substitute only where the CTC argmax missed the aligned label
        # (reference: s2t_transformer.py:1931-1932)
        mask = mask & (jnp.argmax(lp, axis=-1) != aligned)
    return jnp.where(mask[..., None], oracle, probs)

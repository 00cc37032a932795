"""Sampling-based decoding: top-k / top-p (nucleus), K independent samples.

(reference: fairseq/search.py Sampling :622 — replaces beam search when
--sampling is set, with --sampling-topk / --sampling-topp filtering.)

One jitted ``lax.scan`` rollout; each of the K beams per utterance samples
independently.  Finished rows (emitted EOS) freeze to pad.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

NEG = -1e9


def _filter_topk(logprobs: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0:
        return logprobs
    kth = jax.lax.top_k(logprobs, k)[0][..., -1:]
    return jnp.where(logprobs < kth, NEG, logprobs)


def _filter_topp(logprobs: jnp.ndarray, p: float) -> jnp.ndarray:
    if p <= 0 or p >= 1:
        return logprobs
    sorted_lp = jnp.sort(logprobs, axis=-1)[..., ::-1]
    probs = jnp.exp(sorted_lp)
    cum = jnp.cumsum(probs, axis=-1)
    # smallest set with cumulative mass >= p (always keep the top token)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < p], axis=-1
    )
    cutoff = jnp.min(jnp.where(keep_sorted, sorted_lp, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logprobs < cutoff, NEG, logprobs)


def sampling_decode(
    decode_step: Callable,
    init_cache: Any,
    rng: jax.Array,
    batch_size: int,
    num_samples: int,
    max_len: int,
    eos_id: int = 2,
    pad_id: int = 1,
    bos_id: int = 2,
    blank_id: int = 0,
    temperature: float = 1.0,
    topk: int = -1,
    topp: float = -1.0,
    min_len: int = 1,
    noise_uniforms=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens (B, K, L), scores (B, K) total logprob of sampled seq).

    ``noise_uniforms``: optional (L, B*K) uniforms for a deterministic
    inverse-CDF draw over the DESCENDING-sorted candidate list — the same
    contract a torch.multinomial(probs, 1) draw has given the same uniform,
    used to pin token-level parity against the reference Sampling strategy
    (reference: search.py:622-744) under a fixed noise source."""
    B, K, L = batch_size, num_samples, max_len
    N = B * K
    if noise_uniforms is not None:
        noise_uniforms = jnp.asarray(noise_uniforms, jnp.float32)
        assert noise_uniforms.shape == (L, N), noise_uniforms.shape

    def step(carry, i):
        tokens, scores, finished, cache, rng = carry
        prev = jnp.where(
            i == 0, jnp.full((N,), bos_id, jnp.int32), tokens[:, jnp.maximum(i - 1, 0)]
        )
        logprobs, cache = decode_step(prev[:, None], cache, i)
        if temperature != 1.0:
            # decode_step returns NORMALISED log-probs; dividing alone would
            # leave unnormalised masses (wrong top-p cutoffs, scores that are
            # not log-probabilities) — renormalise after sharpening
            logprobs = jax.nn.log_softmax(logprobs / temperature, axis=-1)
        logprobs = logprobs.at[:, pad_id].set(NEG)
        if blank_id is not None and blank_id >= 0:
            # reference fork bans index 0 in every decode
            # (sequence_generator.py:74,401)
            logprobs = logprobs.at[:, blank_id].set(NEG)
        # no EOS before min_len (reference: sequence_generator.py min-len
        # masking applies to every search strategy, sampling included)
        V = logprobs.shape[-1]
        logprobs = jnp.where(
            (i < min_len) & (jnp.arange(V)[None, :] == eos_id), NEG, logprobs
        )
        filtered = _filter_topp(_filter_topk(logprobs, topk), topp)
        filtered = jax.nn.log_softmax(filtered, axis=-1)
        if noise_uniforms is not None:
            kk = topk if topk > 0 else filtered.shape[-1]
            top_lp, top_idx = jax.lax.top_k(filtered, kk)
            cdf = jnp.cumsum(jnp.exp(top_lp), axis=-1)
            u = noise_uniforms[i] * cdf[..., -1]
            pos = jnp.minimum(
                jnp.sum((cdf <= u[:, None]).astype(jnp.int32), axis=-1), kk - 1
            )
            samp = jnp.take_along_axis(top_idx, pos[:, None], axis=-1)[:, 0]
        else:
            rng, sub = jax.random.split(rng)
            samp = jax.random.categorical(sub, filtered, axis=-1)  # (N,)
        # at max_len force EOS; finished rows emit pad
        samp = jnp.where(i == L - 1, eos_id, samp)
        samp = jnp.where(finished, pad_id, samp).astype(jnp.int32)
        tok_lp = jnp.take_along_axis(logprobs, samp[:, None], axis=-1)[:, 0]
        scores = scores + jnp.where(finished, 0.0, tok_lp)
        tokens = tokens.at[:, i].set(samp)
        finished = finished | (samp == eos_id)
        return (tokens, scores, finished, cache, rng), None

    tokens = jnp.full((N, L), pad_id, jnp.int32)
    scores = jnp.zeros((N,))
    finished = jnp.zeros((N,), bool)
    (tokens, scores, finished, _, _), _ = jax.lax.scan(
        step, (tokens, scores, finished, init_cache, rng), jnp.arange(L)
    )
    tokens = tokens.reshape(B, K, L)
    scores = scores.reshape(B, K)
    order = jnp.argsort(-scores, axis=1)
    return (
        jnp.take_along_axis(tokens, order[..., None], axis=1),
        jnp.take_along_axis(scores, order, axis=1),
    )

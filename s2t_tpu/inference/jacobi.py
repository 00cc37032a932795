"""CTC-drafted Jacobi decoding: exact greedy decoding without the
sequential loop.

No reference equivalent — a TPU-native serving capability on top of the
reference's model family.  The autoregressive greedy rollout
``y_i = argmax p(y_i | y_<i, x)`` is the unique fixpoint of the parallel
(Jacobi) iteration

    y  <-  argmax p(. | prefixes of y, x)      (all positions at once)

Each iteration is ONE teacher-forced decoder pass over (B, L) — a large
MXU-friendly matmul workload — instead of L tiny sequential steps through
the KV cache.  The prefix of positions that already match the greedy
trajectory grows by at least one every iteration, so the fixpoint is
reached in <= L iterations and EQUALS sequential greedy decoding exactly
(asserted in tests/test_jacobi.py for arbitrary weights).

S2T twist: the iteration is seeded with the model's own CTC greedy output
(collapsed blanks/repeats) — for speech models the CTC head rides along
with the encoder pass, so the draft is free, positionally aligned with the
attention-decoder output, and usually a near-fixpoint: a well-trained ASR
model converges in a handful of passes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from s2t_tpu.utils.masking import lengths_to_mask


def ctc_greedy_draft(
    ctc_logits: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    max_len: int,
    blank_id: int = 0,
    pad_id: int = 1,
    eos_id: int = 2,
) -> jnp.ndarray:
    """CTC greedy collapse to a fixed-width (B, max_len) draft.

    argmax per frame -> drop repeats -> drop blanks -> left-pack -> append
    EOS; pad-padded.
    """
    B, T, _ = ctc_logits.shape
    pred = jnp.argmax(ctc_logits, axis=-1)  # (B, T)
    valid = lengths_to_mask(enc_lengths, T)
    prev = jnp.concatenate(
        [jnp.full((B, 1), blank_id, pred.dtype), pred[:, :-1]], axis=1
    )
    keep = (pred != blank_id) & (pred != prev) & valid
    # left-pack kept frames (stable static-shape permutation)
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=1, stable=True)
    packed = jnp.take_along_axis(pred, order, axis=1)
    n = jnp.sum(keep, axis=1)  # (B,)
    n = jnp.minimum(n, max_len - 1)  # room for EOS
    pos = jnp.arange(max_len)[None, :]
    if T >= max_len:
        packed = packed[:, :max_len]
    else:
        packed = jnp.pad(packed, ((0, 0), (0, max_len - T)))
    draft = jnp.where(pos < n[:, None], packed, pad_id)
    draft = jnp.where(pos == n[:, None], eos_id, draft).astype(jnp.int32)
    return draft


def jacobi_greedy_decode(
    decode_fn,
    y0: jnp.ndarray,  # (B, L) initial draft, pad-padded, should contain EOS
    max_iters: Optional[int] = None,
    pad_id: int = 1,
    eos_id: int = 2,
    bos_id: int = 2,
    blank_id: Optional[int] = 0,
    min_len: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Iterate y <- argmax(decode_fn(prev(y))) to the greedy fixpoint.

    decode_fn: (B, L) prev_tokens -> (B, L, V) logits (teacher-forced).
    The per-position argmax applies the same token bans as the beam engine
    (pad/blank everywhere, EOS before min_len) so the fixpoint equals
    SequenceGenerator's beam-1 trajectory exactly.
    Returns (tokens (B, L), scores (B,) sum-logprob, n_iters).
    """
    B, L = y0.shape
    max_iters = L if max_iters is None else max_iters

    def masked_argmax(logits):
        neg = jnp.asarray(-1e9, logits.dtype)
        logits = logits.at[:, :, pad_id].set(neg)
        if blank_id is not None and blank_id >= 0:
            logits = logits.at[:, :, blank_id].set(neg)
        if min_len > 0:
            logits = logits.at[:, :min_len, eos_id].set(neg)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def mask_after_eos(y):
        is_eos = y == eos_id
        seen = jnp.cumsum(is_eos.astype(jnp.int32), axis=1)
        # positions strictly after the first EOS become pad
        after = (seen - is_eos.astype(jnp.int32)) > 0
        y = jnp.where(after, pad_id, y)
        # a row with no EOS gets one at the last slot
        has = jnp.any(is_eos, axis=1)
        y = y.at[:, L - 1].set(jnp.where(has, y[:, L - 1], eos_id))
        return y

    y0 = mask_after_eos(y0)

    def body(state):
        y, _, it = state
        prev = jnp.concatenate(
            [jnp.full((B, 1), bos_id, jnp.int32), y[:, :-1]], axis=1
        )
        logits = decode_fn(prev)
        new_y = mask_after_eos(masked_argmax(logits))
        changed = jnp.any(new_y != y)
        return new_y, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    y, _, iters = jax.lax.while_loop(
        cond, body, (y0, jnp.array(True), jnp.asarray(0, jnp.int32))
    )
    # final scores from one more pass (also verifies the fixpoint)
    prev = jnp.concatenate(
        [jnp.full((B, 1), bos_id, jnp.int32), y[:, :-1]], axis=1
    )
    lp = jax.nn.log_softmax(decode_fn(prev).astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(lp, y[:, :, None], axis=2)[:, :, 0]
    not_pad = y != pad_id
    scores = jnp.sum(jnp.where(not_pad, tok_lp, 0.0), axis=1)
    return y, scores, iters


class JacobiGenerator:
    """SequenceGenerator-compatible greedy decoder using CTC-drafted Jacobi
    iteration.  Output tokens are exactly those of sequential greedy
    decoding; wall time scales with the number of draft corrections, not
    the hypothesis length."""

    def __init__(
        self,
        model,
        max_len_b: int = 200,
        max_len_a: float = 0.0,
        max_target_positions: int = 1024,
        max_iters: Optional[int] = None,
        min_len: int = 1,
        lenpen: float = 1.0,
        eos_id: int = 2,
        pad_id: int = 1,
        blank_id: int = 0,
        input_keys: Tuple[str, str] = ("features", "feat_lengths"),
    ):
        self.model = model
        self.max_len_b = max_len_b
        self.max_len_a = max_len_a
        self.max_target_positions = max_target_positions
        self.max_iters = max_iters
        self.min_len = min_len
        self.lenpen = lenpen
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.blank_id = blank_id
        self.input_keys = input_keys
        self._jitted = {}

    def _build(self, max_len: int):
        def run(params, features, feat_lengths):
            enc = self.model.apply(
                {"params": params}, features, feat_lengths,
                method=self.model.encode,
            )
            enc_out = enc["encoder_out"]
            enc_mask = lengths_to_mask(enc["encoder_lengths"], enc_out.shape[1])
            if enc.get("ctc_logits") is not None:
                y0 = ctc_greedy_draft(
                    enc["ctc_logits"].astype(jnp.float32),
                    enc["encoder_lengths"], max_len,
                    blank_id=self.blank_id, pad_id=self.pad_id,
                    eos_id=self.eos_id,
                )
            else:  # no CTC head: cold-start from all-EOS-at-0
                B = enc_out.shape[0]
                y0 = jnp.full((B, max_len), self.pad_id, jnp.int32)
                y0 = y0.at[:, 0].set(self.eos_id)

            def decode_fn(prev):
                return self.model.apply(
                    {"params": params}, prev, enc_out, enc_mask,
                    method=self.model.decode,
                )

            y, scores, iters = jacobi_greedy_decode(
                decode_fn, y0, max_iters=self.max_iters,
                pad_id=self.pad_id, eos_id=self.eos_id, bos_id=self.eos_id,
                blank_id=self.blank_id, min_len=self.min_len,
            )
            # length-penalty-normalised scores, matching SequenceGenerator
            # (hypothesis length includes the EOS)
            hyp_len = jnp.sum((y != self.pad_id).astype(jnp.float32), axis=1)
            scores = scores / jnp.power(jnp.maximum(hyp_len, 1.0), self.lenpen)
            return y[:, None, :], scores[:, None], iters, enc

        return jax.jit(run)

    def generate(self, params, batch: Dict[str, Any]):
        feats = batch[self.input_keys[0]]
        lengths = batch[self.input_keys[1]]
        # same horizon as SequenceGenerator: max_len_a scales the SUBSAMPLED
        # encoder length, not the raw frame count
        enc_T = feats.shape[1]
        ratio = getattr(self.model.cfg, "downsample_ratio", 0)
        if ratio > 1:
            mult = getattr(self.model.cfg, "pad_multiple", 1)
            enc_T = -(-(-(-enc_T // mult) * mult) // ratio)
        else:
            for _ in range(getattr(self.model.cfg, "subsampling_layers", 2)):
                enc_T = (enc_T - 1) // getattr(
                    self.model.cfg, "subsampling_stride", 2
                ) + 1
        max_len = int(min(
            self.max_len_a * enc_T + self.max_len_b,
            self.max_target_positions - 1,
        ))
        key = (feats.shape, max_len)
        if key not in self._jitted:
            self._jitted[key] = self._build(max_len)
        tokens, scores, iters, enc = self._jitted[key](params, feats, lengths)
        self.last_iters = int(iters)
        # third element follows the SequenceGenerator contract (the generate
        # CLI reads ctc_logits from it for --ctc-infer dumps)
        return tokens, scores, enc

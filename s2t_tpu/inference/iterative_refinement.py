"""Iterative refinement decoding for NAT models (mask-predict / LevT).

(reference: fairseq/iterative_refinement_generator.py — loop of
model.forward_decoder steps over a DecoderOut canvas with early termination;
cmlm_transformer.py:71-110 forward_decoder + _skeptical_unmasking.)

TPU design: ONE jitted program — encoder, length prediction, canvas init and
a lax.fori_loop of max_iter refinement steps over a fixed-width (B, Tmax)
canvas.  No dynamic reallocation: predicted lengths clamp to Tmax and the
canvas keeps static shape throughout; "terminated" rows simply stop changing
(mask-predict is idempotent on fully-kept canvases at the last step).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def skeptical_unmask(scores: jnp.ndarray, nonpad: jnp.ndarray, p: jnp.ndarray):
    """Mask of the ``(num_nonpad - 2) * p`` lowest-scoring positions
    (reference: cmlm_transformer.py:18-24 _skeptical_unmasking)."""
    B, T = scores.shape
    num = ((jnp.sum(nonpad, axis=1) - 2).astype(jnp.float32) * p).astype(jnp.int32)
    s = jnp.where(nonpad, scores, jnp.inf)
    order = jnp.argsort(s, axis=1)
    rank = jnp.argsort(order, axis=1)
    return rank < num[:, None]


class IterativeRefinementGenerator:
    """Mask-predict decoding over a fixed canvas.

    generate(params, batch) -> (tokens (B, 1, Tmax), scores (B, 1), enc)
    — the same result contract as SequenceGenerator so generate/validate
    CLIs work unchanged.
    """

    def __init__(
        self,
        model,
        max_iter: int = 10,
        max_target_positions: int = 256,
        bos_id: int = 0,
        pad_id: int = 1,
        eos_id: int = 2,
        unk_id: int = 3,
        beam_size: int = 1,  # interface parity; length-beam not yet supported
    ):
        self.model = model
        self.max_iter = max_iter
        self.Tmax = max_target_positions
        self.bos, self.pad, self.eos, self.unk = bos_id, pad_id, eos_id, unk_id
        self._compiled = {}

    def _build(self, src_shape):
        model = self.model
        Tmax = self.Tmax
        bos, pad, eos, unk = self.bos, self.pad, self.eos, self.unk
        max_iter = self.max_iter

        @jax.jit
        def run(params, src_tokens, src_lengths):
            from s2t_tpu.utils.masking import lengths_to_mask

            enc = model.apply(
                {"params": params}, src_tokens, src_lengths,
                method=type(model).encode,
            )
            enc_out = enc["encoder_out"]
            enc_valid = lengths_to_mask(enc["encoder_lengths"], enc_out.shape[1])
            B = src_tokens.shape[0]

            if hasattr(type(model), "refine_step"):
                # edit-based NAT (Levenshtein): the model owns canvas init and
                # the delete→insert→fill round
                tokens = model.apply(
                    {"params": params}, enc_out, enc_valid, Tmax,
                    method=type(model).init_canvas,
                )
                scores = jnp.zeros((B, Tmax), jnp.float32)

                def lev_body(i, carry):
                    toks, scs = carry
                    return model.apply(
                        {"params": params}, toks, scs, enc_out, enc_valid, i,
                        method=type(model).refine_step,
                    )

                tokens, scores = jax.lax.fori_loop(
                    0, max_iter, lev_body, (tokens, scores)
                )
                n = jnp.sum((tokens != pad).astype(jnp.float32), axis=1)
                seq_scores = jnp.sum(scores, axis=1) / jnp.maximum(n, 1.0)
                return tokens[:, None, :], seq_scores[:, None], enc

            lengths = model.apply(
                {"params": params}, enc_out, enc_valid,
                method=type(model).predict_length,
            )
            lengths = jnp.clip(lengths, 2, Tmax)

            # canvas: unk ... unk eos pad ... — matches the training target
            # convention here (targets carry eos, no bos; the reference
            # prepends bos to bitext targets and to the canvas accordingly)
            pos = jnp.arange(Tmax)[None, :]
            tokens = jnp.where(pos < lengths[:, None] - 1, unk, pad)
            tokens = jnp.where(pos == lengths[:, None] - 1, eos, tokens)
            tokens = tokens.astype(jnp.int32)
            scores = jnp.zeros((B, Tmax), jnp.float32)

            if hasattr(type(model), "crf_decode"):
                # structured single-pass decode (NACRF): emissions once,
                # then Viterbi over the low-rank CRF lattice
                logits = model.apply(
                    {"params": params}, tokens, enc_out, enc_valid,
                    method=type(model).nat_decode,
                )
                fill = tokens == unk
                vit_tokens, vit_score = model.apply(
                    {"params": params}, logits, fill,
                    method=type(model).crf_decode,
                )
                tokens = jnp.where(fill, vit_tokens, tokens)
                seq_scores = vit_score / jnp.maximum(
                    lengths.astype(jnp.float32), 1.0
                )
                return tokens[:, None, :], seq_scores[:, None], enc

            def body(i, carry):
                tokens, scores = carry
                logits = model.apply(
                    {"params": params}, tokens, enc_out, enc_valid,
                    method=type(model).nat_decode,
                )
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                step_scores = jnp.max(lp, axis=-1)
                step_tokens = jnp.argmax(lp, axis=-1).astype(jnp.int32)
                masked = tokens == unk
                tokens = jnp.where(masked, step_tokens, tokens)
                scores = jnp.where(masked, step_scores, scores)
                # skeptical re-masking except after the final iteration
                p = 1.0 - (i + 1).astype(jnp.float32) / float(max_iter)
                remask = skeptical_unmask(scores, tokens != pad, p)
                remask = remask & (i + 1 < max_iter)
                tokens = jnp.where(remask, unk, tokens)
                scores = jnp.where(remask, 0.0, scores)
                return tokens, scores

            tokens, scores = jax.lax.fori_loop(0, max_iter, body, (tokens, scores))
            seq_scores = jnp.sum(scores, axis=1) / jnp.maximum(
                lengths.astype(jnp.float32), 1.0
            )
            return tokens[:, None, :], seq_scores[:, None], enc

        return run

    def generate(self, params, batch: Dict[str, Any]):
        src = batch.get("src_tokens", batch.get("features"))
        lens = batch.get("src_lengths", batch.get("feat_lengths"))
        key = (src.shape, getattr(lens, "shape", None))
        if key not in self._compiled:
            self._compiled[key] = self._build(key)
        return self._compiled[key](params, src, lens)

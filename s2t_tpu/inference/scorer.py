"""SequenceScorer: teacher-forced scoring of given target sequences.

(reference: fairseq/sequence_scorer.py:172 — the --score-reference mode:
per-token log-probs, total score, and positional scores for each target.)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


class SequenceScorer:
    def __init__(self, model, pad_id: int = 1, forward_fn=None):
        self.model = model
        self.pad_id = pad_id
        self.forward_fn = forward_fn
        self._jitted = {}

    def _build(self):
        def run(params, batch):
            if self.forward_fn is not None:
                out = self.forward_fn(self.model, params, batch, True)
            else:
                out = self.model.apply(
                    {"params": params}, batch["features"], batch["feat_lengths"],
                    batch["prev_tokens"], deterministic=True,
                )
            lp = jax.nn.log_softmax(
                out["decoder_logits"].astype(jnp.float32), axis=-1
            )
            tok_lp = jnp.take_along_axis(lp, batch["target"][..., None], axis=-1)[..., 0]
            mask = batch["target"] != self.pad_id
            tok_lp = jnp.where(mask, tok_lp, 0.0)
            total = jnp.sum(tok_lp, axis=-1)
            ntok = jnp.sum(mask, axis=-1)
            return {
                "positional_scores": tok_lp,
                "score": total,
                "avg_score": total / jnp.maximum(ntok, 1),
                "ntokens": ntok,
            }

        return jax.jit(run)

    def score(self, params, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        key = tuple(
            (k, v.shape) for k, v in sorted(batch.items()) if hasattr(v, "shape")
        )
        if key not in self._jitted:
            self._jitted[key] = self._build()
        return self._jitted[key](params, batch)

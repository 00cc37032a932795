"""Masked-LM criterion: CE at dynamically masked positions.

(reference: fairseq/criterions/masked_lm.py:14 — cross-entropy over masked
tokens only, sample_size = number of masked tokens.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from s2t_tpu.registry import register_criterion


@register_criterion("masked_lm")
class MaskedLMCriterion:
    @dataclass
    class Config:
        pad_id: int = 1

    def __init__(self, cfg: "MaskedLMCriterion.Config"):
        self.cfg = cfg

    def __call__(
        self, model_out: Dict[str, Any], batch: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        logits = model_out["lm_logits"].astype(jnp.float32)
        targets = model_out["mlm_targets"]
        mask = model_out["mlm_mask"]
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        nll = jnp.where(mask, nll, 0.0)
        loss = jnp.sum(nll)
        sample_size = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum(jnp.where(mask, (pred == targets).astype(jnp.float32), 0.0))
        logs = {
            "loss": loss, "nll_loss": loss,
            "ntokens": sample_size,
            "nsentences": jnp.asarray(float(targets.shape[0]), jnp.float32),
            "n_correct": correct, "total": sample_size,
        }
        return loss, sample_size, logs

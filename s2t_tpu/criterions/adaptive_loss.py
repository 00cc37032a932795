"""Adaptive loss: NLL through the adaptive softmax's exact target path.

(reference: fairseq/criterions/adaptive_loss.py:23 — per-cluster CE without
materialising the full vocabulary distribution.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from s2t_tpu.registry import register_criterion


@register_criterion("adaptive_loss")
class AdaptiveLoss:
    @dataclass
    class Config:
        sentence_avg: bool = False
        pad_id: int = 1

    def __init__(self, cfg: "AdaptiveLoss.Config"):
        self.cfg = cfg

    def __call__(
        self, model_out: Dict[str, Any], batch: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        targets = batch["target"]
        lp = model_out["target_logprob"]  # (B, U) exact log p(target)
        mask = targets != self.cfg.pad_id
        nll = jnp.where(mask, -lp, 0.0)
        loss = jnp.sum(nll)
        ntokens = jnp.sum(mask.astype(jnp.float32))
        nsent = jnp.asarray(targets.shape[0], jnp.float32)
        sample_size = nsent if self.cfg.sentence_avg else ntokens
        return loss, sample_size, {
            "loss": loss, "nll_loss": loss, "ntokens": ntokens,
            "nsentences": nsent,
        }

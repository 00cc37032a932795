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


@register_criterion("legacy_masked_lm")
class LegacyMaskedLMCriterion:
    """BERT pretraining loss: masked-LM CE + next-sentence-prediction CE
    (reference: fairseq/criterions/legacy_masked_lm.py — lm + sentence
    losses summed, nsp weighted by ``nsp_loss_weight``)."""

    @dataclass
    class Config:
        pad_id: int = 1
        nsp_loss_weight: float = 1.0

    def __init__(self, cfg: "LegacyMaskedLMCriterion.Config"):
        self.cfg = cfg
        self.mlm = MaskedLMCriterion(MaskedLMCriterion.Config(pad_id=cfg.pad_id))

    def __call__(self, model_out, batch):
        loss, sample_size, logs = self.mlm(model_out, batch)
        cls_logits = model_out.get("cls_logits")
        if cls_logits is not None and "nsp_label" in batch:
            lp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
            labels = batch["nsp_label"]
            nsp_nll = -jnp.take_along_axis(lp, labels[:, None], axis=1)[:, 0]
            # batch-padded rows carry no tokens: mask by any-valid
            valid_row = jnp.any(
                model_out["mlm_targets"] != self.cfg.pad_id, axis=1
            )
            nsp_loss = jnp.sum(jnp.where(valid_row, nsp_nll, 0.0))
            pred = jnp.argmax(cls_logits, axis=-1)
            nsp_correct = jnp.sum(
                jnp.where(valid_row, (pred == labels).astype(jnp.float32), 0.0)
            )
            loss = loss + self.cfg.nsp_loss_weight * nsp_loss
            logs = {
                **logs, "loss": loss, "nsp_loss": nsp_loss,
                "nsp_correct": nsp_correct,
                "nsp_total": jnp.sum(valid_row.astype(jnp.float32)),
            }
        return loss, sample_size, logs

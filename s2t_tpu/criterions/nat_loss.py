"""NAT loss: masked-position label-smoothed CE + length-prediction CE.

(reference: fairseq/criterions/nat_loss.py:15 — per-output-head losses with
mean reduction over the head's mask, combined with per-head factors; the
length head contributes length_loss_factor * CE(length).)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from s2t_tpu.registry import register_criterion


def _masked_ls_ce(logits, targets, mask, label_smoothing):
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(lp, axis=-1)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(loss * m) / denom, jnp.sum(nll * m) / denom


@register_criterion("nat_loss")
class NATLoss:
    @dataclass
    class Config:
        label_smoothing: float = 0.1
        length_loss_factor: float = 0.1
        pad_id: int = 1

    def __init__(self, cfg: "NATLoss.Config"):
        self.cfg = cfg

    def __call__(
        self, model_out: Dict[str, Any], batch: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        if "slot_logits" in model_out:
            # insertion transformer: soft (tree-weighted) slot distributions
            # (reference: insertion_transformer.py _get_ins_targets + CE)
            lp = jax.nn.log_softmax(
                model_out["slot_logits"].astype(jnp.float32), axis=-1
            )
            soft = model_out["slot_tgt"]
            valid = model_out["slot_valid"].astype(jnp.float32)
            per_slot = -jnp.sum(soft * lp, axis=-1)
            denom = jnp.maximum(jnp.sum(valid), 1.0)
            loss = jnp.sum(per_slot * valid) / denom
            tgt = batch["target"]
            logs = {
                "loss": loss, "nll_loss": loss,
                "ntokens": jnp.sum((tgt != self.cfg.pad_id).astype(jnp.float32)),
                "nsentences": jnp.asarray(tgt.shape[0], jnp.float32),
            }
            return loss, jnp.asarray(1.0, jnp.float32), logs

        targets = model_out.get("word_ins_tgt", batch["target"])
        word_loss, word_nll = _masked_ls_ce(
            model_out["word_ins_logits"], targets,
            model_out["word_ins_mask"], self.cfg.label_smoothing,
        )
        loss = word_loss
        logs: Dict[str, jnp.ndarray] = {"word_ins_loss": word_loss, "nll_loss": word_nll}
        if "crf_nll" in model_out:
            # structured word loss (reference: nacrf_transformer.py — CRF
            # sequence nll plus a down-weighted token CE)
            ntok = jnp.maximum(
                jnp.sum((targets != self.cfg.pad_id).astype(jnp.float32)), 1.0
            )
            crf_loss = jnp.sum(model_out["crf_nll"]) / ntok
            factor = model_out.get("word_ins_factor", 0.5)
            loss = factor * word_loss + crf_loss
            logs["crf_loss"] = crf_loss
            logs["nll_loss"] = crf_loss
        # Levenshtein heads: per-gap insertion counts + per-token deletion
        # (reference: levenshtein_transformer.py forward returns mask_ins /
        # word_del heads with 0.01-smoothed CE)
        if "ins_logits" in model_out:
            ins_loss, _ = _masked_ls_ce(
                model_out["ins_logits"], model_out["ins_tgt"],
                model_out["ins_mask"], 0.01,
            )
            loss = loss + ins_loss
            logs["ins_loss"] = ins_loss
        if "del_logits" in model_out:
            del_loss, _ = _masked_ls_ce(
                model_out["del_logits"], model_out["del_tgt"],
                model_out["del_mask"], 0.01,
            )
            loss = loss + del_loss
            logs["del_loss"] = del_loss
        if "length_logits" in model_out and "length_tgt" in model_out:
            llp = jax.nn.log_softmax(
                model_out["length_logits"].astype(jnp.float32), axis=-1
            )
            lt = model_out["length_tgt"]
            length_loss = -jnp.mean(
                jnp.take_along_axis(llp, lt[:, None], axis=-1)
            )
            loss = loss + self.cfg.length_loss_factor * length_loss
            logs["length_loss"] = length_loss
        ntokens = jnp.sum((targets != self.cfg.pad_id).astype(jnp.float32))
        nsent = jnp.asarray(targets.shape[0], jnp.float32)
        # per-head losses are already mean-reduced (reference nat_loss):
        # sample_size=1 so the trainer's global normalisation is a no-op
        sample_size = jnp.asarray(1.0, jnp.float32)
        logs.update({"loss": loss, "ntokens": ntokens, "nsentences": nsent})
        return loss, sample_size, logs

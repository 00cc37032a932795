"""wav2vec 2.0 criterion: InfoNCE + codebook diversity + feature penalty.

(reference: fairseq/criterions/wav2vec_criterion.py:37-139 — cross entropy
over the (1+N, B, M) contrastive logits with target index 0, plus
loss_weights = [prob_perplexity_weight, features_pen_weight]; the recipe
default is [0.1, 10].)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from s2t_tpu.registry import register_criterion


@register_criterion("wav2vec")
class Wav2VecCriterion:
    @dataclass
    class Config:
        infonce: bool = True
        prob_ppl_weight: float = 0.1
        features_pen_weight: float = 10.0

    def __init__(self, cfg: "Wav2VecCriterion.Config"):
        self.cfg = cfg

    def _cpc_v1(
        self, model_out: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """wav2vec v1 CPC loss over dense (B, T, steps, 1+N) scores
        (reference: wav2vec_criterion.py:64-77 — infonce cross-entropy with
        target 0, else binary cross-entropy with the positive column labelled
        1 and optional 1/num_negatives weights on the negatives)."""
        logits = model_out["cpc_logits"].astype(jnp.float32)
        valid = model_out["cpc_valid"]  # (B, T, steps)
        B = logits.shape[0]
        if model_out.get("infonce"):
            lp = jax.nn.log_softmax(logits, axis=-1)
            nll = jnp.where(valid, -lp[..., 0], 0.0)
            loss = jnp.sum(nll)
            sample_size = jnp.sum(valid).astype(jnp.float32)
            pred = jnp.argmax(logits, axis=-1)
            correct = jnp.sum(jnp.where(valid, (pred == 0).astype(jnp.float32), 0.0))
        else:
            labels = jnp.zeros_like(logits).at[..., 0].set(1.0)
            bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
                jnp.exp(-jnp.abs(logits))
            )
            if model_out.get("balanced_classes"):
                w = jnp.full_like(logits, 1.0 / max(model_out["num_negatives"], 1))
                w = w.at[..., 0].set(1.0)
                bce = bce * w
            bce = jnp.where(valid[..., None], bce, 0.0)
            loss = jnp.sum(bce)
            # reference sample_size = number of positive targets
            sample_size = jnp.sum(valid).astype(jnp.float32)
            correct = jnp.sum(
                jnp.where(valid, (logits[..., 0] > 0).astype(jnp.float32), 0.0)
            )
        logs = {
            "nll_loss": loss,
            "ntokens": sample_size,
            "nsentences": jnp.asarray(float(B), jnp.float32),
            "n_correct": correct,
            "total": sample_size,
        }
        # v1 extra losses (reference wav2vec.py get_extra_losses:345-352 +
        # criterion loss_weights scaling): gumbel diversity or kmeans VQ
        if "kmeans_loss" in model_out:
            extra = model_out["kmeans_loss"] * sample_size
            loss = loss + extra
            logs["kmeans_loss"] = model_out["kmeans_loss"]
        elif "prob_perplexity" in model_out and self.cfg.prob_ppl_weight > 0:
            nv = model_out["num_vars"]
            div = (nv - model_out["prob_perplexity"]) / nv
            extra = self.cfg.prob_ppl_weight * div * sample_size
            loss = loss + extra
            logs["diversity_loss"] = extra
        logs["loss"] = loss
        return loss, sample_size, logs

    def __call__(
        self, model_out: Dict[str, Any], batch: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        if "cpc_logits" in model_out:
            return self._cpc_v1(model_out)
        logits = model_out["logits"].astype(jnp.float32)  # (1+N, B, M)
        K, B, M = logits.shape
        valid = model_out.get("mask_valid")
        if valid is None:
            valid = jnp.ones((B, M), bool)

        # InfoNCE: true target is index 0 along the candidates axis
        lp = jax.nn.log_softmax(logits, axis=0)
        nll = -lp[0]  # (B, M)
        nll = jnp.where(valid, nll, 0.0)
        sample_size = jnp.sum(valid).astype(jnp.float32)
        loss = jnp.sum(nll)

        logs = {"contrastive_loss": loss, "nll_loss": loss}
        if "prob_perplexity" in model_out and self.cfg.prob_ppl_weight > 0:
            num_vars = model_out["num_vars"]
            div = (num_vars - model_out["prob_perplexity"]) / num_vars
            ppl_loss = self.cfg.prob_ppl_weight * div * sample_size
            loss = loss + ppl_loss
            logs["prob_perplexity"] = model_out["prob_perplexity"]
            logs["diversity_loss"] = ppl_loss
        if "features_pen" in model_out and self.cfg.features_pen_weight > 0:
            pen = self.cfg.features_pen_weight * model_out["features_pen"] * sample_size
            loss = loss + pen
            logs["features_pen"] = model_out["features_pen"]

        # training accuracy of the contrastive task (reference logs correct/count)
        pred = jnp.argmax(logits, axis=0)
        correct = jnp.sum(jnp.where(valid, (pred == 0).astype(jnp.float32), 0.0))
        logs.update({
            "loss": loss,
            "ntokens": sample_size,
            "nsentences": jnp.asarray(float(B), jnp.float32),
            "n_correct": correct,
            "total": sample_size,
        })
        return loss, sample_size, logs

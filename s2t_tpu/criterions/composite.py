"""Composite / model-supplied criterions.

(reference: fairseq/criterions/composite_loss.py:11-60 — averages an
underlying criterion over a list of model outputs and targets;
fairseq/criterions/model_criterion.py:30-115 — the model emits a
``losses`` dict, weighted-summed by config.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp

from s2t_tpu.registry import register_criterion


@register_criterion("composite_loss")
class CompositeLoss:
    """Average an underlying criterion over multiple (output, target) pairs.

    The model output carries ``outputs`` — a tuple of per-head model-output
    dicts — and the batch carries matching ``targets``; the underlying
    criterion runs on each pair (reference composite_loss.py semantics for
    multi-head models)."""

    @dataclass
    class Config:
        underlying_criterion: str = "label_smoothed_cross_entropy"
        underlying_cfg: Dict[str, Any] = field(default_factory=dict)

    def __init__(self, cfg: "CompositeLoss.Config"):
        from s2t_tpu.criterions import build_criterion

        self.cfg = cfg
        self.underlying = build_criterion(
            cfg.underlying_criterion, cfg.underlying_cfg
        )

    def __call__(
        self, model_out: Dict[str, Any], batch: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        outputs = model_out.get("outputs", (model_out,))
        if not outputs:
            raise ValueError("composite_loss needs at least one model output")
        targets = batch.get("targets")
        total = jnp.zeros((), jnp.float32)
        n = jnp.zeros((), jnp.float32)
        logs: Dict[str, jnp.ndarray] = {}
        for i, out in enumerate(outputs):
            b = dict(batch)
            if targets is not None:
                b["target"] = targets[i]
            loss_i, n_i, logs_i = self.underlying(out, b)
            total = total + loss_i.astype(jnp.float32)
            n = n + n_i.astype(jnp.float32)
            logs[f"loss_{i}"] = loss_i
        k = max(len(outputs), 1)
        total = total / k
        n = n / k
        logs["loss"] = total
        logs["ntokens"] = n
        logs.setdefault("nsentences", logs_i.get("nsentences", n))
        return total, n, logs


@register_criterion("model")
class ModelCriterion:
    """The model supplies its own loss terms: model_out["losses"] is a
    name -> scalar dict, combined by ``loss_weights`` (default 1.0 each);
    extra model-out keys named in ``log_keys`` are logged
    (reference model_criterion.py:30-115)."""

    @dataclass
    class Config:
        loss_weights: Dict[str, float] = field(default_factory=dict)
        log_keys: List[str] = field(default_factory=list)

    def __init__(self, cfg: "ModelCriterion.Config"):
        self.cfg = cfg

    def __call__(
        self, model_out: Dict[str, Any], batch: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        losses = model_out["losses"]
        sample_size = jnp.asarray(
            model_out.get("sample_size", batch.get("ntokens", 1.0)), jnp.float32
        )
        total = jnp.zeros((), jnp.float32)
        logs: Dict[str, jnp.ndarray] = {}
        for name, value in losses.items():
            w = float(self.cfg.loss_weights.get(name, 1.0))
            if w == 0.0:
                continue
            contrib = w * value.astype(jnp.float32)
            total = total + contrib
            logs[f"loss_{name}"] = contrib
        for key in self.cfg.log_keys:
            if key in model_out:
                logs[key] = model_out[key]
        logs["loss"] = total
        logs["ntokens"] = sample_size
        logs["nsentences"] = jnp.asarray(
            batch.get("nsentences", 1.0), jnp.float32
        )
        return total, sample_size, logs

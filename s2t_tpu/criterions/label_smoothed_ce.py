"""Label-smoothed cross-entropy (reference: fairseq/criterions/
label_smoothed_cross_entropy.py:63 — same epsilon semantics: uniform smoothing
over the full vocab excluding only padding positions from the loss).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from s2t_tpu.registry import register_criterion


def label_smoothed_nll_loss_per_row(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    epsilon: float,
    pad_id: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sentence (B,) smoothed loss and nll sums over non-pad positions."""
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    V = lprobs.shape[-1]
    nll = -jnp.take_along_axis(lprobs, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.sum(lprobs, axis=-1)
    mask = targets != pad_id
    nll = jnp.where(mask, nll, 0.0)
    smooth = jnp.where(mask, smooth, 0.0)
    eps_i = epsilon / (V - 1)
    loss = (1.0 - epsilon - eps_i) * nll + eps_i * smooth
    return jnp.sum(loss, axis=-1), jnp.sum(nll, axis=-1)


def label_smoothed_nll_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    epsilon: float,
    pad_id: int = 1,
    mixup: dict | None = None,
    cal_mixup_loss: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (smoothed_loss_sum, nll_loss_sum) over non-pad positions.

    Matches fairseq's formulation: eps_i = eps / (V - 1);
    loss = (1 - eps - eps_i) * nll + eps_i * sum_neg_logprob.
    With ``mixup`` (from the encoder), mixed rows take
    λ·loss(target) + (1-λ)·loss(target[perm]) (reference:
    label_smoothed_cross_entropy_with_ctc.py mixup handling :119-132).
    ``cal_mixup_loss=False`` skips the CE term on mixed rows entirely
    (reference: label_smoothed_cross_entropy.py:176 cal_mixup_loss).
    """
    if mixup is None:
        loss, nll = label_smoothed_nll_loss_per_row(logits, targets, epsilon, pad_id)
        return jnp.sum(loss), jnp.sum(nll)
    # index-formulation mixup: decoder row r is scored against both source
    # utterances' targets, weighted per-row (reference:
    # label_smoothed_cross_entropy.py:134-190, mixup_decoder_emb path)
    coef, i1, i2, flag = (
        mixup["coef"], mixup["index1"], mixup["index2"], mixup["flag"],
    )
    l1, n1 = label_smoothed_nll_loss_per_row(logits, targets[i1], epsilon, pad_id)
    l2, n2 = label_smoothed_nll_loss_per_row(logits, targets[i2], epsilon, pad_id)
    mixed_l = coef * l1 + (1.0 - coef) * l2 if cal_mixup_loss else 0.0
    mixed_n = coef * n1 + (1.0 - coef) * n2 if cal_mixup_loss else 0.0
    loss = jnp.where(flag, mixed_l, l1)
    nll = jnp.where(flag, mixed_n, n1)
    w = mixup.get("weight")
    if w is not None:  # ratio-decayed / appended-but-inactive rows
        loss, nll = loss * w, nll * w
    return jnp.sum(loss), jnp.sum(nll)


def decoder_mixup_consistent_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mixup: dict,
    pad_id: int = 1,
) -> jnp.ndarray:
    """KL(student=mixed decoder rows || teacher=stop-grad original rows),
    coef-weighted per source and masked by the teacher target's pads
    (AIPA; reference: label_smoothed_cross_entropy.py:189-204).

    Teacher rows live at ``original_index - keep_boundary`` in the current
    batch (keep_boundary 0 under keep_org: originals sit at their own
    index); sources whose original row was dropped are skipped."""
    coef, i1, i2, flag = (
        mixup["coef"], mixup["index1"], mixup["index2"], mixup["flag"],
    )
    kb = mixup["keep_boundary"]
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def term(idx, w):
        avail = flag & (idx >= kb)
        trow = jnp.clip(idx - kb, 0, lp.shape[0] - 1)
        teacher = jax.lax.stop_gradient(lp[trow])
        kl = jnp.sum(jnp.exp(teacher) * (teacher - lp), axis=-1)  # (B, U)
        kl = jnp.maximum(kl, 0.0)
        pad_mask = targets[jnp.clip(idx, 0, targets.shape[0] - 1)] != pad_id
        kl = jnp.where(pad_mask & avail[:, None], kl, 0.0)
        return jnp.sum(jnp.sum(kl, axis=1) * w)

    return term(i1, coef) + term(i2, 1.0 - coef)


def ce_accuracy(logits, targets, pad_id=1):
    mask = targets != pad_id
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum(jnp.where(mask, (pred == targets).astype(jnp.float32), 0.0))
    total = jnp.sum(mask.astype(jnp.float32))
    return correct, total


@register_criterion("cross_entropy")
@register_criterion("label_smoothed_cross_entropy")
class LabelSmoothedCE:
    @dataclass
    class Config:
        label_smoothing: float = 0.1
        sentence_avg: bool = False
        report_accuracy: bool = True
        pad_id: int = 1

    def __init__(self, cfg: "LabelSmoothedCE.Config"):
        self.cfg = cfg

    def __call__(
        self, model_out: Dict[str, Any], batch: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        logits = model_out["decoder_logits"]
        targets = batch["target"]
        loss, nll = label_smoothed_nll_loss(
            logits, targets, self.cfg.label_smoothing, self.cfg.pad_id,
            mixup=model_out.get("mixup"),
        )
        ntokens = jnp.sum((targets != self.cfg.pad_id).astype(jnp.float32))
        nsent = jnp.asarray(targets.shape[0], jnp.float32)
        sample_size = nsent if self.cfg.sentence_avg else ntokens
        logs = {"loss": loss, "nll_loss": nll, "ntokens": ntokens, "nsentences": nsent}
        if self.cfg.report_accuracy:
            correct, total = ce_accuracy(logits, targets, self.cfg.pad_id)
            logs["n_correct"] = correct
            logs["total"] = total
        return loss, sample_size, logs


@register_criterion("label_smoothed_cross_entropy_with_alignment")
class LabelSmoothedCEWithAlignment:
    """CE + supervised attention alignment (reference:
    criterions/label_smoothed_cross_entropy_with_alignment.py — the
    alignment loss is -log attn[tgt_j, src_i] summed over the word-aligned
    pairs, scaled by --alignment-lambda)."""

    @dataclass
    class Config:
        label_smoothing: float = 0.1
        sentence_avg: bool = False
        report_accuracy: bool = True
        pad_id: int = 1
        alignment_lambda: float = 0.05

    def __init__(self, cfg: "LabelSmoothedCEWithAlignment.Config"):
        self.cfg = cfg

    def __call__(self, model_out, batch):
        base_cfg = LabelSmoothedCE.Config(
            label_smoothing=self.cfg.label_smoothing,
            sentence_avg=self.cfg.sentence_avg,
            report_accuracy=self.cfg.report_accuracy, pad_id=self.cfg.pad_id,
        )
        loss, sample_size, logs = LabelSmoothedCE(base_cfg)(model_out, batch)
        attn = model_out.get("align_attn")
        pairs = batch.get("alignments")
        if attn is not None and pairs is not None:
            # pairs (B, P, 2) = (src_idx, tgt_idx), -1-padded
            src_i = pairs[..., 0]
            tgt_j = pairs[..., 1]
            valid = (src_i >= 0) & (tgt_j >= 0)
            b_ix = jnp.arange(attn.shape[0])[:, None]
            p = attn[b_ix, jnp.maximum(tgt_j, 0), jnp.maximum(src_i, 0)]
            nll = -jnp.log(jnp.clip(p.astype(jnp.float32), 1e-9))
            align_loss = jnp.sum(jnp.where(valid, nll, 0.0))
            loss = loss + self.cfg.alignment_lambda * align_loss
            logs["alignment_loss"] = align_loss
            logs["loss"] = loss
        return loss, sample_size, logs

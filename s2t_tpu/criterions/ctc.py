"""CTC criterion family — the S2T centerpiece.

(reference: fairseq/criterions/ctc.py:156-1341 and
label_smoothed_cross_entropy_with_ctc.py:25 — weights for ctc / inter-CTC /
XCTC / inter-XCTC, entropy regularisation, inter-layer self-distillation,
composed under label-smoothed CE.)

Blank convention follows the reference: blank = index 0 (``<s>``) unless the
dictionary defines a dedicated symbol (reference: criterions/ctc.py:191-195).
CTC targets are transcript tokens with pad/eos stripped (:365).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from s2t_tpu.criterions.label_smoothed_ce import LabelSmoothedCE, label_smoothed_nll_loss
from s2t_tpu.ops.ctc import ctc_loss
from s2t_tpu.registry import register_criterion


def _masked_log_softmax(logits, axis=-1):
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=axis)


@register_criterion("ctc")
class CTCCriterion:
    @dataclass
    class Config:
        ctc_weight: float = 1.0
        inter_ctc_weight: float = 0.0
        xctc_weight: float = 0.0
        inter_xctc_weight: float = 0.0
        # CTC over the ALIGNED target text (AXCTC; reference: ctc.py:82-96)
        axctc_weight: float = 0.0
        inter_axctc_weight: float = 0.0
        ctc_entropy_weight: float = 0.0
        ctc_self_distill_weight: float = 0.0
        ctc_self_distill_temperature: float = 1.0
        # mixup consistency: KL(mixed posterior || unmixed sources' posterior)
        # (reference: ctc.py:120-126,931-985)
        ctc_mixup_consistent_weight: float = 0.0
        inter_ctc_mixup_consistent_weight: float = 0.0
        # map inter-CTC head i -> transcript level "transcript{k}" in the
        # batch (MLO multi-level objectives; reference: ctc.py:578-586)
        inter_ctc_mlo: Tuple[int, ...] = ()
        sentence_avg: bool = False
        pad_id: int = 1
        eos_id: int = 2
        blank_id: int = 0
        zero_infinity: bool = True

    def __init__(self, cfg: "CTCCriterion.Config"):
        self.cfg = cfg

    def _one_ctc(self, logits, enc_lengths, tokens, token_lengths, mixup=None,
                 fused=None):
        # raw logits path: the loss normalizes via a fused logsumexp instead
        # of materializing f32 log_softmax over (B, T, V); with ``fused``
        # (head internals) the emissions come from a small gather-matmul on
        # the head input and never touch the logits tensor (ops/ctc.py)
        if mixup is not None and fused is not None and "norm" not in fused:
            # both mixed-target rows share the head: one normalizer pass
            from s2t_tpu.ops.ctc import _fused_head_logsumexp

            fused = {**fused, "norm": _fused_head_logsumexp(fused)}

        def rows(tk, tl):
            return ctc_loss(
                logits, tk, enc_lengths, tl,
                blank_id=self.cfg.blank_id, reduction="none",
                zero_infinity=self.cfg.zero_infinity, normalized=False,
                fused_head=fused,
            )

        if mixup is None:
            return jnp.sum(rows(tokens, token_lengths))
        # index-formulation mixup: row r was built from utterances idx1/idx2
        # with per-row coef (reference: criterions/ctc.py mixup dual targets)
        coef, i1, i2, flag = (
            mixup["coef"], mixup["index1"], mixup["index2"], mixup["flag"],
        )
        l1 = rows(tokens[i1], token_lengths[i1])
        l2 = rows(tokens[i2], token_lengths[i2])
        loss = jnp.where(flag, coef * l1 + (1.0 - coef) * l2, l1)
        w = mixup.get("weight")
        if w is not None:  # ratio-decayed / appended-but-inactive rows
            loss = loss * w
        return jnp.sum(loss)

    def _mixup_consistent(self, logits, enc_lengths, mixup) -> jnp.ndarray:
        """KL(student=mixed rows || teacher=stop-grad unmixed source rows)."""
        coef, i1, i2, flag = (
            mixup["coef"], mixup["index1"], mixup["index2"], mixup["flag"],
        )
        m = mixup["keep_boundary"]
        lp = _masked_log_softmax(logits)  # (B, T, V)
        T = lp.shape[1]
        frames = jnp.arange(T)[None, :]

        def term(idx, w):
            avail = flag & (idx >= m)
            trow = jnp.clip(idx - m, 0, lp.shape[0] - 1)
            teacher = jax.lax.stop_gradient(lp[trow])
            kl = jnp.sum(jnp.exp(teacher) * (teacher - lp), axis=-1)  # (B, T)
            kl = jnp.maximum(kl, 0.0)  # clamp fp rounding noise
            valid = frames < enc_lengths[trow][:, None]
            kl = jnp.where(valid & avail[:, None], kl, 0.0)
            return jnp.sum(jnp.sum(kl, axis=1) * w)

        return term(i1, coef) + term(i2, 1.0 - coef)

    def compute_ctc_loss(
        self, model_out: Dict[str, Any], batch: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Compose all CTC branches (reference: criterions/ctc.py:542-1103)."""
        cfg = self.cfg
        # ctc_lengths diverges from encoder_lengths when the encoder pools
        # its output back after CTC-upsampling (transformer_ctc
        # out-downsampling: CTC logits stay at the upsampled rate)
        enc_lengths = model_out.get("ctc_lengths")
        if enc_lengths is None:
            enc_lengths = model_out["encoder_lengths"]
        mixup = model_out.get("mixup")
        logs: Dict[str, jnp.ndarray] = {}
        total = jnp.asarray(0.0, jnp.float32)

        transcript = batch.get("transcript")
        transcript_lengths = batch.get("transcript_lengths")
        if transcript is None:  # ASR: CTC over the target tokens
            # strip the terminal EOS like the xctc branch — CTC labels never
            # include </s> (reference blank/eos convention); lengths are
            # recomputed AFTER the rewrite
            tgt = batch["target"]
            transcript = jnp.where(tgt == cfg.eos_id, cfg.pad_id, tgt)
            transcript_lengths = jnp.sum(
                (transcript != cfg.pad_id).astype(jnp.int32), axis=1
            )

        if cfg.ctc_weight > 0 and model_out.get("ctc_logits") is not None:
            l = self._one_ctc(
                model_out["ctc_logits"], enc_lengths, transcript,
                transcript_lengths, mixup,
                fused=model_out.get("ctc_fused"),
            )
            logs["ctc_loss"] = l
            total = total + cfg.ctc_weight * l

        inter = model_out.get("inter_ctc_logits") or ()
        if cfg.inter_ctc_weight > 0 and len(inter) > 0:
            il = jnp.asarray(0.0, jnp.float32)
            for i, entry in enumerate(inter):
                # taps are (layer_idx, logits) or, when they sit at a
                # different time scale than the final output (PDS stages),
                # (layer_idx, logits, lengths)
                logits = entry[1]
                tap_lengths = entry[2] if len(entry) > 2 else enc_lengths
                tk, tl = transcript, transcript_lengths
                if cfg.inter_ctc_mlo and i < len(cfg.inter_ctc_mlo):
                    # MLO: inter head i scores transcript level k
                    # (reference: ctc.py:578-586 per-level targets)
                    k = cfg.inter_ctc_mlo[i]
                    if f"transcript{k}" in batch:
                        tk = batch[f"transcript{k}"]
                        tl = batch[f"transcript{k}_lengths"]
                il = il + self._one_ctc(logits, tap_lengths, tk, tl, mixup)
            il = il / len(inter)
            logs["inter_ctc_loss"] = il
            total = total + cfg.inter_ctc_weight * il

        if cfg.xctc_weight > 0 and model_out.get("xctc_logits") is not None:
            tgt = batch["target"]
            # strip EOS for CTC over target text (reference: ctc.py:365)
            tgt_ctc = jnp.where((tgt == cfg.eos_id), cfg.pad_id, tgt)
            tgt_lengths = jnp.sum((tgt_ctc != cfg.pad_id).astype(jnp.int32), axis=1)
            l = self._one_ctc(
                model_out["xctc_logits"], enc_lengths, tgt_ctc, tgt_lengths, mixup
            )
            logs["xctc_loss"] = l
            total = total + cfg.xctc_weight * l

        inter_x = model_out.get("inter_xctc_logits") or ()
        if cfg.inter_xctc_weight > 0 and len(inter_x) > 0:
            tgt = batch["target"]
            tgt_ctc = jnp.where((tgt == cfg.eos_id), cfg.pad_id, tgt)
            tgt_lengths = jnp.sum((tgt_ctc != cfg.pad_id).astype(jnp.int32), axis=1)
            il = jnp.asarray(0.0, jnp.float32)
            for entry in inter_x:
                il = il + self._one_ctc(
                    entry[1], entry[2] if len(entry) > 2 else enc_lengths,
                    tgt_ctc, tgt_lengths, mixup,
                )
            il = il / len(inter_x)
            logs["inter_xctc_loss"] = il
            total = total + cfg.inter_xctc_weight * il

        # AXCTC: CTC against the aligned target text on the aligned-CTC head
        # (falls back to the XCTC head's logits when the model has no
        # dedicated axctc head) — reference: criterions/ctc.py axctc branches
        if (cfg.axctc_weight > 0 or cfg.inter_axctc_weight > 0) and (
            "aligned_target" in batch
        ):
            atgt = batch["aligned_target"]
            atgt_ctc = jnp.where(atgt == cfg.eos_id, cfg.pad_id, atgt)
            # always recompute lengths AFTER the eos->pad rewrite: the
            # collater's aligned_target_lengths still count the EOS slot
            alen = jnp.sum((atgt_ctc != cfg.pad_id).astype(jnp.int32), axis=1)
            ax_logits = model_out.get("axctc_logits")
            if ax_logits is None:
                ax_logits = model_out.get("xctc_logits")
            if cfg.axctc_weight > 0 and ax_logits is not None:
                l = self._one_ctc(ax_logits, enc_lengths, atgt_ctc, alen, mixup)
                logs["axctc_loss"] = l
                total = total + cfg.axctc_weight * l
            inter_ax = model_out.get("inter_axctc_logits") or model_out.get(
                "inter_xctc_logits"
            ) or ()
            if cfg.inter_axctc_weight > 0 and len(inter_ax) > 0:
                il = jnp.asarray(0.0, jnp.float32)
                for entry in inter_ax:
                    il = il + self._one_ctc(
                        entry[1], entry[2] if len(entry) > 2 else enc_lengths,
                        atgt_ctc, alen, mixup,
                    )
                il = il / len(inter_ax)
                logs["inter_axctc_loss"] = il
                total = total + cfg.inter_axctc_weight * il

        # mixup consistency regularisation (reference: ctc.py:931-985):
        # KL(mixed-row posterior || stop-grad posterior of each source row),
        # weighted by the mixing coefficient.  Original utterance j sits at
        # row j - keep_boundary when j >= keep_boundary (encoder layout).
        if (
            cfg.ctc_mixup_consistent_weight > 0
            and mixup is not None
            and model_out.get("ctc_logits") is not None
        ):
            cl = self._mixup_consistent(
                model_out["ctc_logits"], enc_lengths, mixup
            )
            logs["ctc_mixup_consistent_loss"] = cl
            total = total + cfg.ctc_mixup_consistent_weight * cl
        if (
            cfg.inter_ctc_mixup_consistent_weight > 0
            and mixup is not None
            and len(inter) > 0
        ):
            il = jnp.asarray(0.0, jnp.float32)
            for _, logits in inter:
                il = il + self._mixup_consistent(logits, enc_lengths, mixup)
            il = il / len(inter)
            logs["inter_ctc_mixup_consistent_loss"] = il
            total = total + cfg.inter_ctc_mixup_consistent_weight * il

        if cfg.ctc_entropy_weight > 0 and model_out.get("ctc_logits") is not None:
            # mean per-frame entropy of the CTC posterior (reference :640+)
            lp = _masked_log_softmax(model_out["ctc_logits"])
            p = jnp.exp(lp)
            ent = -jnp.sum(p * lp, axis=-1)  # (B, T)
            T = ent.shape[1]
            mask = jnp.arange(T)[None, :] < enc_lengths[:, None]
            ent = jnp.sum(jnp.where(mask, ent, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
            logs["ctc_entropy"] = ent
            total = total + cfg.ctc_entropy_weight * ent

        if (
            cfg.ctc_self_distill_weight > 0
            and len(inter) > 0
            and model_out.get("ctc_logits") is not None
        ):
            # KL(final || inter) per frame, averaged (reference :477-541)
            tau = cfg.ctc_self_distill_temperature
            # teacher is detached (reference detaches teacher_logit in
            # fairseq/criterions/ctc.py self-distill branch): gradients must
            # only flow into the inter-layer students
            teacher = _masked_log_softmax(
                jax.lax.stop_gradient(model_out["ctc_logits"]) / tau
            )
            T = teacher.shape[1]
            mask = (jnp.arange(T)[None, :] < enc_lengths[:, None])[..., None]
            kd = jnp.asarray(0.0, jnp.float32)
            for _, logits in inter:
                student = _masked_log_softmax(logits / tau)
                kl = jnp.exp(teacher) * (teacher - student)
                kd = kd + jnp.sum(jnp.where(mask, kl, 0.0))
            kd = kd / len(inter)
            logs["ctc_self_distill_loss"] = kd
            total = total + cfg.ctc_self_distill_weight * kd

        return total, logs

    def __call__(self, model_out, batch):
        loss, logs = self.compute_ctc_loss(model_out, batch)
        ntokens = jnp.asarray(batch.get("ntokens", 1), jnp.float32)
        ref = batch.get("target", batch.get("transcript"))
        nsent = jnp.asarray(ref.shape[0], jnp.float32)
        sample_size = nsent if self.cfg.sentence_avg else ntokens
        logs.update({"loss": loss, "ntokens": ntokens, "nsentences": nsent})
        return loss, sample_size, logs


@register_criterion("join_speech_and_text_loss")
class JoinSpeechAndTextLoss:
    """CE + CTC for dual/multibranch models: loss = (1 - ctc_weight)·CE +
    CTC branches (reference: criterions/join_speech_and_text_loss.py:19-100
    — the CE term is down-weighted by the main ctc weight)."""

    @dataclass
    class Config:
        label_smoothing: float = 0.1
        sentence_avg: bool = False
        report_accuracy: bool = True
        pad_id: int = 1
        ctc: "CTCCriterion.Config" = field(default_factory=lambda: CTCCriterion.Config())

    def __init__(self, cfg: "JoinSpeechAndTextLoss.Config"):
        self.cfg = cfg
        self.inner = LabelSmoothedCEWithCTC(
            LabelSmoothedCEWithCTC.Config(
                label_smoothing=cfg.label_smoothing,
                sentence_avg=cfg.sentence_avg,
                report_accuracy=cfg.report_accuracy,
                pad_id=cfg.pad_id,
                ctc=cfg.ctc,
            )
        )

    def __call__(self, model_out, batch):
        loss, sample_size, logs = self.inner(model_out, batch)
        w = self.cfg.ctc.ctc_weight
        if w > 0:
            ce = logs["ce_loss"]
            loss = loss - w * ce  # total = (1-w)·CE + CTC terms
            logs = {**logs, "loss": loss, "trans_loss": (1.0 - w) * ce}
        return loss, sample_size, logs


@register_criterion("label_smoothed_cross_entropy_with_ctc")
class LabelSmoothedCEWithCTC:
    """Default ST loss: label-smoothed CE + weighted CTC branches
    (reference: criterions/label_smoothed_cross_entropy_with_ctc.py:74-156)."""

    @dataclass
    class Config:
        label_smoothing: float = 0.1
        sentence_avg: bool = False
        report_accuracy: bool = True
        pad_id: int = 1
        # AIPA decoder-level mixup: CE over mixed rows (cal_mixup_loss) and
        # KL-to-original consistency (reference:
        # label_smoothed_cross_entropy.py:176-204, reproduction_aipa_kd.yaml)
        cal_mixup_loss: bool = True
        mixup_consistent_weight: float = 0.0
        ctc: "CTCCriterion.Config" = field(default_factory=lambda: CTCCriterion.Config())

    def __init__(self, cfg: "LabelSmoothedCEWithCTC.Config"):
        self.cfg = cfg
        self.ctc = CTCCriterion(cfg.ctc)

    def __call__(self, model_out, batch):
        logits = model_out["decoder_logits"]
        targets = batch["target"]
        mixup = model_out.get("mixup")
        ce, nll = label_smoothed_nll_loss(
            logits, targets, self.cfg.label_smoothing, self.cfg.pad_id,
            mixup=mixup, cal_mixup_loss=self.cfg.cal_mixup_loss,
        )
        ctc_total, ctc_logs = self.ctc.compute_ctc_loss(model_out, batch)
        loss = ce + ctc_total
        if self.cfg.mixup_consistent_weight > 0 and mixup is not None:
            from s2t_tpu.criterions.label_smoothed_ce import (
                decoder_mixup_consistent_loss,
            )

            mc = decoder_mixup_consistent_loss(
                logits, targets, mixup, self.cfg.pad_id
            )
            ctc_logs = {**ctc_logs, "mixup_consistent_loss": mc}
            loss = loss + self.cfg.mixup_consistent_weight * mc
        # under mixup the decoder rows follow the encoder layout: row r is
        # scored against target[index1[r]] (dominant mixture part)
        acc_targets = targets if mixup is None else targets[mixup["index1"]]
        ntokens = jnp.sum((acc_targets != self.cfg.pad_id).astype(jnp.float32))
        nsent = jnp.asarray(targets.shape[0], jnp.float32)
        sample_size = nsent if self.cfg.sentence_avg else ntokens
        logs = {
            "loss": loss,
            "ce_loss": ce,
            "nll_loss": nll,
            "ntokens": ntokens,
            "nsentences": nsent,
            **ctc_logs,
        }
        if self.cfg.report_accuracy:
            from s2t_tpu.criterions.label_smoothed_ce import ce_accuracy

            correct, total = ce_accuracy(logits, acc_targets, self.cfg.pad_id)
            logs["n_correct"] = correct
            logs["total"] = total
        return loss, sample_size, logs

"""Latency metrics + latency-augmented label-smoothed CE (simultaneous ST/MT).

(reference: fairseq/criterions/label_smoothed_cross_entropy_latency_augmented.py
and examples/simultaneous_translation/utils/latency.py:9-451 — expected delays
from monotonic/cross attention, AverageProportion / AverageLagging /
DifferentiableAverageLagging / VarianceDelay, and the avg+var training
penalty.)

TPU notes: every metric is a fixed-shape masked reduction.  The reference's
DifferentiableAverageLagging Python loop (latency.py:163-181)
    d'_i = max(d_i, d'_{i-1} + 1/gamma)
is the running max of (d_j - j/gamma) shifted back, so it lowers to one
``lax.cummax`` — no sequential scan:
    d'_i = cummax_j<=i (d_j - j/gamma) + i/gamma.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from s2t_tpu.registry import register_criterion


# --------------------------------------------------------------------------- #
# delays from attention
# --------------------------------------------------------------------------- #
def expected_delays_from_attention(
    attn: jnp.ndarray,
    src_lens: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    stay_on_last_token: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """attn: (B, HL, U, S) probabilities -> (delays (B, HL, U), src_lens (B,)).

    delay[u] = sum_s s * p(s | u), steps counted from 1 (reference
    latency.py:321-377).  With ``stay_on_last_token=False`` the residual mass
    is pushed onto the last source step."""
    B, HL, U, S = attn.shape
    attn = attn.astype(jnp.float32)
    if not stay_on_last_token:
        resid = 1.0 - jnp.sum(attn[..., :-1], axis=-1, keepdims=True)
        attn = jnp.concatenate([attn[..., :-1], resid], axis=-1)
    steps = jnp.arange(1, S + 1, dtype=jnp.float32)
    delays = jnp.einsum("bhus,s->bhu", attn, steps)
    if src_lens is None:
        src_lens = jnp.full((B,), float(S), jnp.float32)
    else:
        src_lens = src_lens.astype(jnp.float32)
    if tgt_mask is not None:
        delays = jnp.where(tgt_mask[:, None, :], delays, 0.0)
    return delays, src_lens


# --------------------------------------------------------------------------- #
# metrics: delays (B, U) f32 already masked, src_lens (B,), tgt_mask (B, U)
# --------------------------------------------------------------------------- #
def _tgt_lens(tgt_mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(tgt_mask.astype(jnp.float32), axis=-1)


def average_proportion(delays, src_lens, tgt_mask) -> jnp.ndarray:
    """AP = sum_i d_i / (|x| |y|)  (Cho & Esipova 2016; latency.py:77-99)."""
    d = jnp.where(tgt_mask, delays, 0.0)
    return jnp.sum(d, -1) / (src_lens * jnp.maximum(_tgt_lens(tgt_mask), 1.0))


def average_lagging(delays, src_lens, tgt_mask) -> jnp.ndarray:
    """AL = 1/tau sum_i^tau d_i - (i-1)/gamma, tau = first i with d_i >= |x|
    (STACL; latency.py:102-140)."""
    B, U = delays.shape
    gamma = jnp.maximum(_tgt_lens(tgt_mask), 1.0) / src_lens  # (B,)
    reached = delays >= src_lens[:, None]
    # mask strictly AFTER the FIRST step that reaches the source end —
    # cumulative, since expected delays need not be monotone
    after = jnp.pad(
        jax.lax.cummax(reached.astype(jnp.int32), axis=1), ((0, 0), (1, 0))
    )[:, :-1].astype(bool)
    keep = (~after) & tgt_mask
    idx = jnp.arange(U, dtype=jnp.float32)
    lagging = jnp.where(keep, delays - idx[None] / gamma[:, None], 0.0)
    tau = jnp.maximum(jnp.sum(keep.astype(jnp.float32), -1), 1.0)
    return jnp.sum(lagging, -1) / tau


def differentiable_average_lagging(delays, src_lens, tgt_mask) -> jnp.ndarray:
    """DAL (MILk; latency.py:143-194) via the cummax closed form."""
    B, U = delays.shape
    gamma = jnp.maximum(_tgt_lens(tgt_mask), 1.0) / src_lens
    idx = jnp.arange(U, dtype=jnp.float32)[None]
    shifted = delays - idx / gamma[:, None]
    new_delays = jax.lax.cummax(shifted, axis=1) + idx / gamma[:, None]
    dal = jnp.where(tgt_mask, new_delays - idx / gamma[:, None], 0.0)
    return jnp.sum(dal, -1) / jnp.maximum(_tgt_lens(tgt_mask), 1.0)


def variance_delay(delays_hl, src_lens, tgt_mask) -> jnp.ndarray:
    """Across-head variance of delays, summed over targets / |y|
    (latency.py:233-251).  delays_hl: (B, HL, U)."""
    if delays_hl.shape[1] == 1:
        return jnp.zeros((delays_hl.shape[0],), jnp.float32)
    var = jnp.var(delays_hl, axis=1, ddof=1)
    var = jnp.where(tgt_mask, var, 0.0)
    return jnp.sum(var, -1) / jnp.maximum(_tgt_lens(tgt_mask), 1.0)


_METRICS = {
    "average_proportion": average_proportion,
    "average_lagging": average_lagging,
    "differentiable_average_lagging": differentiable_average_lagging,
}


def latency_metrics(delays, src_lens, tgt_mask) -> Dict[str, jnp.ndarray]:
    """All scalar latency metrics for evaluation/reporting, per utterance."""
    return {k: f(delays, src_lens, tgt_mask) for k, f in _METRICS.items()}


# --------------------------------------------------------------------------- #
# training penalty
# --------------------------------------------------------------------------- #
@dataclass
class LatencyTrainingConfig:
    latency_weight_avg: float = 0.0
    latency_weight_var: float = 0.0
    latency_weight_avg_type: str = "differentiable_average_lagging"
    latency_weight_var_type: str = "variance_delay"
    mass_preservation: bool = True  # stay_on_last_token
    average_method: str = "weighted_average"  # average | weighted_average | max


def latency_training_loss(
    attn: jnp.ndarray,
    src_lens: Optional[jnp.ndarray],
    tgt_mask: jnp.ndarray,
    cfg: LatencyTrainingConfig,
) -> jnp.ndarray:
    """Scalar avg+var latency penalty from (B, HL, U, S) attention
    (reference latency.py:378-451)."""
    delays_hl, src_lens = expected_delays_from_attention(
        attn, src_lens, tgt_mask, cfg.mass_preservation
    )
    loss = jnp.zeros((), jnp.float32)
    if cfg.latency_weight_avg > 0:
        if cfg.average_method == "average":
            d = jnp.mean(delays_hl, axis=1)
        elif cfg.average_method == "weighted_average":
            w = jax.nn.softmax(delays_hl, axis=1)
            d = jnp.sum(delays_hl * w, axis=1)
        elif cfg.average_method == "max":
            d = jnp.max(delays_hl, axis=1)
        else:
            raise ValueError(f"average_method {cfg.average_method!r}")
        d = jnp.where(tgt_mask, d, 0.0)
        avg = _METRICS[cfg.latency_weight_avg_type](d, src_lens, tgt_mask)
        loss = loss + cfg.latency_weight_avg * jnp.sum(avg)
    if cfg.latency_weight_var > 0:
        var = variance_delay(delays_hl, src_lens, tgt_mask)
        loss = loss + cfg.latency_weight_var * jnp.sum(var)
    return loss


def stack_cross_attn(intermediates) -> Optional[jnp.ndarray]:
    """Stack every decoder layer's sown cross-attention into (B, HL, U, S).

    The attention modules sow pre-dropout probabilities under
    decoder/layer{i}/cross_attn/attn_weights when applied with
    mutable=["intermediates"] (modules/attention.py)."""
    dec = intermediates.get("decoder", {})
    ws = []
    i = 0
    while f"layer{i}" in dec:
        w = dec[f"layer{i}"].get("cross_attn", {}).get("attn_weights")
        if w:
            ws.append(w[0])
        i += 1
    return jnp.concatenate(ws, axis=1) if ws else None


@register_criterion("latency_augmented_label_smoothed_cross_entropy")
class LatencyAugmentedLabelSmoothedCE:
    """Label-smoothed CE + the latency penalty over the model's cross
    attention (reference:
    label_smoothed_cross_entropy_latency_augmented.py:13-107).

    Expects ``model_out["cross_attn"]`` — (B, HL, U, S) probabilities (all
    decoder layers/heads stacked; tasks produce it by applying the model with
    mutable=["intermediates"] and stacking the sown cross_attn weights)."""

    @dataclass
    class Config(LatencyTrainingConfig):
        label_smoothing: float = 0.1
        pad_id: int = 1

    def __init__(self, cfg: "LatencyAugmentedLabelSmoothedCE.Config"):
        self.cfg = cfg

    def __call__(
        self, model_out: Dict[str, Any], batch: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        from s2t_tpu.criterions.label_smoothed_ce import label_smoothed_nll_loss

        target = batch["target"]
        loss, nll = label_smoothed_nll_loss(
            model_out["decoder_logits"], target,
            self.cfg.label_smoothing, self.cfg.pad_id,
        )
        ntokens = jnp.sum((target != self.cfg.pad_id).astype(jnp.float32))
        logs = {"nll_loss": nll}
        attn = model_out.get("cross_attn")
        if attn is not None and (
            self.cfg.latency_weight_avg > 0 or self.cfg.latency_weight_var > 0
        ):
            tgt_mask = target != self.cfg.pad_id
            src_lens = model_out.get("encoder_lengths")
            lat = latency_training_loss(attn, src_lens, tgt_mask, self.cfg)
            loss = loss + lat
            logs["latency_loss"] = lat
        logs["loss"] = loss
        logs["ntokens"] = ntokens
        logs["nsentences"] = jnp.asarray(float(target.shape[0]), jnp.float32)
        return loss, ntokens, logs

"""Optimizers and LR schedules on optax.

(reference: fairseq/optim/ 3,824 LoC — adam/adafactor/adagrad/…, and
fairseq/optim/lr_scheduler/ — inverse_sqrt (recipe default), cosine,
tri_stage, polynomial_decay, fixed.)

Loss scaling (FP16Optimizer/DynamicLossScaler) is intentionally absent:
training runs in bf16 on TPU, which needs no loss scale.  Gradient clipping
is chained into the transformation.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from s2t_tpu.config import OptimizationConfig
from s2t_tpu.registry import LR_SCHEDULERS, OPTIMIZERS, register_lr_scheduler, register_optimizer


# --------------------------------------------------------------------------- #
# LR schedules: step -> lr
# --------------------------------------------------------------------------- #


@register_lr_scheduler("inverse_sqrt")
def inverse_sqrt(cfg: OptimizationConfig) -> Callable:
    """Warmup from warmup_init_lr to lr, then lr ∝ 1/sqrt(step)
    (reference: optim/lr_scheduler/inverse_square_root_schedule.py:32)."""
    warmup = max(cfg.warmup_updates, 1)
    init_lr = cfg.warmup_init_lr if cfg.warmup_init_lr >= 0 else 0.0
    peak = cfg.lr
    decay_factor = peak * math.sqrt(warmup)

    def schedule(step):
        step = jnp.maximum(jnp.asarray(step), 1)
        warm = init_lr + (peak - init_lr) * step / warmup
        decay = decay_factor * jax.lax.rsqrt(step.astype(jnp.float32))
        return jnp.where(step < warmup, warm, decay)

    return schedule


@register_lr_scheduler("cosine")
def cosine(cfg: OptimizationConfig) -> Callable:
    total = max(cfg.max_update, cfg.warmup_updates + 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=max(cfg.warmup_init_lr, 0.0),
        peak_value=cfg.lr,
        warmup_steps=cfg.warmup_updates,
        decay_steps=total,
        end_value=cfg.min_lr,
    )


@register_lr_scheduler("tri_stage")
def tri_stage(cfg: OptimizationConfig) -> Callable:
    """Warmup → hold → exponential decay (reference: tri_stage lr scheduler).
    Phase lengths default to 10%/40%/50% of max_update."""
    total = max(cfg.max_update, 1)
    w = cfg.warmup_updates or int(0.1 * total)
    h = int(0.4 * total)
    d = max(total - w - h, 1)
    final = max(cfg.min_lr, cfg.lr * 0.01)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = cfg.lr * jnp.minimum(step / max(w, 1), 1.0)
        decay_t = jnp.clip((step - w - h) / d, 0.0, 1.0)
        decay = cfg.lr * jnp.exp(jnp.log(final / cfg.lr) * decay_t)
        return jnp.where(step < w, warm, jnp.where(step < w + h, cfg.lr, decay))

    return schedule


@register_lr_scheduler("polynomial_decay")
def polynomial_decay(cfg: OptimizationConfig) -> Callable:
    return optax.linear_schedule(
        init_value=cfg.lr, end_value=cfg.min_lr,
        transition_steps=max(cfg.max_update - cfg.warmup_updates, 1),
        transition_begin=cfg.warmup_updates,
    )


@register_lr_scheduler("fixed")
def fixed(cfg: OptimizationConfig) -> Callable:
    return optax.constant_schedule(cfg.lr)


def build_lr_schedule(cfg: OptimizationConfig) -> Callable:
    return LR_SCHEDULERS.get(cfg.lr_scheduler)(cfg)


# --------------------------------------------------------------------------- #
# optimizers
# --------------------------------------------------------------------------- #


@register_optimizer("adam")
def adam(cfg: OptimizationConfig, schedule) -> optax.GradientTransformation:
    """fairseq's "adam" applies *decoupled* weight decay — the update is
    ``p -= wd * lr * p`` applied directly to params before the Adam step
    (reference: fairseq/optim/adam.py:216-221, "Fixed Weight Decay
    Regularization in Adam") — which is exactly optax.adamw."""
    return optax.adamw(
        schedule, b1=cfg.adam_betas[0], b2=cfg.adam_betas[1],
        eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
    )


@register_optimizer("adamw")
def adamw(cfg: OptimizationConfig, schedule) -> optax.GradientTransformation:
    return adam(cfg, schedule)


@register_optimizer("adafactor")
def adafactor(cfg: OptimizationConfig, schedule) -> optax.GradientTransformation:
    return optax.adafactor(schedule)


@register_optimizer("adagrad")
def adagrad(cfg: OptimizationConfig, schedule) -> optax.GradientTransformation:
    return optax.adagrad(schedule)


@register_optimizer("sgd")
def sgd(cfg: OptimizationConfig, schedule) -> optax.GradientTransformation:
    return optax.sgd(schedule)


@register_optimizer("nag")
def nag(cfg: OptimizationConfig, schedule) -> optax.GradientTransformation:
    return optax.sgd(schedule, momentum=0.99, nesterov=True)


@register_optimizer("adadelta")
def adadelta(cfg: OptimizationConfig, schedule) -> optax.GradientTransformation:
    return optax.adadelta(schedule)


@register_optimizer("adamax")
def adamax(cfg: OptimizationConfig, schedule) -> optax.GradientTransformation:
    return optax.adamax(schedule, b1=cfg.adam_betas[0], b2=cfg.adam_betas[1],
                        eps=cfg.adam_eps)


@register_optimizer("lamb")
def lamb(cfg: OptimizationConfig, schedule) -> optax.GradientTransformation:
    return optax.lamb(
        schedule, b1=cfg.adam_betas[0], b2=cfg.adam_betas[1],
        eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
    )


def build_optimizer(
    cfg: OptimizationConfig, schedule: Optional[Callable] = None
) -> optax.GradientTransformation:
    """Build clip→optimizer chain (clipping matches --clip-norm semantics,
    reference: trainer.py:720-753)."""
    schedule = schedule or build_lr_schedule(cfg)
    tx = OPTIMIZERS.get(cfg.optimizer)(cfg, schedule)
    if cfg.clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)
    return tx

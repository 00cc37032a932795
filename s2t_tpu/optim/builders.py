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
from typing import Callable, NamedTuple, Optional

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


@register_lr_scheduler("reduce_lr_on_plateau")
@register_lr_scheduler("reduce_on_plateau")
def reduce_on_plateau(cfg: OptimizationConfig) -> Callable:
    """Constant base schedule; the actual decay is the runtime lr-scale in
    the optimizer state, driven by ReduceOnPlateau.step(val_loss) from the
    train loop (reference: optim/lr_scheduler/reduce_lr_on_plateau.py)."""
    return optax.constant_schedule(cfg.lr)


@register_lr_scheduler("pass_through")
def pass_through(cfg: OptimizationConfig) -> Callable:
    """No schedule of its own (reference: lr_scheduler/pass_through.py —
    defers to the optimizer; here: constant base lr, optimizer-side scaling
    such as adafactor's relative steps applies on top)."""
    return optax.constant_schedule(cfg.lr)


@register_lr_scheduler("manual")
def manual(cfg: OptimizationConfig) -> Callable:
    """Piecewise-constant epochs/updates schedule (reference:
    lr_scheduler/manual_lr_scheduler.py).  ``cfg.lr_milestones`` maps update
    boundaries to learning rates, e.g. {0: 1e-3, 10000: 5e-4, 50000: 1e-4}."""
    stones = sorted(
        (int(k), float(v))
        for k, v in (getattr(cfg, "lr_milestones", None) or {0: cfg.lr}).items()
    )
    if stones[0][0] > 0:
        # before the first boundary the BASE lr applies (reference:
        # manual_lr_scheduler falls back to args.lr), not the first milestone
        stones = [(0, float(cfg.lr))] + stones
    bounds = jnp.asarray([b for b, _ in stones], jnp.float32)
    rates = jnp.asarray([r for _, r in stones], jnp.float32)

    def schedule(step):
        idx = jnp.sum(jnp.asarray(step, jnp.float32) >= bounds) - 1
        return rates[jnp.clip(idx, 0, len(stones) - 1)]

    return schedule


@register_lr_scheduler("triangular")
def triangular(cfg: OptimizationConfig) -> Callable:
    """Cyclical triangular LR (reference: lr_scheduler/triangular.py):
    oscillates between min_lr and lr with period ``warmup_updates*2`` (or
    max_update/10 when unset)."""
    period = max(cfg.warmup_updates * 2 or cfg.max_update // 10, 2)
    lo = max(cfg.min_lr, cfg.lr * 0.01)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        phase = jnp.mod(step, period) / (period / 2.0)
        tri = jnp.where(phase < 1.0, phase, 2.0 - phase)
        return lo + (cfg.lr - lo) * tri

    return schedule


class ReduceOnPlateau:
    """Host-side plateau controller (reference:
    optim/lr_scheduler/reduce_lr_on_plateau.py:143 — shrink lr by
    ``lr_shrink`` when the validation metric stops improving for
    ``lr_patience`` validations).  Produces a cumulative scale factor the
    Trainer injects into the optimizer state via set_lr_scale."""

    def __init__(self, shrink: float = 0.1, patience: int = 0,
                 threshold: float = 1e-4, min_scale: float = 1e-8):
        self.shrink = shrink
        self.patience = patience
        self.threshold = threshold
        self.min_scale = min_scale
        self.best: Optional[float] = None
        self.bad = 0
        self.scale = 1.0

    def step(self, val: float) -> float:
        if self.best is None or val < self.best - self.threshold:
            self.best = val
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale = max(self.scale * self.shrink, self.min_scale)
                self.bad = 0
        return self.scale


class FusedAdamSkipState(NamedTuple):
    count: jnp.ndarray  # APPLIED update count (skipped steps don't advance)
    mu: object
    nu: object
    notfinite_count: jnp.ndarray


def fused_adamw_skip_nonfinite(
    cfg, schedule, max_consecutive_errors: int = 8
) -> optax.GradientTransformation:
    """clip-by-global-norm → AdamW → non-finite skip, as ONE transformation
    with the skip folded into the moment updates.

    Numerically equal to ``skip_nonfinite(chain(clip_by_global_norm(c),
    adamw(schedule, ...)))`` (asserted in tests/test_trainer.py), but with
    none of its memory traffic overhead: the generic wrapper re-selects the
    whole optimizer state each step (``where(ok, new, old)`` reads BOTH
    copies of mu/nu and re-writes them — measured 3.2 ms/step of pure HBM
    time on the m-model, ~8% of the step) and burns another full pass over
    the gradients for the per-leaf isfinite reduction.  Here:

      * finiteness comes free from the global norm the clip already computes
        (any non-finite leaf makes the norm non-finite);
      * the skip is folded multiplicatively into each moment update —
        ``mu' = mu + (1-b1)·where(ok, g-mu, 0)`` — which XLA fuses into the
        same elementwise kernel plain Adam needs (read mu,g / write mu);
      * skipped steps advance neither the Adam bias-correction count nor the
        LR schedule, exactly like the reference's overflow skip
        (ref: fairseq/optim/dynamic_loss_scaler.py + trainer.py:777-781).

    After ``max_consecutive_errors`` consecutive bad steps the update is
    applied anyway so the non-finite values surface loudly (apply_if_finite
    semantics, same as skip_nonfinite).
    """
    b1, b2 = cfg.adam_betas
    eps, wd, clip = cfg.adam_eps, cfg.weight_decay, cfg.clip_norm

    def init(params):
        return FusedAdamSkipState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
            notfinite_count=jnp.zeros((), jnp.int32),
        )

    def update(updates, state, params=None):
        gnorm = optax.global_norm(updates)
        ok = jnp.isfinite(gnorm)
        give_up = state.notfinite_count >= max_consecutive_errors
        apply_it = ok | give_up
        scale = 1.0
        if clip > 0:
            scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
        count_new = state.count + apply_it.astype(jnp.int32)
        # clamp: when every step so far was skipped count_new is 0 and the
        # bias correction would be 0/0; the lr factor already zeroes the
        # update in that case
        cf = jnp.maximum(count_new, 1).astype(jnp.float32)
        bc1 = 1.0 - b1 ** cf
        bc2 = 1.0 - b2 ** cf
        # optax.scale_by_learning_rate(schedule) evaluates the schedule at the
        # 0-based index of the current update
        lr = schedule(state.count) * apply_it.astype(jnp.float32)

        def upd_mu(m, g):
            g = g * scale
            # where() (not ·0) so a NaN gradient cannot poison the moment
            return m + (1.0 - b1) * jnp.where(apply_it, g - m, 0.0)

        def upd_nu(v, g):
            g = g * scale
            return v + (1.0 - b2) * jnp.where(apply_it, g * g - v, 0.0)

        mu = jax.tree.map(upd_mu, state.mu, updates)
        nu = jax.tree.map(upd_nu, state.nu, updates)

        def step(m, v, p):
            adam = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            if wd and params is not None:
                adam = adam + wd * p
            return -lr * adam

        if params is not None:
            out = jax.tree.map(step, mu, nu, params)
        else:
            out = jax.tree.map(lambda m, v: step(m, v, None), mu, nu)
        nf = jnp.where(ok, 0, state.notfinite_count + 1)
        return out, FusedAdamSkipState(count_new, mu, nu, nf)

    return optax.GradientTransformation(init, update)


class SkipNonFiniteState(NamedTuple):
    notfinite_count: jnp.ndarray  # consecutive non-finite updates
    inner_state: object


def skip_nonfinite(
    tx: optax.GradientTransformation, max_consecutive_errors: int = 8
) -> optax.GradientTransformation:
    """Skip updates whose gradients contain non-finite values.

    Same contract as ``optax.apply_if_finite`` (which this replaces in the
    Trainer), but the skip is a fused elementwise select instead of a
    ``lax.cond``: the cond introduces a program boundary XLA cannot fuse or
    alias across, which copies the whole optimizer state every step.  After
    ``max_consecutive_errors`` consecutive bad steps the update is applied
    anyway so the non-finite values surface loudly (apply_if_finite
    semantics).
    """

    def init(params):
        return SkipNonFiniteState(jnp.zeros((), jnp.int32), tx.init(params))

    def update(updates, state, params=None):
        new_updates, new_inner = tx.update(updates, state.inner_state, params)
        ok = jnp.array(True)
        for leaf in jax.tree.leaves(updates):
            ok = ok & jnp.all(jnp.isfinite(leaf))
        give_up = state.notfinite_count >= max_consecutive_errors
        apply_it = ok | give_up
        out_updates = jax.tree.map(
            lambda u: jnp.where(apply_it, u, jnp.zeros_like(u)), new_updates
        )
        keep_state = jax.tree.map(
            lambda new, old: jnp.where(apply_it, new, old)
            if hasattr(new, "dtype") else new,
            new_inner, state.inner_state,
        )
        count = jnp.where(ok, 0, state.notfinite_count + 1)
        return out_updates, SkipNonFiniteState(count, keep_state)

    return optax.GradientTransformation(init, update)


class LRScaleState(NamedTuple):
    scale: jnp.ndarray


def lr_scale_transform() -> optax.GradientTransformation:
    """Terminal transformation multiplying updates by a runtime scale held in
    optimizer state — the hook for reduce_on_plateau (update ∝ lr, so
    scaling updates == scaling lr for every optimizer here)."""

    def init(params):
        return LRScaleState(scale=jnp.ones((), jnp.float32))

    def update(updates, state, params=None):
        return jax.tree.map(lambda u: u * state.scale, updates), state

    return optax.GradientTransformation(init, update)


def set_lr_scale(opt_state, value: float):
    """Functionally replace every LRScaleState.scale in an optimizer state."""

    def walk(node):
        if isinstance(node, LRScaleState):
            return LRScaleState(scale=jnp.asarray(value, jnp.float32))
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*[walk(x) for x in node])
        if isinstance(node, (list, tuple)):
            return type(node)(walk(x) for x in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(opt_state)


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
    """Build clip→optimizer→[per-group scale]→lr-scale chain (clipping
    matches --clip-norm semantics, reference: trainer.py:720-753).

    ``cfg.lr_groups`` maps a top-level param-path prefix to an LR multiplier
    (0.0 freezes the subtree) — the practical core of the reference's
    composite optimizer (optim/composite.py) and the freeze knobs used by
    SATE fine-tuning."""
    schedule = schedule or build_lr_schedule(cfg)
    tx = OPTIMIZERS.get(cfg.optimizer)(cfg, schedule)
    if cfg.clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)
    groups = dict(getattr(cfg, "lr_groups", None) or {})
    if groups:
        def group_scale():
            def init(params):
                return optax.EmptyState()

            def update(updates, state, params=None):
                def scale_leaf(path, u):
                    key = path[0].key if path else ""
                    return u * groups.get(key, 1.0)

                return (
                    jax.tree_util.tree_map_with_path(scale_leaf, updates),
                    state,
                )

            return optax.GradientTransformation(init, update)

        tx = optax.chain(tx, group_scale())
    return optax.chain(tx, lr_scale_transform())

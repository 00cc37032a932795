"""BMUF — Block-Momentum Update Filtering (periodic model averaging).

(reference: fairseq/optim/bmuf.py:200 — replicas train independently for
``sync_interval`` steps, then the global model absorbs the averaged block
delta with block momentum and optional Nesterov correction.  The fairscale
SlowMo backend, models/distributed_fairseq_model.py:77-107, is the same
periodic-sync shape with a slow-momentum outer update — ``variant:
"slowmo"`` here.)

TPU mapping: the Trainer's BMUF mode (trainer.py) vmaps the per-replica
train step over the leading replica axis (sharded on "data"), so replicas
genuinely diverge between syncs; these pure functions implement the sync
itself.  The update rule is a pure function over (global_params,
averaged_local_params, momentum_buffer), so it composes with any transport:
an in-program axis-0 mean for single-slice, or
``jax.experimental.multihost_utils`` across DCN for multi-slice.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from s2t_tpu.config import BMUFConfig

__all__ = ["BMUFConfig", "bmuf_init", "bmuf_sync", "bmuf_restart_point"]


def bmuf_init(params: Any) -> Tuple[Any, Any]:
    """Returns (global_params, momentum_buffer)."""
    return jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.zeros_like, params)


def bmuf_sync(
    cfg: BMUFConfig,
    global_params: Any,
    avg_local_params: Any,
    momentum: Any,
) -> Tuple[Any, Any]:
    """One block update (reference: bmuf.py _BM_before_sync/_allreduce/after).

    bmuf:   m' = bm·m + block_lr·(1-bm)·(avg - global);  global' = global + m'
    slowmo: m' = bm·m + (avg - global);                  global' = global + slowmo_lr·m'
            (fairscale SlowMo outer update with the base-LR factor folded
            into slowmo_lr)

    Returns (new_global_params, new_momentum).  Local replicas restart from
    new_global (or the NBM lookahead point).
    """
    bm, blr = cfg.block_momentum, cfg.block_lr
    slowmo = getattr(cfg, "variant", "bmuf") == "slowmo"
    slr = getattr(cfg, "slowmo_lr", 1.0)

    def upd(g, a, m):
        drift = a - g  # the averaged block descent direction
        if slowmo:
            m2 = bm * m + drift
            g2 = g + slr * m2
        else:
            m2 = bm * m + blr * (1.0 - bm) * drift
            g2 = g + m2
        return g2, m2

    flat_g, treedef = jax.tree.flatten(global_params)
    flat_a = treedef.flatten_up_to(avg_local_params)
    flat_m = treedef.flatten_up_to(momentum)
    out = [upd(g, a, m) for g, a, m in zip(flat_g, flat_a, flat_m)]
    new_g = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    return new_g, new_m


def bmuf_restart_point(cfg: BMUFConfig, global_params: Any, momentum: Any) -> Any:
    """Where replicas resume after a sync: NBM looks ahead by bm·m."""
    if not cfg.use_nbm:
        return global_params
    return jax.tree.map(
        lambda g, m: g + cfg.block_momentum * m, global_params, momentum
    )

"""BMUF — Block-Momentum Update Filtering (periodic model averaging).

(reference: fairseq/optim/bmuf.py:200 — replicas train independently for
``sync_period`` steps, then the global model absorbs the averaged block
delta with block momentum and optional Nesterov correction.)

TPU mapping: inside one GSPMD program data-parallel gradients are already
averaged every step, so BMUF's home here is the *DCN boundary* — slices (or
jax processes) train locally and sync periodically.  The update rule is a
pure function over (global_params, averaged_local_params, momentum_buffer),
so it composes with any transport: `jax.experimental.multihost_utils` for
multi-slice, or plain pmean for in-program experiments.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp


@dataclass
class BMUFConfig:
    block_momentum: float = 0.875
    block_lr: float = 1.0
    sync_period: int = 50
    use_nbm: bool = True  # Nesterov block momentum (reference default)


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

    grad_block = global - avg_local  (the averaged block descent direction)
    m_{t+1}    = bm · m_t + lr_block · (1 - bm) ... fairseq uses
                 m = bm·m + block_lr·grad_block;  global -= m
    with NBM the replicas restart from global - bm·m (lookahead).

    Returns (new_global_params, new_momentum).  Local replicas restart from
    new_global (or the NBM lookahead point).
    """
    bm, blr = cfg.block_momentum, cfg.block_lr

    def upd(g, a, m):
        grad_block = g - a
        m2 = bm * m + blr * (1.0 - bm) * (-grad_block)
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

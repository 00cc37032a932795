"""Fused Pallas TPU kernel for the CTC loss lattice.

(reference: the cuDNN ``F.ctc_loss`` / torch_imputer CUDA kernels the torch
stack leans on — SURVEY §2.9.)

Why a kernel: the lattice recurrence is T sequential updates of a tiny
(B, 2U+1) state.  As a ``lax.scan`` each update is a handful of separate XLA
ops on sub-tile arrays (~29 ms fwd+bwd at B=32, T'=250 on v5e, even after
moving the emission gather onto the MXU).  Here the whole recurrence runs
inside one kernel with the state resident in VMEM registers — one program,
no per-op dispatch, ~10x less wall time.

Structure:
  * forward  — alpha kernel: runs the standard CTC alpha recurrence over T,
    storing every alpha row (needed for the gradient).
  * backward — beta kernel: reversed recurrence fused with the posterior
    gradient  d nll / d emit[t,s] = -exp(alpha + beta - logZ).
  * both wrapped in a ``jax.custom_vjp`` over the dense (B, T, S) emission
    table; gradients to the (B, T, V) log-probs flow through the one-hot
    einsum in the caller (MXU matmul both ways).

Numerics match ``ops/ctc.py``'s scan path exactly (same NEG_INF arithmetic,
f32 throughout); parity is asserted in tests/test_ctc.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_LANE = 128
_SUBLANE = 8


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _shift_right_lanes(x, n, lane_idx):
    """Shift (B, S) right along lanes by n, filling with NEG_INF."""
    return jnp.where(lane_idx >= n, pltpu.roll(x, shift=n, axis=1), NEG_INF)


def _shift_left_lanes(x, n, lane_idx, S):
    # pltpu.roll requires a non-negative shift; left-by-n == right-by-(S-n)
    # on the circular padded lane axis
    return jnp.where(
        lane_idx < S - n, pltpu.roll(x, shift=S - n, axis=1), NEG_INF
    )


def _alpha_kernel(emit_ref, skip_ref, len_ref, alphas_ref):
    """emit (T, B, S) f32; skip (B, S) f32 additive {0, NEG_INF};
    len (B, 1) i32.  Writes every alpha row to alphas (T, B, S)."""
    T, B, S = emit_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    skip_bias = skip_ref[:]
    lens = len_ref[:]  # (B, 1)

    alpha0 = jnp.where(lane < 2, emit_ref[0], NEG_INF)
    alphas_ref[0] = alpha0

    def body(t, alpha):
        e = emit_ref[t]
        s1 = _shift_right_lanes(alpha, 1, lane)
        s2 = _shift_right_lanes(alpha, 2, lane) + skip_bias
        new = jnp.logaddexp(jnp.logaddexp(alpha, s1), s2) + e
        alpha = jnp.where(t < lens, new, alpha)
        alphas_ref[t] = alpha
        return alpha

    jax.lax.fori_loop(1, T, body, alpha0)


def _beta_grad_kernel(
    emit_ref, alphas_ref, skip_ref, final_ref, len_ref, logz_ref, demit_ref
):
    """Reversed recurrence fused with the posterior gradient.

    final (B, S): 0 at the two terminal lattice states, NEG_INF elsewhere.
    logz (B, 1): log-likelihood.  Writes d nll / d emit to demit (T, B, S).
    """
    T, B, S = emit_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    # skip into state s+2 is allowed iff skip_ok[s+2]
    skip_from = _shift_left_lanes(skip_ref[:], 2, lane, S)
    final = final_ref[:]
    lens = len_ref[:]
    logz = logz_ref[:]

    def body(i, beta):
        t = T - 1 - i
        # invariant: beta == beta[t] for t <= len-1, == final for t >= len-1
        g = -jnp.exp(alphas_ref[t] + beta - logz)
        demit_ref[t] = jnp.where(t < lens, g, 0.0)
        z = beta + emit_ref[t]
        l1 = _shift_left_lanes(z, 1, lane, S)
        l2 = _shift_left_lanes(z, 2, lane, S) + skip_from
        comb = jnp.logaddexp(jnp.logaddexp(z, l1), l2)
        return jnp.where(t <= lens - 1, comb, beta)

    jax.lax.fori_loop(0, T, body, final)


def _pad_bts(x, Bp, Sp, fill):
    T, B, S = x.shape
    return jnp.pad(x, ((0, 0), (0, Bp - B), (0, Sp - S)),
                   constant_values=fill)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _nll_from_emit(emit, skip_ok, input_lengths, last_label, last_blank):
    nll, _ = _nll_fwd(emit, skip_ok, input_lengths, last_label, last_blank)
    return nll


def _run_alpha(emit, skip_ok, input_lengths):
    """emit (B, T, S) -> alphas (T, Bp, Sp) on padded shapes."""
    B, T, S = emit.shape
    Bp, Sp = _round_up(B, _SUBLANE), _round_up(S, _LANE)
    emit_t = _pad_bts(jnp.moveaxis(emit.astype(jnp.float32), 1, 0), Bp, Sp,
                      NEG_INF)
    skip = jnp.pad(
        jnp.where(skip_ok, 0.0, NEG_INF).astype(jnp.float32),
        ((0, Bp - B), (0, Sp - S)), constant_values=NEG_INF,
    )
    lens = jnp.pad(input_lengths.astype(jnp.int32), (0, Bp - B))[:, None]
    alphas = pl.pallas_call(
        _alpha_kernel,
        out_shape=jax.ShapeDtypeStruct((T, Bp, Sp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(emit_t, skip, lens)
    return alphas, emit_t, skip, lens


def _logz(alphas, last_label, last_blank, B):
    final = alphas[-1, :B]  # (B, Sp)
    a_label = jnp.take_along_axis(final, last_label[:, None].clip(0), 1)[:, 0]
    a_label = jnp.where(last_label >= 0, a_label, NEG_INF)
    a_blank = jnp.take_along_axis(final, last_blank[:, None], 1)[:, 0]
    return jnp.logaddexp(a_label, a_blank)


def _nll_fwd(emit, skip_ok, input_lengths, last_label, last_blank):
    B, T, S = emit.shape
    alphas, emit_t, skip, lens = _run_alpha(emit, skip_ok, input_lengths)
    logz = _logz(alphas, last_label, last_blank, B)
    res = (alphas, emit_t, skip, lens, logz, last_label, last_blank,
           B, T, S)
    return -logz, res


def _nll_bwd(res, g):
    alphas, emit_t, skip, lens, logz, last_label, last_blank, B, T, S = res
    Tp, Bp, Sp = emit_t.shape
    lane = jnp.arange(Sp)[None, :]
    final = jnp.where(
        (lane == jnp.pad(last_label, (0, Bp - B))[:, None])
        | (lane == jnp.pad(last_blank, (0, Bp - B))[:, None]),
        0.0, NEG_INF,
    ).astype(jnp.float32)
    logz_p = jnp.pad(logz, (0, Bp - B), constant_values=0.0)[:, None]
    demit = pl.pallas_call(
        _beta_grad_kernel,
        out_shape=jax.ShapeDtypeStruct((T, Bp, Sp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(emit_t, alphas, skip, final, lens, logz_p)
    # d(-logz)/d emit, scaled by the upstream cotangent per batch row
    demit = jnp.moveaxis(demit[:, :B, :S], 0, 1) * g[:, None, None]
    return (demit, None, None, None, None)


_nll_from_emit.defvjp(_nll_fwd, _nll_bwd)


def ctc_nll_pallas(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    normalized: bool = True,
    fused_head: Optional[dict] = None,
) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood, differentiable w.r.t.
    ``log_probs``.  Drop-in for the scan path of ``ops.ctc.ctc_loss``."""
    from s2t_tpu.ops.ctc import (
        _extend_labels,
        _fused_head_emissions,
        _lattice_logp,
        _transition_mask,
    )

    ext = _extend_labels(labels, blank_id)
    if fused_head is not None:
        emit = _fused_head_emissions(log_probs, ext, fused_head)
    else:
        # (B, T, S) via one-hot einsum; normalized=False keeps logits in bf16
        emit = _lattice_logp(log_probs, ext, normalized=normalized)
    skip_ok = _transition_mask(ext, blank_id)
    last_label = (2 * label_lengths - 1).astype(jnp.int32)
    last_blank = (2 * label_lengths).astype(jnp.int32)
    return _nll_from_emit(emit, skip_ok, input_lengths.astype(jnp.int32),
                          last_label, last_blank)


def pallas_ctc_available(B: int, T: int, S: int) -> bool:
    """True when the fused kernel applies: TPU backend and the working set
    (emissions + alphas, f32, padded) fits comfortably in VMEM."""
    import os

    if os.environ.get("S2T_NO_PALLAS_CTC"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except RuntimeError:
        return False
    Bp, Sp = _round_up(B, _SUBLANE), _round_up(S, _LANE)
    # the BACKWARD kernel is the high-water mark: emit + alphas + demit all
    # resident (the forward holds only emit + alphas).  13 MB budget = the
    # ~16 MB VMEM core minus slack for the small side buffers; the bench
    # regime (B=32, T'=250, S=59 -> 12.3 MB) runs the backward in VMEM on
    # v5e, verified on hardware
    working = 3 * T * Bp * Sp * 4
    return working < 13 * 1024 * 1024

"""VMEM-resident fused self-attention kernel (Pallas, TPU).

Replaces the HBM-materialized attention of the speech encoder
(reference computes softmax(QK^T)V through a stored (B, H, T, T) probability
tensor — fairseq/modules/multihead_attention.py:160-280).  For speech shapes
the post-subsampling sequence (T' ~ 250-1000) fits ENTIRELY in VMEM per
program, so this kernel is simpler than general flash attention: one program
computes whole (h, T, T) score tiles in VMEM, softmaxes them, applies
attention dropout, and contracts with V — the probability tensor never
exists in HBM, in forward OR backward.

Key design points (see /opt/skills/guides/pallas_guide.md):
  * grid = (B, H//hb); each program owns one utterance x a chunk of hb heads
    with block (1, hb, T, D) of a head-major (B, H, T, D) layout (transposed
    outside — Mosaic requires ref slices with contiguous trailing dims).
    All matmuls are HEAD-BATCHED dot_generals so the MXU sees (hb*T, T)-scale
    work, not tiny per-head tiles; hb is chosen so the backward's live
    (hb, T, T) f32 buffers fit the VMEM budget.
  * lengths ride in as scalar-prefetch so each program masks key columns
    with a broadcasted iota compare.
  * attention dropout uses the per-core PRNG seeded with
    (seed, program_id) — the backward kernel RE-GENERATES the identical
    mask instead of loading a stored one (the stored-mask u8 tensors and
    their fwd->bwd round trip are what this kernel removes).
  * dropout keeps the uint8-threshold semantics of modules/dropout.py:
    keep iff high byte of the random word >= round(rate*256); rescale by
    the effective keep prob so the estimator stays unbiased.
  * backward recomputes scores+softmax in-VMEM (standard flash recompute),
    then dV = P_drop^T dO, dP = dO V^T, dS = P o (dP_drop - rowsum(dP_drop o P)),
    dQ = dS K / sqrt(d), dK = dS^T Q / sqrt(d) — matmul operands in bf16
    (same effective precision as the dense XLA path, which also feeds the
    MXU bf16), f32 accumulation.

Applicability: encoder-style (non-causal) self-attention, padding mask only,
T padded to a multiple of 128 and the working set within the VMEM budget
(T <= ~768 at D=64).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
_LANE = 128
_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _head_block(H: int, Tp: int, D: int) -> int:
    """Largest divisor of H whose backward working set fits the budget:
    ~4 live (hb, Tp, Tp) f32 buffers (scores/probs/dP/mask) + operands."""
    for hb in range(H, 0, -1):
        if H % hb:
            continue
        work = 4 * hb * Tp * Tp * 4 + 8 * hb * Tp * _round_up(D, _LANE) * 2
        if work < _VMEM_BUDGET:
            return hb
    return 0


def _dropout_mask(shape, rate_u8: int):
    """Regenerable keep-mask from the seeded per-core PRNG (uint8 threshold
    semantics of modules/dropout.py)."""
    bits = pltpu.prng_random_bits(shape)
    byte = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(24)
    )
    return byte >= jnp.uint32(rate_u8)


def _probs(q_ref, k_ref, len_ref, b, scale):
    """(hb, T, T) f32 masked softmax probabilities for program (b, g)."""
    q = q_ref[0]  # (hb, T, D)
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    T = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
    s = jnp.where(col < len_ref[b], s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _seed(seed_ref, b):
    pltpu.prng_seed(seed_ref[0] + b * pl.num_programs(1) + pl.program_id(1))


def _fwd_kernel(len_ref, seed_ref, q_ref, k_ref, v_ref, o_ref,
                *, scale, rate_u8, keep_scale):
    b = pl.program_id(0)
    p = _probs(q_ref, k_ref, len_ref, b, scale)
    if rate_u8 > 0:
        _seed(seed_ref, b)
        keep = _dropout_mask(p.shape, rate_u8)
        p = jnp.where(keep, p * keep_scale, 0.0)
    v = v_ref[0]
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(len_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, rate_u8, keep_scale):
    b = pl.program_id(0)
    p = _probs(q_ref, k_ref, len_ref, b, scale)
    if rate_u8 > 0:
        # identical seeding + bit-draw order as forward -> identical mask
        _seed(seed_ref, b)
        keep = _dropout_mask(p.shape, rate_u8)
        pd = jnp.where(keep, p * keep_scale, 0.0)
    else:
        pd = p
    v = v_ref[0]
    do = do_ref[0]
    cdt = v.dtype  # matmul operand dtype (bf16 path == dense-XLA precision)
    # dV = P_drop^T dO
    dv = jax.lax.dot_general(
        pd.astype(cdt), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dP = dO V^T, through the dropout select
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if rate_u8 > 0:
        dp = jnp.where(keep, dp * keep_scale, 0.0)
    # softmax backward
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    q = q_ref[0]
    k = k_ref[0]
    dq = jax.lax.dot_general(
        ds.astype(cdt), k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        ds.astype(cdt), q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _blk(hb, Tp, D):
    # index_map also receives the scalar-prefetch refs (lengths, seed)
    return pl.BlockSpec(
        (1, hb, Tp, D), lambda b, g, *_: (b, g, 0, 0), memory_space=pltpu.VMEM
    )


# ---- (B, T, H, D) native-layout variant (NEGATIVE RESULT, opt-in) --------
# Motivation: the head-major kernel above needs HBM transposes on every
# operand and cotangent, and in-model those cost more than the kernel saves
# (docs/design.md round-3 item 2; re-measured r5: 41.4 -> 47.2 ms/step at
# T'=250).  These kernels take the model's native (B, T, H, D) layout and
# relayout to head-major INSIDE the kernel instead.  Measured r5 on v5e at
# (40, 250, 8, 64): 1.285 ms/call fwd+bwd vs 0.593 head-major and 0.560
# dense — the Mosaic sublane relayouts (8 per bwd program) dominate, and
# Mosaic cannot batch dot_generals over a middle dim (it requires leading
# batch dims, so the relayout cannot be elided).  Kept as the
# S2T_PALLAS_ATTN_LAYOUT=btd opt-in for future Mosaic versions.

_VMEM_BUDGET_BTD = 15 * 1024 * 1024


def _btd_fits(H: int, Tp: int, D: int) -> bool:
    """Full-H block working set against the (looser) btd budget: Mosaic
    requires the block's head dim to equal H, so there is no head chunking
    — btd only applies when all heads' buffers fit at once."""
    work = 4 * H * Tp * Tp * 4 + 8 * H * Tp * _round_up(D, _LANE) * 2
    return work < _VMEM_BUDGET_BTD


def _blk_btd(hb, Tp, D):
    return pl.BlockSpec(
        (1, Tp, hb, D), lambda b, g, *_: (b, 0, g, 0), memory_space=pltpu.VMEM
    )


def _hmaj(ref):
    """(1, Tp, hb, D) ref -> (hb, Tp, D) head-major VMEM value (Mosaic only
    lowers dot_generals with leading batch dims, so relayout once here)."""
    return jnp.transpose(ref[0], (1, 0, 2))


def _probs_hm(q, k, len_ref, b, scale):
    """(hb, T, T) f32 masked softmax from head-major (hb, Tp, D) values."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    T = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
    s = jnp.where(col < len_ref[b], s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel_btd(len_ref, seed_ref, q_ref, k_ref, v_ref, o_ref,
                    *, scale, rate_u8, keep_scale):
    b = pl.program_id(0)
    q, k = _hmaj(q_ref), _hmaj(k_ref)
    p = _probs_hm(q, k, len_ref, b, scale)
    if rate_u8 > 0:
        _seed(seed_ref, b)
        keep = _dropout_mask(p.shape, rate_u8)
        p = jnp.where(keep, p * keep_scale, 0.0)
    v = _hmaj(v_ref)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (hb, Tq, D)
    o_ref[0] = jnp.transpose(o, (1, 0, 2)).astype(o_ref.dtype)


def _bwd_kernel_btd(len_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, *, scale, rate_u8, keep_scale):
    b = pl.program_id(0)
    q, k = _hmaj(q_ref), _hmaj(k_ref)
    p = _probs_hm(q, k, len_ref, b, scale)
    if rate_u8 > 0:
        _seed(seed_ref, b)
        keep = _dropout_mask(p.shape, rate_u8)
        pd = jnp.where(keep, p * keep_scale, 0.0)
    else:
        pd = p
    v = _hmaj(v_ref)
    do = _hmaj(do_ref)
    cdt = v.dtype
    # identical math to _bwd_kernel, on the relayouted values
    dv = jax.lax.dot_general(
        pd.astype(cdt), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if rate_u8 > 0:
        dp = jnp.where(keep, dp * keep_scale, 0.0)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        ds.astype(cdt), k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        ds.astype(cdt), q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0] = jnp.transpose(dq, (1, 0, 2)).astype(dq_ref.dtype)
    dk_ref[0] = jnp.transpose(dk, (1, 0, 2)).astype(dk_ref.dtype)
    dv_ref[0] = jnp.transpose(dv, (1, 0, 2)).astype(dv_ref.dtype)


def _pallas_attention_padded(q, k, v, lengths, seed, rate_u8, interpret=False):
    """q/k/v: (B, H, Tp, D) head-major with Tp already lane-aligned."""
    B, H, Tp, D = q.shape
    hb = _head_block(H, Tp, D)
    scale = 1.0 / float(np.sqrt(D))
    keep_scale = 1.0 / (1.0 - rate_u8 / 256.0) if rate_u8 > 0 else 1.0
    blk = _blk(hb, Tp, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // hb),
        in_specs=[blk, blk, blk],
        out_specs=blk,
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, rate_u8=rate_u8, keep_scale=keep_scale
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(lengths, seed, q, k, v)


def _pallas_attention_bwd_padded(q, k, v, do, lengths, seed, rate_u8,
                                 interpret=False):
    B, H, Tp, D = q.shape
    hb = _head_block(H, Tp, D)
    scale = 1.0 / float(np.sqrt(D))
    keep_scale = 1.0 / (1.0 - rate_u8 / 256.0) if rate_u8 > 0 else 1.0
    blk = _blk(hb, Tp, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // hb),
        in_specs=[blk, blk, blk, blk],
        out_specs=[blk, blk, blk],
    )
    sds = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, rate_u8=rate_u8, keep_scale=keep_scale
        ),
        grid_spec=grid_spec,
        out_shape=[sds, sds, sds],
        interpret=interpret,
    )(lengths, seed, q, k, v, do)


def _pallas_attention_padded_btd(q, k, v, lengths, seed, rate_u8,
                                 interpret=False):
    """q/k/v: (B, Tp, H, D) native layout, Tp lane-aligned."""
    B, Tp, H, D = q.shape
    hb = H  # full-H block (see _btd_fits)
    scale = 1.0 / float(np.sqrt(D))
    keep_scale = 1.0 / (1.0 - rate_u8 / 256.0) if rate_u8 > 0 else 1.0
    blk = _blk_btd(hb, Tp, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // hb),
        in_specs=[blk, blk, blk],
        out_specs=blk,
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_btd, scale=scale, rate_u8=rate_u8,
            keep_scale=keep_scale,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET_BTD * 3
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v)


def _pallas_attention_bwd_padded_btd(q, k, v, do, lengths, seed, rate_u8,
                                     interpret=False):
    B, Tp, H, D = q.shape
    hb = H  # full-H block (see _btd_fits)
    scale = 1.0 / float(np.sqrt(D))
    keep_scale = 1.0 / (1.0 - rate_u8 / 256.0) if rate_u8 > 0 else 1.0
    blk = _blk_btd(hb, Tp, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // hb),
        in_specs=[blk, blk, blk, blk],
        out_specs=[blk, blk, blk],
    )
    sds = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_btd, scale=scale, rate_u8=rate_u8,
            keep_scale=keep_scale,
        ),
        grid_spec=grid_spec,
        out_shape=[sds, sds, sds],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET_BTD * 3
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_attention_btd(q, k, v, lengths, seed, rate_u8, interpret):
    return _pallas_attention_padded_btd(
        q, k, v, lengths, seed, rate_u8, interpret
    )


def _fused_attention_btd_fwd(q, k, v, lengths, seed, rate_u8, interpret):
    out = _pallas_attention_padded_btd(
        q, k, v, lengths, seed, rate_u8, interpret
    )
    return out, (q, k, v, lengths, seed)


def _fused_attention_btd_bwd(rate_u8, interpret, res, g):
    q, k, v, lengths, seed = res
    dq, dk, dv = _pallas_attention_bwd_padded_btd(
        q, k, v, g, lengths, seed, rate_u8, interpret
    )
    zero_i = np.zeros(lengths.shape, dtype=jax.dtypes.float0)
    zero_s = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zero_i, zero_s


_fused_attention_btd.defvjp(_fused_attention_btd_fwd, _fused_attention_btd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_attention(q, k, v, lengths, seed, rate_u8, interpret):
    return _pallas_attention_padded(q, k, v, lengths, seed, rate_u8, interpret)


def _fused_attention_fwd(q, k, v, lengths, seed, rate_u8, interpret):
    out = _pallas_attention_padded(q, k, v, lengths, seed, rate_u8, interpret)
    return out, (q, k, v, lengths, seed)


def _fused_attention_bwd(rate_u8, interpret, res, g):
    q, k, v, lengths, seed = res
    dq, dk, dv = _pallas_attention_bwd_padded(
        q, k, v, g, lengths, seed, rate_u8, interpret
    )
    zero_i = np.zeros(lengths.shape, dtype=jax.dtypes.float0)
    zero_s = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zero_i, zero_s


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention_available(T: int, D: int, H: int = 8,
                              min_seq: int = 384) -> bool:
    """True when the TPU kernel applies: at least one head per program must
    fit the VMEM budget, and T >= min_seq.  Below the threshold XLA's dense
    fused attention wins (measured fwd+bwd on v5e, B*T ~= 10k frames:
    T=250 dense 1.57 ms vs fused 1.60; T=384 tie; T=512 dense 1.99 vs
    fused 1.58; T=768 dense 2.10 vs fused 1.63 — the dense (B, H, T, T)
    probability traffic grows linearly in T while the kernel stays
    VMEM-resident)."""
    import os

    if os.environ.get("S2T_NO_PALLAS_ATTN"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except RuntimeError:
        return False
    min_seq = int(os.environ.get("S2T_PALLAS_ATTN_MIN_SEQ", min_seq))
    if T < min_seq:
        return False
    Tp = _round_up(T, _LANE)
    return _head_block(H, Tp, D) > 0


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid_mask: jnp.ndarray,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(QK^T/sqrt(d) + padding_bias) @ V with attention dropout,
    never materializing the probabilities in HBM.

    q/k/v: (B, T, H, D); valid_mask: (B, T) bool (contiguous True prefix).
    Returns (B, T, H, D) in q.dtype.
    """
    B, T, H, D = q.shape
    Tp = _round_up(T, _LANE)
    lengths = jnp.sum(valid_mask.astype(jnp.int32), axis=-1)
    rate_u8 = int(round(dropout_rate * 256))
    rate_u8 = min(max(rate_u8, 0), 255)
    if rate_u8 > 0:
        assert dropout_rng is not None, "dropout needs an rng key"
        seed = jax.random.randint(
            dropout_rng, (1,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    import os

    if (os.environ.get("S2T_PALLAS_ATTN_LAYOUT", "bhtd") == "btd"
            and _btd_fits(H, Tp, D)):
        # native-layout kernels: no HBM transposes at the boundary — the
        # (B, T, H, D) operands are bitcast views of the projection outputs
        # and the relayout happens in VMEM inside the kernel
        if Tp != T:
            pad = [(0, 0), (0, Tp - T), (0, 0), (0, 0)]
            q = jnp.pad(q, pad)
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        out = _fused_attention_btd(q, k, v, lengths, seed, rate_u8, interpret)
        return out[:, :T]
    # head-major layout for the kernel (contiguous (T, D) per-head slices)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if Tp != T:
        pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    out = _fused_attention(q, k, v, lengths, seed, rate_u8, interpret)
    return out[:, :, :T].transpose(0, 2, 1, 3)

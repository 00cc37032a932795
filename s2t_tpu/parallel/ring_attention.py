"""Ring attention over the "seq" mesh axis — sequence parallelism for long
audio.

(The reference has NO sequence/context parallelism — SURVEY §5.7 — it
downsamples instead.  This is the new-capability goal of SURVEY §7: shard the
time axis over the ICI ring, rotate K/V blocks with ppermute, and accumulate
attention with an online-softmax, so utterances far beyond one chip's HBM
attention budget train exactly.)

Design: flash-style blockwise accumulation.  Each of the P shards holds a
(B, T/P, H, Dh) slice of q/k/v.  P ring steps: score the local q block
against the resident k/v block, fold into (acc, m, l) running softmax state,
then rotate k/v (and their validity mask) one rank around the ring.  Compute
and ICI transfer overlap across steps; the result is bitwise-equivalent (up
to fp reassociation) to dense attention over the full T.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG = -1e30


def _ring_attention_local(q, k, v, q_valid, kv_valid, axis_name: str):
    """shard_map body: q/k/v (B, Tl, H, Dh) local blocks, valid (B, Tl)."""
    n_shards = jax.lax.psum(1, axis_name)
    B, Tl, H, Dh = q.shape
    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)

    qf = q.astype(jnp.float32)
    # derive the accumulators from qf so they carry the same shard_map
    # "varying over (data, seq)" type as the loop outputs
    zero_like_q = jnp.transpose(qf, (0, 2, 1, 3)) * 0.0  # (B, H, Tl, Dh)
    acc = zero_like_q
    m = zero_like_q[..., 0] + NEG
    l = zero_like_q[..., 0]
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def step(i, carry):
        acc, m, l, k, v, kv_valid = carry
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
        scores = jnp.where(kv_valid[:, None, None, :], scores, NEG)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        p = jnp.exp(scores - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, vf)
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        kv_valid = jax.lax.ppermute(kv_valid, axis_name, perm)
        return acc, m_new, l, k, v, kv_valid

    acc, m, l, *_ = jax.lax.fori_loop(
        0, n_shards, step, (acc, m, l, k, v, kv_valid)
    )
    out = acc / jnp.maximum(l[..., None], 1e-30)
    out = jnp.where(q_valid[:, None, :, None], out, 0.0)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)  # (B, Tl, H, Dh)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid_mask: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "seq",
    batch_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """Sequence-parallel self-attention.

    q/k/v: (B, T, H, Dh) with T shardable over ``seq_axis``;
    valid_mask: (B, T) bool.  Returns (B, T, H, Dh), numerically equal to
    dense masked attention (fp32 accumulation).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    # The head axis rides the tensor-parallel "model" axis.  Leaving it out
    # of the specs would make shard_map treat head-sharded q/k/v as
    # replicated over "model": the primal gets all-gathered and computed
    # tp-times redundantly, and the transpose rule psums the cotangent over
    # "model" — a silent tp× gradient overcount under TP×SP meshes (caught
    # by dryrun_multichip's single-device replay check).
    model_axis = "model" if "model" in mesh.axis_names else None
    spec_x = P(batch_axis, seq_axis, model_axis, None)
    spec_m = P(batch_axis, seq_axis)
    fn = shard_map(
        partial(_ring_attention_local, axis_name=seq_axis),
        mesh=mesh,
        in_specs=(spec_x, spec_x, spec_x, spec_m, spec_m),
        out_specs=spec_x,
    )
    return fn(q, k, v, valid_mask, valid_mask)

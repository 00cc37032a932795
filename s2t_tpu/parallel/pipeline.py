"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

(reference: fairseq/model_parallel/models/pipeline_parallel_transformer/
model.py:80-455 — layers partitioned over --pipeline-devices, microbatched
through fairscale Pipe.)

TPU design (the "pipelined scan" pattern from the scaling playbook): the S
pipeline stages are S shards of a mesh axis; every stage holds ITS OWN slice
of a layer stack whose parameters are stacked on a leading (S, ...) axis.
Microbatches enter at stage 0 and ride a ppermute ring; after S + M - 1
ticks all M microbatches have traversed all S stages.  Stage computation is
identical SPMD code, so XLA overlaps the ring transfer with compute.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    microbatches: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Run ``y_m = fS(...f1(x_m))`` for M microbatches over S pipeline stages.

    layer_fn(params_slice, x) -> x: one stage's computation (e.g. a block of
      encoder layers); must preserve x's shape.
    stacked_params: pytree with leading axis S (sharded over ``axis``).
    microbatches: (M, B_mb, ...) — M must be a multiple of S.

    Returns (M, B_mb, ...) outputs, equal to applying the S stages in
    sequence to each microbatch.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    S = int(mesh.shape[axis])
    M = microbatches.shape[0]
    assert M % S == 0, f"microbatches ({M}) must be a multiple of stages ({S})"

    def local(params, mb):
        # params: leading axis 1 (this stage's slice); mb: (M/S, B, ...) local
        params = jax.tree.map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        n_tick = M + S - 1

        mb_all = jax.lax.all_gather(mb, axis, tiled=True)  # (M, B, ...)
        buf = jnp.zeros_like(mb_all[0])  # the value currently at this stage
        out = jnp.zeros_like(mb_all)
        fwd = [(i, (i + 1) % S) for i in range(S)]

        def tick(t, carry):
            buf, out = carry
            # stage 0 ingests microbatch t (if any left)
            take = jnp.clip(t, 0, M - 1)
            buf = jnp.where(stage == 0, mb_all[take] * (t < M), buf)
            # every stage applies its layer block
            buf = layer_fn(params, buf)
            # last stage emits microbatch t-(S-1)
            emit_idx = jnp.clip(t - (S - 1), 0, M - 1)
            emit = (stage == S - 1) & (t >= S - 1)
            out = out.at[emit_idx].set(jnp.where(emit, buf, out[emit_idx]))
            # rotate forward
            buf = jax.lax.ppermute(buf, axis, fwd)
            return buf, out

        _, out = jax.lax.fori_loop(0, n_tick, tick, (buf, out))
        # collect outputs from the last stage to everyone (replicated result)
        out = jax.lax.psum(out * (stage == S - 1), axis)
        return out

    in_specs = (
        jax.tree.map(lambda _: P(axis), stacked_params),
        P(axis),
    )
    fn = shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=P(),
    )
    return fn(stacked_params, microbatches)

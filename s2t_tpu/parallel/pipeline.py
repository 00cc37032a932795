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
        # params: leading axis 1 (this stage's slice); mb: (M/S, B, ...) local.
        # Memory contract: inputs and outputs stay SHARDED over the stage
        # axis; only the single in-flight microbatch is materialised per
        # device (buf + the per-tick routed microbatch), so activation
        # memory is O(B_mb), not O(M*B_mb) — the point of microbatch
        # pipelining.  Routing one microbatch per tick through a psum moves
        # the same total bytes an upfront all_gather would, spread across
        # the loop where XLA overlaps it with stage compute.
        params = jax.tree.map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        Mloc = mb.shape[0]  # == M // S
        n_tick = M + S - 1

        buf = jnp.zeros_like(mb[0])  # the value currently at this stage
        out_local = jnp.zeros_like(mb)  # this stage's output slice
        fwd = [(i, (i + 1) % S) for i in range(S)]

        def tick(t, carry):
            buf, out_local = carry
            # the owner of microbatch t broadcasts it; stage 0 ingests
            take = jnp.clip(t, 0, M - 1)
            owner = take // Mloc
            x_t = jax.lax.psum(
                jnp.where(stage == owner, mb[take % Mloc],
                          jnp.zeros_like(buf)),
                axis,
            )
            buf = jnp.where((stage == 0) & (t < M), x_t, buf)
            # every stage applies its layer block
            buf = layer_fn(params, buf)
            # last stage emits microbatch t-(S-1); its slice owner stores it
            emit_t = jnp.clip(t - (S - 1), 0, M - 1)
            emitted = jax.lax.psum(
                jnp.where((stage == S - 1) & (t >= S - 1), buf,
                          jnp.zeros_like(buf)),
                axis,
            )
            updated = out_local.at[emit_t % Mloc].set(emitted)
            own_out = ((emit_t // Mloc) == stage) & (t >= S - 1)
            out_local = jnp.where(own_out, updated, out_local)
            # rotate forward
            buf = jax.lax.ppermute(buf, axis, fwd)
            return buf, out_local

        _, out_local = jax.lax.fori_loop(0, n_tick, tick, (buf, out_local))
        return out_local

    in_specs = (
        jax.tree.map(lambda _: P(axis), stacked_params),
        P(axis),
    )
    fn = shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=P(axis),
    )
    return fn(stacked_params, microbatches)

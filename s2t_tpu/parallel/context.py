"""Scoped mesh context.

Functional flax modules don't carry the device mesh; the Trainer (or test)
activates it here so sharding-aware code paths (sequence-parallel attention,
activation sharding constraints) can pick it up at trace time.  The mesh is
*scoped*, not process-global: the Trainer wraps its traced calls in
``use_mesh(self.mesh)`` so that building a Trainer does not poison every
later trace in the process (a model forwarded outside any Trainer sees no
mesh and ``constrain`` is a no-op).  ``set_mesh`` remains for tests/tools
that want to pin a mesh for a whole block; pair it with ``set_mesh(None)``.

Both the mesh and the suppressed-axes set live in ``contextvars`` so that a
concurrent trace in another thread (async checkpoint save, background eval)
never observes another thread's temporarily-activated state.
"""

from __future__ import annotations

import contextvars
from contextlib import contextmanager
from typing import Optional

from jax.sharding import Mesh

_CURRENT_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "s2t_tpu_mesh", default=None
)
_SUPPRESSED_AXES: contextvars.ContextVar[frozenset] = contextvars.ContextVar(
    "s2t_tpu_suppressed_axes", default=frozenset()
)


@contextmanager
def use_mesh(mesh: Optional[Mesh]):
    """Activate ``mesh`` for traces performed inside the block.

    This is what the Trainer wraps around its jitted step invocations:
    sharding constraints apply while the Trainer's own programs trace, and
    evaporate when the call returns — other models traced later in the same
    process are unaffected.
    """
    token = _CURRENT_MESH.set(mesh)
    try:
        yield mesh
    finally:
        _CURRENT_MESH.reset(token)


@contextmanager
def suppress_constraint_axes(*axes: str):
    """Drop the given mesh axes from any ``constrain`` spec traced inside.

    Needed when model code is traced under ``jax.vmap(..., spmd_axis_name=ax)``
    (BMUF's per-replica local steps): JAX forbids a with_sharding_constraint
    spec from naming the vmap's spmd axis, and the vmap already pins that
    dimension's sharding anyway.
    """
    token = _SUPPRESSED_AXES.set(_SUPPRESSED_AXES.get() | frozenset(axes))
    try:
        yield
    finally:
        _SUPPRESSED_AXES.reset(token)


def set_mesh(mesh: Optional[Mesh]) -> None:
    """Imperatively pin the mesh for the current context (tests/tools).

    Prefer ``use_mesh`` where a scope exists; callers of ``set_mesh`` are
    responsible for ``set_mesh(None)`` afterwards.
    """
    _CURRENT_MESH.set(mesh)


def get_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH.get()


def seq_parallel_enabled() -> bool:
    m = _CURRENT_MESH.get()
    return m is not None and int(m.shape.get("seq", 1)) > 1


def conv_grad_guard(x, batch_axis: str = "data"):
    """Pin ``x`` to batch-only sharding at a conv boundary.

    XLA (jax 0.9.0, both the Shardy and legacy GSPMD partitioners)
    miscompiles the KERNEL GRADIENT of convolutions whose activations or
    cotangents are sharded over the time axis when the mesh has another
    axis of size > 1 that the op does not use: the grad comes out
    multiplied by that idle axis size (repro:
    tests/test_partitioner_numerics.py).  Forcing a batch-only layout at
    the boundary between convs and seq-sharded tensors makes the conv
    gradient partition over batch only, which is computed correctly.  Call
    this (a) on the subsampler output before the first seq-sharding
    constraint, and (b) around depthwise convs inside seq-parallel layers.

    This guard is a CORRECTNESS pin, not a layout hint: it must never be
    scrubbed by ``suppress_constraint_axes`` (the BMUF vmap path rejects
    seq-parallel meshes up front, so the two never legitimately combine).
    """
    if not seq_parallel_enabled():
        return x
    return constrain(x, batch_axis, _suppressible=False)


def constrain(x, *spec_dims, _suppressible: bool = True):
    """with_sharding_constraint(x, P(*spec_dims)) when a mesh is active;
    no-op otherwise (single-device tests, CPU paths).

    Mesh axes whose size does not divide the corresponding dimension of
    ``x`` are dropped from the spec (a batch of 4 under an 8-way "data"
    axis is left unconstrained rather than raising pjit's divisibility
    error) — sharding constraints are performance hints here, never
    correctness requirements, except ``conv_grad_guard`` whose batch axis
    always divides the batch it guards.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    m = _CURRENT_MESH.get()
    if m is None:
        return x
    suppressed = _SUPPRESSED_AXES.get() if _suppressible else frozenset()

    def fit(dim_size, d):
        """Scrub suppressed axes, then keep the longest prefix of the
        remaining axes whose size product divides dim_size."""
        names = d if isinstance(d, tuple) else (d,)
        names = tuple(a for a in names if a is not None and a not in suppressed)
        kept, prod = [], 1
        for a in names:
            sz = int(m.shape.get(a, 1))
            if dim_size % (prod * sz) != 0:
                break
            kept.append(a)
            prod *= sz
        if not kept:
            return None
        return kept[0] if len(kept) == 1 and not isinstance(d, tuple) else tuple(kept)

    spec = tuple(
        fit(x.shape[i], d) if i < x.ndim else None
        for i, d in enumerate(spec_dims)
    )
    if all(d is None for d in spec):
        return x  # nothing left to pin; don't force full replication
    return jax.lax.with_sharding_constraint(x, NamedSharding(m, P(*spec)))

"""Process-wide mesh context.

Functional flax modules don't carry the device mesh; the Trainer (or test)
registers it here so sharding-aware code paths (sequence-parallel attention,
activation sharding constraints) can pick it up at trace time.  The mesh is
static per process — this is configuration, not traced state.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

from jax.sharding import Mesh

_CURRENT_MESH: Optional[Mesh] = None
_SUPPRESSED_AXES: frozenset = frozenset()


@contextmanager
def suppress_constraint_axes(*axes: str):
    """Drop the given mesh axes from any ``constrain`` spec traced inside.

    Needed when model code is traced under ``jax.vmap(..., spmd_axis_name=ax)``
    (BMUF's per-replica local steps): JAX forbids a with_sharding_constraint
    spec from naming the vmap's spmd axis, and the vmap already pins that
    dimension's sharding anyway.
    """
    global _SUPPRESSED_AXES
    old = _SUPPRESSED_AXES
    _SUPPRESSED_AXES = old | frozenset(axes)
    try:
        yield
    finally:
        _SUPPRESSED_AXES = old


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def get_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


def seq_parallel_enabled() -> bool:
    m = _CURRENT_MESH
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
    """
    if not seq_parallel_enabled():
        return x
    return constrain(x, batch_axis)


def constrain(x, *spec_dims):
    """with_sharding_constraint(x, P(*spec_dims)) when a mesh is registered;
    no-op otherwise (single-device tests, CPU paths)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    m = _CURRENT_MESH
    if m is None:
        return x
    if _SUPPRESSED_AXES:
        def scrub(d):
            if isinstance(d, tuple):
                kept = tuple(a for a in d if a not in _SUPPRESSED_AXES)
                return kept or None
            return None if d in _SUPPRESSED_AXES else d

        spec_dims = tuple(scrub(d) for d in spec_dims)
        if all(d is None for d in spec_dims):
            return x  # nothing left to pin; don't force full replication
    return jax.lax.with_sharding_constraint(x, NamedSharding(m, P(*spec_dims)))

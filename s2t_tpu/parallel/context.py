"""Process-wide mesh context.

Functional flax modules don't carry the device mesh; the Trainer (or test)
registers it here so sharding-aware code paths (sequence-parallel attention,
activation sharding constraints) can pick it up at trace time.  The mesh is
static per process — this is configuration, not traced state.
"""

from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

_CURRENT_MESH: Optional[Mesh] = None


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def get_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


def seq_parallel_enabled() -> bool:
    m = _CURRENT_MESH
    return m is not None and int(m.shape.get("seq", 1)) > 1


def constrain(x, *spec_dims):
    """with_sharding_constraint(x, P(*spec_dims)) when a mesh is registered;
    no-op otherwise (single-device tests, CPU paths)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    m = _CURRENT_MESH
    if m is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(m, P(*spec_dims)))

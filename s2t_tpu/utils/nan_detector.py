"""NaN/Inf module localisation (reference: fairseq/nan_detector.py:14-108 —
forward/backward hooks reporting which module produced non-finite values,
triggered on FloatingPointError re-run, trainer.py:762-776).

The JAX equivalent re-runs the forward with flax ``capture_intermediates``
and scans the intermediate pytree for the first non-finite activation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def find_nonfinite_intermediates(
    model, params, *args, rngs=None, **kwargs
) -> List[str]:
    """Run a capture-intermediates forward; return module paths with NaN/Inf."""
    _, state = model.apply(
        {"params": params}, *args,
        capture_intermediates=True, mutable=["intermediates"],
        rngs=rngs, **kwargs,
    )
    flat = traverse_util.flatten_dict(state["intermediates"])
    bad = []
    for path, leaves in flat.items():
        for leaf in jax.tree.leaves(leaves):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                if not bool(jnp.all(jnp.isfinite(leaf))):
                    bad.append("/".join(str(p) for p in path))
                    break
    return bad


def check_grads_finite(grads) -> Tuple[bool, List[str]]:
    """Return (all_finite, offending_param_paths)."""
    flat = traverse_util.flatten_dict(grads) if isinstance(grads, dict) else {
        ("grads",): grads
    }
    bad = []
    for path, leaf in flat.items():
        if not bool(jnp.all(jnp.isfinite(leaf))):
            bad.append("/".join(str(p) for p in path))
    return len(bad) == 0, bad

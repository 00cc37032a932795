"""Quantization-noise training for iterative product quantization (iPQ).

(reference: fairseq/modules/quant_noise.py — "Training with Quantization
Noise for Extreme Model Compression": during training, randomly drop
contiguous ``block_size``-wide input-feature blocks of each weight matrix
and rescale the survivors by 1/(1-p), so the network becomes robust to the
block-wise quantization applied at deployment time.)

TPU-native redesign: the reference registers a forward pre-hook per wrapped
``nn.Linear``/``nn.Embedding`` that mutates ``weight.data`` in place.  Here
the whole transformation is a pure function over the parameter pytree,
applied once per train step inside jit — one fused masking pass over the
weights, no module wrappers, and gradients flow through the mask (dropped
blocks get zero gradient this step) instead of the reference's
in-place-mutation side effect.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _leaf_name(path) -> str:
    last = path[-1]
    return str(getattr(last, "key", last))


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def quant_noise_params(
    params: Any,
    rng: jax.Array,
    p: float,
    block_size: int = 8,
) -> Any:
    """Apply block quantization noise to every eligible weight leaf.

    Eligible leaves are 2-D ``kernel`` (flax Dense, laid out (in, out)) and
    ``embedding`` (vocab, dim) arrays whose blocked axis is a multiple of
    ``block_size`` — the same Linear/Embedding scope and
    input-features-blocking as the reference.  Biases, LayerNorm scales and
    conv kernels pass through untouched.
    """
    if p <= 0.0:
        return params

    scale = 1.0 / (1.0 - p)
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat

    out = []
    for path, leaf in leaves:
        name = _leaf_name(path)
        eligible = (
            hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and name in ("kernel", "embedding")
        )
        if not eligible:
            out.append(leaf)
            continue
        if name == "kernel":
            blocked_axis, other_axis = 0, 1  # (in, out): block input features
        else:
            blocked_axis, other_axis = 1, 0  # (vocab, dim): block the dim
        n_block = leaf.shape[blocked_axis]
        if n_block % block_size != 0:
            out.append(leaf)
            continue
        # deterministic per-leaf stream: fold a stable path hash into rng
        # (zlib.crc32, not hash() — the latter is salted per process)
        import zlib

        leaf_rng = jax.random.fold_in(
            rng, zlib.crc32(_path_str(path).encode()) & 0x7FFFFFFF
        )
        mask = jax.random.bernoulli(
            leaf_rng, p,
            (n_block // block_size, leaf.shape[other_axis]),
        )
        mask = jnp.repeat(mask, block_size, axis=0)
        if blocked_axis == 1:
            mask = mask.T
        out.append(jnp.where(mask, 0.0, leaf * jnp.asarray(scale, leaf.dtype)))
    return jax.tree_util.tree_unflatten(treedef, [l for l in out])

"""Bandwidth-lean dropout for TPU.

``flax.linen.Dropout`` draws a float32 uniform and compares — on the big
attention-probability tensors (B, H, T, T) that is 4 bytes of HBM write plus
a bool pass per element just to build the mask (profiled at ~5.8 ms/step of
the 42 ms m-model step: 3.8 ms ``_uniform`` + 2.0 ms ``lt``).  This module
draws raw uint8 bits instead — 1 byte/element — and compares against a
threshold k = round(rate·256).

The effective drop rate is quantized to k/256 (e.g. 0.15 → 38/256 ≈ 0.1484);
the rescale uses the EFFECTIVE keep probability, so the estimator stays
exactly unbiased.  For the rates used by the recipes (0.1/0.15/0.25/0.5 …)
the quantization error is ≤ 0.002 absolute, far below run-to-run noise.

Same call contract as ``nn.Dropout``: ``Dropout(rate)(x, deterministic=...)``
drawing from the "dropout" rng collection.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _regen_dropout(x, key, k):
    return _regen_fwd(x, key, k)[0]


def _mask_apply(x, key, k):
    bits = jax.random.bits(key, x.shape, dtype=jnp.uint8)
    scale = jnp.asarray(1.0 / (1.0 - k / 256.0), x.dtype)
    return jnp.where(bits >= jnp.uint8(k), x * scale, 0)


def _regen_fwd(x, key, k):
    # residual is just the key: backward re-draws the identical bits instead
    # of storing the (x.shape) u8 mask across fwd->bwd.  With the hardware
    # rng (rbg) regeneration is cheaper than the mask's HBM round trip on
    # every large tensor this module guards (attention probs, FFN
    # activations).
    return _mask_apply(x, key, k), key


def _regen_bwd(k, key, g):
    return _mask_apply(g, key, k), None


_regen_dropout.defvjp(_regen_fwd, _regen_bwd)


class Dropout(nn.Module):
    rate: float
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)
        k = int(round(self.rate * 256))
        if k <= 0:
            return x
        k = min(k, 255)
        return _regen_dropout(x, self.make_rng(self.rng_collection), k)

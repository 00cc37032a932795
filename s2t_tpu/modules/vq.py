"""K-means (VQ-VAE style) vector quantizer.

(reference: fairseq/modules/kmeans_vector_quantizer.py:11-127 — grouped
straight-through quantization with a codebook/commitment MSE pair; used by
wav2vec v1 when --vq-type kmeans.)

The gumbel quantizer lives with wav2vec2 (models/wav2vec2.py); this module
is its hard-assignment sibling.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


class KmeansVectorQuantizer(nn.Module):
    input_dim: int
    num_vars: int = 320
    groups: int = 2
    vq_dim: int = 512
    combine_groups: bool = False
    gamma: float = 0.25  # commitment weight
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """x: (B, T, C) -> {"x": quantized (B, T, vq_dim), "kmeans_loss",
        "code_perplexity", "targets" (B, T, G) codebook indices}."""
        assert self.vq_dim % self.groups == 0
        var_dim = self.vq_dim // self.groups
        B, T, C = x.shape
        G, V = self.groups, self.num_vars

        # grouped 1x1 projection + single-group f32 norm (reference
        # projection = grouped Conv1d(k=1) + Fp32GroupNorm(groups, dim))
        ze = nn.Conv(
            features=C, kernel_size=(1,), feature_group_count=G,
            use_bias=False, dtype=self.dtype, name="proj",
        )(x)
        ze = nn.GroupNorm(num_groups=G, dtype=jnp.float32, name="norm")(
            ze.astype(jnp.float32)
        )
        ze_g = ze.reshape(B, T, G, var_dim)

        n_groups = 1 if self.combine_groups else G
        emb = self.param(
            "embedding",
            lambda k, s: 0.01 * jax.random.normal(k, s),
            (V, n_groups, var_dim),
        )
        emb_full = (
            jnp.broadcast_to(emb, (V, G, var_dim)) if self.combine_groups else emb
        ).astype(jnp.float32)

        # nearest codeword per (b, t, g)
        d = jnp.sum(
            (ze_g[:, :, :, None] - emb_full.transpose(1, 0, 2)[None, None]) ** 2,
            axis=-1,
        )  # (B, T, G, V)
        idx = jnp.argmin(d, axis=-1)  # (B, T, G)
        one_hot = jax.nn.one_hot(idx, V, dtype=jnp.float32)
        zq = jnp.einsum("btgv,vgd->btgd", one_hot, emb_full)

        # straight-through: forward zq, gradient to ze
        out = jax.lax.stop_gradient(zq) + (ze_g - jax.lax.stop_gradient(ze_g))
        out = out.reshape(B, T, self.vq_dim).astype(x.dtype)

        hard_probs = jnp.mean(one_hot.reshape(B * T, G, V), axis=0)
        code_ppl = jnp.sum(
            jnp.exp(-jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1))
        )
        latent = jnp.mean((zq - jax.lax.stop_gradient(ze_g)) ** 2)
        commit = jnp.mean((ze_g - jax.lax.stop_gradient(zq)) ** 2)
        return {
            "x": out,
            "targets": idx,
            "code_perplexity": code_ppl,
            "num_vars": V,
            "kmeans_loss": latent + self.gamma * commit,
        }

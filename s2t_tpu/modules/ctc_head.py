"""CTC projection head (reference: fairseq/modules/speech_to_text/ctc.py:17-136).

LayerNorm (optional) → dropout → Dense to vocab.  The projection can be weight-
shared with a token embedding (``share_ctc_and_embed``,
reference: s2t_transformer.py:965-972) by passing ``embedding`` at call time.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from s2t_tpu.modules.dropout import Dropout as _FastDropout


class CTCHead(nn.Module):
    vocab_size: int
    dropout: float = 0.0
    norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        embedding: Optional[jnp.ndarray] = None,
        return_fused: bool = False,
    ) -> jnp.ndarray:
        """``return_fused=True`` additionally returns the projection inputs
        {"hidden", "kernel" (D, V), "bias" (V,) or None} so the CTC loss can
        gather emission scores as a small (B,T,D)x(B,S,D) matmul instead of
        routing them through the full (B, T, V) logits (ops/ctc.py
        _fused_head_emissions)."""
        if self.norm:
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = _FastDropout(self.dropout)(x, deterministic=deterministic)
        if embedding is not None:
            # shared with embedding table: logits = x @ E^T
            logits = jnp.einsum("btd,vd->btv", x, embedding.astype(x.dtype))
            if return_fused:
                return logits, {
                    "hidden": x,
                    "kernel": embedding.astype(x.dtype).T,
                    "bias": None,
                }
            return logits
        proj = nn.Dense(self.vocab_size, dtype=self.dtype, name="proj")
        logits = proj(x)
        if return_fused:
            return logits, {
                "hidden": x,
                "kernel": proj.variables["params"]["kernel"],
                "bias": proj.variables["params"]["bias"],
            }
        return logits

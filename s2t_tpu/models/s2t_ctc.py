"""Encoder-only CTC model (CTC-NAST family).

(reference: fairseq/models/speech_to_text/s2t_ctc.py:28-346 — encoder-only
model whose "decoder" is the CTCDecoder inference engine: greedy collapse,
beam, self-ensemble over inter-CTC logits.)

Non-autoregressive: one encoder pass emits the whole hypothesis, so decode
cost is O(T) not O(U·beam).  XCTC heads give target-language CTC (NAST ST).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.models.s2t_transformer import (
    S2TTransformerConfig,
    S2TTransformerEncoder,
    s2t_transformer_s,
)
from s2t_tpu.registry import register_model, register_model_architecture


@register_model("s2t_ctc")
class S2TCTCModel(nn.Module):
    """Encoder-only model; forward returns encoder/CTC outputs only."""

    cfg: S2TTransformerConfig

    def setup(self):
        self.encoder = S2TTransformerEncoder(self.cfg, name="encoder")

    def __call__(
        self,
        features: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        prev_tokens: jnp.ndarray = None,  # unused; kept for interface parity
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        enc = self.encoder(features, feat_lengths, deterministic)
        return {"decoder_logits": None, **enc}

    def encode(self, features, feat_lengths, deterministic: bool = True):
        return self.encoder(features, feat_lengths, deterministic)


@register_model_architecture("s2t_ctc", "s2t_ctc")
def s2t_ctc_base(**kw) -> S2TTransformerConfig:
    cfg = s2t_transformer_s(decoder_layers=0, use_ctc=True)
    return cfg.replace(**kw)


@register_model_architecture("s2t_ctc", "s2t_nast")
def s2t_nast(**kw) -> S2TTransformerConfig:
    """NAST: deep encoder, inter-CTC + PAE, XCTC for translation
    (reference: egs/mustc/st/conf/reproduction_nast.yaml regime)."""
    cfg = s2t_transformer_s(
        decoder_layers=0,
        encoder_layers=18,
        use_ctc=True,
        inter_ctc_layers=(6, 9, 12),
        ctc_pae="inter_league",
        use_xctc=True,
    )
    return cfg.replace(**kw)

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
    """Encoder-only model; forward returns encoder/CTC outputs only.

    The encoder family follows the config type: an ``SATEConfig`` selects
    the stacked acoustic+textual encoder (reference: s2t_ctc.py:491
    --acoustic-encoder transformer|pds|sate — the NAST-on-SATE/PDS recipes,
    e.g. egs/mustc/st/conf/nast_pds_big.yaml with encoder-type: sate)."""

    cfg: Any

    def setup(self):
        from s2t_tpu.models.pds import PDSConfig, PDSEncoder
        from s2t_tpu.models.sate import S2TSATEEncoder, SATEConfig

        if isinstance(self.cfg, SATEConfig):
            self.encoder = S2TSATEEncoder(self.cfg, name="encoder")
        elif isinstance(self.cfg, PDSConfig):
            # encoder-type pds (reference: s2t_ctc.py:66 — the
            # EffecientConformer / purectc_pds_* recipes)
            self.encoder = PDSEncoder(self.cfg, name="encoder")
        else:
            self.encoder = S2TTransformerEncoder(self.cfg, name="encoder")

    def __call__(
        self,
        features: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        prev_tokens: jnp.ndarray = None,  # unused; kept for interface parity
        deterministic: bool = True,
        **kwargs,
    ) -> Dict[str, Any]:
        enc = self.encoder(features, feat_lengths, deterministic, **kwargs)
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


@register_model_architecture("s2t_ctc", "s2t_ctc_pds")
def s2t_ctc_pds(**kw):
    """Encoder-only CTC over a PDS encoder (reference: s2t_ctc.py:66
    --encoder-type pds — the purectc_pds_* and EffecientConformerCTC
    recipes, e.g. egs/librispeech/asr/conf/EffecientConformerCTCSmall.yaml)."""
    from s2t_tpu.models.pds import pdss2t_transformer_s_8

    kw.setdefault("decoder_layers", 0)
    kw.setdefault("use_ctc", True)
    return pdss2t_transformer_s_8(**kw)


@register_model_architecture("s2t_ctc", "s2t_ctc_sate")
def s2t_ctc_sate(**kw):
    """Encoder-only NAST over the SATE encoder (acoustic transformer or PDS
    by acoustic_encoder=...; reference: nast_pds_big.yaml encoder-type: sate
    + acoustic-encoder: pds)."""
    from s2t_tpu.models.sate import s2t_sate_s

    kw.setdefault("acoustic_decoder_layers", 0)
    return s2t_sate_s(**kw)

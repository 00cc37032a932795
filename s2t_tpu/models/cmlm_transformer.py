"""CMLM — Conditional Masked Language Model NAT (Mask-Predict).

(reference: fairseq/models/nat/cmlm_transformer.py:27 CMLMNATransformerModel
over models/nat/nonautoregressive_transformer.py NATransformerModel —
bidirectional decoder fills <unk>-masked target positions in parallel;
a 256-way length head over mean-pooled encoder states predicts |y|
(:235,368-400); decode = iterative mask-predict with skeptical re-masking.)

TPU design: the decoder is the shared TransformerDecoder with causal=False;
the refinement loop lives in inference/iterative_refinement.py as a jitted
lax.fori_loop over a fixed-width canvas.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.models.transformer import TransformerMTConfig, TransformerTextEncoder
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask


@dataclass(frozen=True)
class CMLMConfig(TransformerMTConfig):
    length_loss_factor: float = 0.1
    max_length_classes: int = 256  # length head arity (reference clamps 0..255)
    unk_id: int = 3
    bos_id: int = 0
    eos_id: int = 2


@register_model("cmlm_transformer")
class CMLMTransformerModel(nn.Module):
    cfg: CMLMConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = TransformerTextEncoder(cfg, name="encoder")
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size, embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim, num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads, dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout, activation=cfg.activation_fn,
            normalize_before=cfg.decoder_normalize_before,
            share_input_output_embed=cfg.share_decoder_input_output_embed,
            max_positions=cfg.max_target_positions, pad_id=cfg.pad_id,
            dtype=cfg.dtype, causal=False, name="decoder",
        )
        self.length_head = nn.Dense(
            cfg.max_length_classes, dtype=cfg.dtype, name="length_head"
        )

    def _length_logits(self, enc_out, enc_valid):
        # masked mean-pool over source states (reference pools enc_feats mean)
        m = enc_valid[..., None].astype(enc_out.dtype)
        pooled = jnp.sum(enc_out * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        return self.length_head(pooled)

    def __call__(
        self,
        src_tokens: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_tokens: jnp.ndarray,
        tgt_tokens: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        enc = self.encoder(src_tokens, src_lengths, deterministic)
        enc_valid = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self.decoder(prev_tokens, enc["encoder_out"], enc_valid, deterministic)
        length_logits = self._length_logits(enc["encoder_out"], enc_valid)
        out: Dict[str, Any] = {
            "word_ins_logits": logits,
            "word_ins_mask": prev_tokens == cfg.unk_id,
            "length_logits": length_logits,
            **enc,
        }
        if tgt_tokens is not None:
            tgt_len = jnp.sum((tgt_tokens != cfg.pad_id).astype(jnp.int32), axis=1)
            out["length_tgt"] = jnp.clip(tgt_len, 0, cfg.max_length_classes - 1)
        return out

    # -- refinement-generator hooks ------------------------------------------ #
    def encode(self, src_tokens, src_lengths, deterministic: bool = True):
        return self.encoder(src_tokens, src_lengths, deterministic)

    def predict_length(self, encoder_out, encoder_valid_mask):
        """Greedy length prediction (reference :393-400)."""
        logits = self._length_logits(encoder_out, encoder_valid_mask)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def nat_decode(self, prev_tokens, encoder_out, encoder_valid_mask):
        """Fill all positions in parallel: (B, T) tokens -> (B, T, V) logits."""
        return self.decoder(prev_tokens, encoder_out, encoder_valid_mask, True)


@dataclass(frozen=True)
class NACRFConfig(CMLMConfig):
    crf_rank: int = 32
    crf_beam: int = 8
    # keep a (down-weighted) token-level CE alongside the CRF nll
    # (reference: nacrf_transformer.py --word-ins-loss-factor, default 0.5)
    word_ins_factor: float = 0.5


@register_model("nacrf_transformer")
class NACRFTransformerModel(CMLMTransformerModel):
    """NAT with a structured (CRF) output layer (reference:
    models/nat/nacrf_transformer.py:12 over modules/dynamic_crf_layer.py —
    single parallel pass, then Viterbi over a low-rank beam-restricted
    linear-chain CRF instead of independent argmax)."""

    cfg: NACRFConfig

    def setup(self):
        super().setup()
        from s2t_tpu.modules.dynamic_crf import DynamicCRF

        self.crf = DynamicCRF(
            self.cfg.vocab_size, self.cfg.crf_rank, self.cfg.crf_beam,
            dtype=self.cfg.dtype, name="crf",
        )

    def __call__(self, src_tokens, src_lengths, prev_tokens,
                 tgt_tokens=None, deterministic=True):
        out = super().__call__(
            src_tokens, src_lengths, prev_tokens, tgt_tokens, deterministic
        )
        if tgt_tokens is not None:
            mask = tgt_tokens != self.cfg.pad_id
            out["crf_nll"] = self.crf.nll(
                out["word_ins_logits"], tgt_tokens, mask
            )
            out["word_ins_factor"] = self.cfg.word_ins_factor
        return out

    def crf_decode(self, emissions, nonpad_mask):
        """Viterbi over the candidate lattice -> (tokens (B, T), score (B,))."""
        return self.crf.viterbi(emissions, nonpad_mask)


@register_model_architecture("nacrf_transformer", "nacrf_transformer")
def nacrf_transformer(**kw) -> NACRFConfig:
    return NACRFConfig(
        encoder_normalize_before=False, decoder_normalize_before=False,
    ).replace(**kw)


@register_model_architecture("cmlm_transformer", "cmlm_transformer")
def cmlm_transformer(**kw) -> CMLMConfig:
    return CMLMConfig(
        encoder_normalize_before=False, decoder_normalize_before=False,
    ).replace(**kw)


@register_model_architecture("cmlm_transformer", "cmlm_transformer_small")
def cmlm_transformer_small(**kw) -> CMLMConfig:
    return CMLMConfig(
        encoder_embed_dim=256, encoder_ffn_embed_dim=1024,
        encoder_attention_heads=4, decoder_embed_dim=256,
        decoder_ffn_embed_dim=1024, decoder_attention_heads=4,
    ).replace(**kw)


@register_model_architecture("cmlm_transformer", "nonautoregressive_transformer")
def nonautoregressive_transformer(**kw) -> CMLMConfig:
    """Vanilla single-pass NAT (reference:
    models/nat/nonautoregressive_transformer.py NATransformerModel — the
    class CMLM extends).  Same graph as CMLM; vanilla NAT is trained with
    full_mask noise (every target position is <unk>) and decoded with
    iter_decode_max_iter=1, which reduces mask-predict to one parallel pass."""
    return CMLMConfig(
        encoder_normalize_before=False, decoder_normalize_before=False,
    ).replace(**kw)

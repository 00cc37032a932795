"""Multi-branch speech model, reference-faithful.

(reference: fairseq/models/speech_to_text/s2t_multibranch.py:43 — a junior
acoustic S2T encoder feeds a senior acoustic branch and a textual branch
through (optional) PAE adapters; the branches advance in an interleaved
collaboration schedule (--collaboration-direction acoustic/textual/both/none,
--collaboration-start, --collaboration-step) where each branch's layers
league-attend the OTHER branch's current state
(modules/s2t_transformer_s2_layer.py for the senior, transformer_s2_layer.py
for the textual); a TransformerS2 decoder attends the senior stream (s1) and
the textual stream (s2).  Branch input paths (s2t_multibranch.py:556-648):
senior = adapter → zero-pads → embed_ln → scale → abs positions → dropout
(S2TTransformerS2Encoder.forward_input:879-903); textual = adapter → abs
positions → dropout; both pad-zeroed before the collaboration loop.)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.models.s2t_transformer import (
    S2TTransformerConfig,
    S2TTransformerEncoder,
    s2t_transformer_s,
)
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.modules.adapter import Adapter
from s2t_tpu.modules.attention import padding_bias
from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.modules.positional import fairseq_sinusoidal_encoding
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class S2TMultiBranchConfig:
    # the junior acoustic encoder is a full s2t encoder (subsampler, abs
    # positions, optional embed-norm, CTC) — reference builds
    # S2TTransformerEncoder(args) verbatim (s2t_multibranch.py:413-416)
    junior: S2TTransformerConfig = dataclasses.field(
        default_factory=S2TTransformerConfig
    )
    senior_layers: int = 6
    textual_layers: int = 6
    # none | acoustic (textual→senior) | textual (senior→textual) | both
    collaboration_direction: str = "both"
    collaboration_start: Tuple[int, int] = (0, 0)
    collaboration_step: Tuple[int, int] = (1, 1)
    encoder_collaboration_mode: str = "parallel"  # none | serial | parallel
    decoder_collaboration_mode: str = "parallel"
    encoder_league_s1_ratio: float = 0.5
    encoder_league_s2_ratio: float = 0.5
    decoder_league_s1_ratio: float = 0.5
    decoder_league_s2_ratio: float = 0.5
    acoustic_adapter: str = "none"  # PAE bridging junior CTC → senior input
    textual_adapter: str = "none"
    consumes_transcript: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return self.junior.dtype

    @property
    def vocab_size(self):
        return self.junior.vocab_size

    @property
    def ctc_vocab_size(self):
        return self.junior.ctc_vocab_size

    @property
    def decoder_layers(self):
        return self.junior.decoder_layers

    @property
    def max_target_positions(self):
        return self.junior.max_target_positions

    @property
    def subsampling_layers(self):
        return self.junior.subsampling_layers

    @property
    def subsampling_stride(self):
        return self.junior.subsampling_stride


class S2TMultiBranchEncoder(nn.Module):
    cfg: S2TMultiBranchConfig

    def setup(self):
        cfg = self.cfg
        jc = cfg.junior
        dt = jc.dtype
        D = jc.encoder_embed_dim
        self.junior = S2TTransformerEncoder(jc, name="junior")
        if cfg.acoustic_adapter != "none":
            self.ae_adapter = Adapter(
                D, cfg.ctc_vocab_size, cfg.acoustic_adapter, dtype=dt,
                name="ae_adapter",
            )
        if cfg.textual_adapter != "none":
            self.te_adapter = Adapter(
                D, cfg.ctc_vocab_size, cfg.textual_adapter, dtype=dt,
                name="te_adapter",
            )
        if jc.encoder_embed_norm:
            # the senior branch's OWN embed norm (forward_input:883)
            self.senior_embed_norm = nn.LayerNorm(dtype=dt, name="senior_embed_norm")

        def s2_layers(n, prefix):
            return [
                S2TEncoderLayer(
                    D, jc.encoder_ffn_embed_dim, jc.encoder_attention_heads,
                    jc.dropout, jc.attention_dropout, jc.activation_dropout,
                    jc.activation_fn, jc.encoder_normalize_before, "abs",
                    collaboration_mode=cfg.encoder_collaboration_mode,
                    league_s1_ratio=cfg.encoder_league_s1_ratio,
                    league_s2_ratio=cfg.encoder_league_s2_ratio,
                    # both branch stacks apply s2_norm: the multibranch
                    # forward passes s2_need_norm=True (reference
                    # s2t_multibranch.py:674,699,716,730)
                    s2_apply_norm=True,
                    dtype=dt, name=f"{prefix}{i}",
                )
                for i in range(n)
            ]

        self.senior_stack = s2_layers(cfg.senior_layers, "senior")
        self.textual_stack = s2_layers(cfg.textual_layers, "textual")
        if jc.encoder_normalize_before:
            self.senior_final_norm = nn.LayerNorm(dtype=dt, name="senior_final_norm")
            self.textual_final_norm = nn.LayerNorm(dtype=dt, name="textual_final_norm")
        self.drop = _FastDropout(jc.dropout)

    def _collab_schedule(self):
        """Yield ("senior"|"textual", layer_idx, collaborate: bool) in the
        reference's interleaved order."""
        cfg = self.cfg
        s_i = t_i = -1
        order = []
        while s_i < cfg.senior_layers - 1 or t_i < cfg.textual_layers - 1:
            if cfg.collaboration_direction == "acoustic":
                # textual first (no s2), then senior attending textual
                for _ in range(cfg.collaboration_step[1]):
                    t_i += 1
                    if t_i < cfg.textual_layers:
                        order.append(("textual", t_i, False))
                for _ in range(cfg.collaboration_step[0]):
                    s_i += 1
                    if s_i < cfg.senior_layers:
                        order.append(
                            ("senior", s_i, s_i >= cfg.collaboration_start[0])
                        )
            else:
                for _ in range(cfg.collaboration_step[0]):
                    s_i += 1
                    if s_i < cfg.senior_layers:
                        collab = (
                            cfg.collaboration_direction == "both"
                            and s_i >= cfg.collaboration_start[0]
                        )
                        order.append(("senior", s_i, collab))
                for _ in range(cfg.collaboration_step[1]):
                    t_i += 1
                    if t_i < cfg.textual_layers:
                        collab = (
                            cfg.collaboration_direction in ("textual", "both")
                            and t_i >= cfg.collaboration_start[1]
                        )
                        order.append(("textual", t_i, collab))
        return order

    def __call__(self, features, lengths, deterministic: bool = True, **kw):
        cfg = self.cfg
        jc = cfg.junior
        jout = self.junior(features, lengths, deterministic, **kw)
        jx = jout["encoder_out"]
        jlen = jout["encoder_lengths"]
        ctc_logits = jout["ctc_logits"]
        T = jx.shape[1]
        valid = lengths_to_mask(jlen, T)
        bias = padding_bias(valid, jx.dtype)

        # senior input path (forward_input)
        ae = jx
        if cfg.acoustic_adapter != "none":
            ae = self.ae_adapter(ae, ctc_logits, deterministic=deterministic)
        ae = jnp.where(valid[..., None], ae, 0.0)
        if jc.encoder_embed_norm:
            ae = self.senior_embed_norm(ae)
        if not jc.encoder_no_scale_embedding:
            ae = ae * jnp.sqrt(jc.encoder_embed_dim).astype(ae.dtype)
        pe = fairseq_sinusoidal_encoding(T, jc.encoder_embed_dim, jc.pad_id, ae.dtype)
        ae = ae + pe[None]
        ae = self.drop(ae, deterministic=deterministic)

        # textual input path: adapter + positions + dropout (no norm/scale)
        te = jx
        if cfg.textual_adapter != "none":
            te = self.te_adapter(te, ctc_logits, deterministic=deterministic)
        te = te + pe[None].astype(te.dtype)
        te = self.drop(te, deterministic=deterministic)

        # both streams pad-zeroed before the loop (reference :640-648)
        ae = jnp.where(valid[..., None], ae, 0.0)
        te = jnp.where(valid[..., None], te, 0.0)

        for branch, idx, collab in self._collab_schedule():
            if branch == "senior":
                ae = self.senior_stack[idx](
                    ae, valid, bias, None, deterministic,
                    s2=te if collab else None, s2_bias=bias if collab else None,
                )
            else:
                te = self.textual_stack[idx](
                    te, valid, bias, None, deterministic,
                    s2=ae if collab else None, s2_bias=bias if collab else None,
                )
        if jc.encoder_normalize_before:
            ae = self.senior_final_norm(ae)
            te = self.textual_final_norm(te)

        return {
            **jout,
            "encoder_out": ae,  # s1 stream for the decoder (reference :762)
            "s2_encoder_out": te,
            "junior_out": jx,
            "encoder_lengths": jlen,
            "ctc_logits": ctc_logits,
            "mixup": None,
        }


@register_model("s2t_multibranch")
class S2TMultiBranchModel(nn.Module):
    cfg: S2TMultiBranchConfig

    def setup(self):
        cfg = self.cfg
        jc = cfg.junior
        self.encoder = S2TMultiBranchEncoder(cfg, name="encoder")
        self.decoder = TransformerDecoder(
            vocab_size=jc.vocab_size,
            embed_dim=jc.decoder_embed_dim,
            ffn_dim=jc.decoder_ffn_embed_dim,
            num_layers=jc.decoder_layers,
            num_heads=jc.decoder_attention_heads,
            dropout=jc.dropout,
            attention_dropout=jc.attention_dropout,
            activation_dropout=jc.activation_dropout,
            activation=jc.activation_fn,
            normalize_before=jc.decoder_normalize_before,
            share_input_output_embed=jc.share_decoder_input_output_embed,
            max_positions=jc.max_target_positions,
            collaboration_mode=cfg.decoder_collaboration_mode,
            league_s1_ratio=cfg.decoder_league_s1_ratio,
            league_s2_ratio=cfg.decoder_league_s2_ratio,
            dtype=jc.dtype, name="decoder",
        )

    def __call__(self, features, feat_lengths, prev_tokens,
                 deterministic: bool = True, **kw) -> Dict[str, Any]:
        enc = self.encoder(features, feat_lengths, deterministic)
        valid = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        s2_kw = {}
        if self.cfg.decoder_collaboration_mode != "none":
            s2_kw = {"s2_out": enc["s2_encoder_out"], "s2_valid_mask": valid}
        logits = self.decoder(
            prev_tokens, enc["encoder_out"], valid, deterministic, **s2_kw
        )
        return {"decoder_logits": logits, **enc}

    def encode(self, features, feat_lengths, deterministic: bool = True):
        return self.encoder(features, feat_lengths, deterministic)


def _route_mb_ctx(kw):
    kw = dict(kw)
    junior_layers = kw.pop("junior_layers", None)
    j_kw = {k[len("junior_"):]: v for k, v in kw.items() if k.startswith("junior_")}
    rest = {k: v for k, v in kw.items() if not k.startswith("junior_")}
    if junior_layers is not None:
        j_kw["encoder_layers"] = junior_layers
    for key in ("vocab_size", "src_vocab_size", "input_feat_per_channel",
                "input_channels", "max_source_positions", "max_target_positions",
                "encoder_embed_dim", "encoder_ffn_embed_dim",
                "encoder_attention_heads", "subsampling_filter",
                "decoder_layers", "decoder_embed_dim", "decoder_ffn_embed_dim",
                "decoder_attention_heads", "dropout", "attention_dropout",
                "activation_dropout", "encoder_embed_norm",
                "encoder_no_scale_embedding", "dtype_str"):
        if key in rest:
            j_kw[key] = rest.pop(key)
    return j_kw, rest


@register_model_architecture("s2t_multibranch", "s2t_multibranch")
@register_model_architecture("s2t_multibranch", "s2t_multibranch_s")
def s2t_multibranch_s(**kw) -> S2TMultiBranchConfig:
    j_kw, rest = _route_mb_ctx(kw)
    junior = s2t_transformer_s(use_ctc=True, **j_kw)
    return S2TMultiBranchConfig(junior=junior).replace(**{
        k: (tuple(v) if isinstance(v, list) else v) for k, v in rest.items()
    })

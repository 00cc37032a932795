"""SATE — Stacked Acoustic-and-Textual Encoding (ACL'21).

(reference: fairseq/models/speech_to_text/s2t_sate.py:37-1100 —
S2TSATEEncoder (:833) = acoustic encoder (transformer or PDS) → CTC →
Adapter bridge → TextualEncoder (:349, text-transformer with its own
positions and optional XCTC); pretrained ASR/MT component init via
checkpoint_utils.load_pretrained_component_from_model (:268-296); optional
freezing of either encoder (:855-856).)

The adapter bridge supports all PAE types including ``shrink`` (CTC-blank
collapse) via the static-shape segment matmul (modules/adapter.py).
Pretrained init maps to utils.checkpoint.transplant_component on the
"encoder/acoustic" and "encoder/textual" subtrees.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple, TYPE_CHECKING

import flax.linen as nn
import jax
import jax.numpy as jnp

if TYPE_CHECKING:
    from s2t_tpu.models.pds import PDSConfig

from s2t_tpu.modules.adapter import Adapter, ctc_shrink_matrix
from s2t_tpu.modules.attention import padding_bias
from s2t_tpu.modules.ctc_head import CTCHead
from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.modules.positional import (
    fairseq_sinusoidal_encoding,
    relative_encoding,
)
from s2t_tpu.models.s2t_transformer import (
    S2TTransformerConfig,
    S2TTransformerEncoder,
    s2t_transformer_s,
)
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class SATEConfig:
    acoustic: S2TTransformerConfig = dataclasses.field(
        default_factory=S2TTransformerConfig
    )
    # acoustic encoder family: "transformer" or "pds" (reference:
    # s2t_sate.py:845-854 --acoustic-encoder; the sate_pds_* recipes stack
    # a progressive-downsampling acoustic encoder under the textual one)
    acoustic_encoder: str = "transformer"
    # PDS acoustic-encoder config when acoustic_encoder == "pds"; its final
    # stage dim must equal acoustic.encoder_embed_dim (the adapter/textual
    # stack reads dims from ``acoustic``)
    pds: Optional["PDSConfig"] = None
    # adapter bridge (reference: adapter types at modules/speech_to_text/adapter.py:109)
    adapter_type: str = "league"
    adapter_shrink_strategy: str = "avg"
    adapter_temperature: float = 1.0
    # textual encoder
    text_encoder_layers: int = 6
    text_attention_heads: int = 4
    text_ffn_embed_dim: int = 2048
    text_attention_type: str = "abs"
    text_use_xctc: bool = False
    # textual embedding treatment (reference: s2t_sate.py:360-377)
    text_no_pos_emb: bool = False
    textual_encoder_embed_norm: bool = False
    textual_encoder_no_scale_embedding: bool = True
    # intermediate XCTC taps inside the textual encoder (1-indexed textual
    # layers) with optional PAE re-injection + ground-truth curriculum
    # (reference: s2t_sate.py:439-553, BiL-CTC progressive)
    inter_xctc_layers: Tuple[int, ...] = ()
    xctc_pae: str = "none"
    share_inter_xctc_norm: bool = False
    xctc_pae_ground_truth_ratio: float = 0.0
    xctc_pae_ground_truth_only_mistake: bool = False
    pae_oracle_smooth: bool = False
    pae_unnorm_input: bool = False
    # XCTC cross-attention (CTC-Aug, reference: s2t_sate.py:554-700):
    # textual layers >= cross_attn_start_layer (1-indexed) additionally
    # cross-attend to the normed snapshot taken after cross_attn_layer
    xctc_cross_attn: bool = False
    cross_attn_start_layer: int = 0
    cross_attn_layer: int = 0
    cross_attn_collaboration_mode: str = "serial"  # serial | league
    cross_attn_league_drop_net: bool = False
    cross_attn_league_drop_net_prob: float = 0.0
    # freezing (gradient stop; param-freeze masks live in the optimizer)
    freeze_acoustic_encoder: bool = False
    freeze_textual_encoder: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    # pass-throughs used by generator/task plumbing
    @property
    def vocab_size(self):
        return self.acoustic.vocab_size

    @property
    def decoder_layers(self):
        return self.acoustic.decoder_layers

    @property
    def max_target_positions(self):
        return self.acoustic.max_target_positions

    @property
    def subsampling_layers(self):
        return self.acoustic.subsampling_layers

    @property
    def subsampling_stride(self):
        return self.acoustic.subsampling_stride

    @property
    def dtype(self):
        return self.acoustic.dtype

    # oracle-curriculum pass-through for the task forward adapter
    # (tasks/speech_to_text._model_wants_oracle reads these off model.cfg)
    @property
    def ctc_pae_ground_truth_ratio(self):
        return self.acoustic.ctc_pae_ground_truth_ratio


class CrossStreamTextLayer(nn.Module):
    """Textual-encoder layer with an extra cross-attention onto a second
    stream s2 — the CTC-Aug "S2" layer (reference: s2t_sate.py:554-700 +
    modules/transformer_s2_layer.py).

    serial: self-attn → cross-attn(s2) → FFN (each a pre-norm residual).
    league: self-attn and cross-attn computed from the same normed input and
    summed 0.5/0.5, with optional drop-net (during training, drop one stream
    with probability p, picking either with equal chance)."""

    dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    collaboration_mode: str = "serial"
    drop_net: bool = False
    drop_net_prob: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, s2, s2_bias, deterministic: bool = True):
        from s2t_tpu.modules.attention import MultiHeadAttention
        from s2t_tpu.modules.layers import FeedForward

        drop = _FastDropout(self.dropout)
        res = x
        norm_attn = nn.LayerNorm(dtype=self.dtype, name="attn_norm")
        h = norm_attn(x) if self.normalize_before else x
        self_out, _ = MultiHeadAttention(
            self.dim, self.num_heads, self.attention_dropout,
            dtype=self.dtype, name="self_attn",
        )(h, h, h, bias, deterministic)
        if self.collaboration_mode == "league" and s2 is not None:
            cross_out, _ = MultiHeadAttention(
                self.dim, self.num_heads, self.attention_dropout,
                dtype=self.dtype, name="s2_attn",
            )(h, s2, s2, s2_bias, deterministic)
            w1 = w2 = jnp.asarray(0.5, x.dtype)
            if self.drop_net and not deterministic and self.drop_net_prob > 0:
                k = self.make_rng("dropout")
                k1, k2 = jax.random.split(k)
                dropped = jax.random.uniform(k1) < self.drop_net_prob
                pick_first = jax.random.uniform(k2) < 0.5
                w1 = jnp.where(dropped, jnp.where(pick_first, 1.0, 0.0), 0.5).astype(x.dtype)
                w2 = jnp.where(dropped, jnp.where(pick_first, 0.0, 1.0), 0.5).astype(x.dtype)
            h_out = w1 * self_out + w2 * cross_out
            x = res + drop(h_out, deterministic=deterministic)
            if not self.normalize_before:
                x = norm_attn(x)
        else:
            x = res + drop(self_out, deterministic=deterministic)
            if not self.normalize_before:
                x = norm_attn(x)
            if s2 is not None:  # serial
                res = x
                norm_cross = nn.LayerNorm(dtype=self.dtype, name="cross_norm")
                h = norm_cross(x) if self.normalize_before else x
                cross_out, _ = MultiHeadAttention(
                    self.dim, self.num_heads, self.attention_dropout,
                    dtype=self.dtype, name="s2_attn",
                )(h, s2, s2, s2_bias, deterministic)
                x = res + drop(cross_out, deterministic=deterministic)
                if not self.normalize_before:
                    x = norm_cross(x)

        res = x
        norm_ffn = nn.LayerNorm(dtype=self.dtype, name="ffn_norm")
        h = norm_ffn(x) if self.normalize_before else x
        h = FeedForward(
            self.dim, self.ffn_dim, self.activation, self.dropout,
            self.activation_dropout, self.dtype, name="ffn",
        )(h, deterministic)
        x = res + drop(h, deterministic=deterministic)
        if not self.normalize_before:
            x = norm_ffn(x)
        return x


class TextualEncoder(nn.Module):
    """Text-transformer stage over adapter output, with optional
    intermediate XCTC taps (+PAE curriculum) and CTC-Aug cross-attention
    (reference: s2t_sate.py:349-760)."""

    cfg: SATEConfig

    def setup(self):
        cfg = self.cfg
        a = cfg.acoustic
        dt = a.dtype
        if cfg.textual_encoder_embed_norm:
            self.embed_norm = nn.LayerNorm(dtype=dt, name="embed_norm")
        use_cross = cfg.xctc_cross_attn and cfg.cross_attn_start_layer > 0
        layers = []
        for i in range(cfg.text_encoder_layers):
            if use_cross and (i + 1) >= cfg.cross_attn_start_layer:
                layers.append(CrossStreamTextLayer(
                    a.encoder_embed_dim, cfg.text_ffn_embed_dim,
                    cfg.text_attention_heads, a.dropout, a.attention_dropout,
                    a.activation_dropout, a.activation_fn,
                    a.encoder_normalize_before,
                    collaboration_mode=cfg.cross_attn_collaboration_mode,
                    drop_net=cfg.cross_attn_league_drop_net,
                    drop_net_prob=cfg.cross_attn_league_drop_net_prob,
                    dtype=dt, name=f"layer{i}",
                ))
            else:
                layers.append(S2TEncoderLayer(
                    a.encoder_embed_dim, cfg.text_ffn_embed_dim,
                    cfg.text_attention_heads, a.dropout, a.attention_dropout,
                    a.activation_dropout, a.activation_fn,
                    a.encoder_normalize_before,
                    cfg.text_attention_type, dtype=dt, name=f"layer{i}",
                ))
        self.layers = layers
        if use_cross:
            self.attn_norm = nn.LayerNorm(dtype=dt, name="cross_attn_norm")
        if a.encoder_normalize_before:
            self.final_norm = nn.LayerNorm(dtype=dt, name="final_norm")
        use_xctc = cfg.text_use_xctc or cfg.inter_xctc_layers
        if use_xctc:
            self.xctc_head = CTCHead(a.vocab_size, a.dropout, dtype=dt, name="xctc_head")
        if cfg.inter_xctc_layers:
            if not cfg.share_inter_xctc_norm:
                self.inter_xctc_norms = {
                    str(l): nn.LayerNorm(dtype=dt, name=f"inter_xctc_norm{l}")
                    for l in cfg.inter_xctc_layers
                }
            if cfg.xctc_pae != "none":
                self.xpae = Adapter(
                    a.encoder_embed_dim, a.vocab_size, cfg.xctc_pae,
                    cfg.adapter_temperature, dtype=dt, name="xpae",
                )
        self.drop = _FastDropout(a.dropout)

    def _oracle_probs(self, logits, lengths, tokens, token_lengths):
        """Ground-truth curriculum for the XCTC PAE (shared impl:
        modules/adapter.py ctc_oracle_probs — this copy had drifted and
        dropped the adapter-temperature division, code-review r3)."""
        from s2t_tpu.modules.adapter import ctc_oracle_probs

        cfg = self.cfg
        return ctc_oracle_probs(
            self.make_rng("dropout"), logits, lengths, tokens, token_lengths,
            cfg.xctc_pae_ground_truth_ratio,
            temperature=cfg.adapter_temperature,
            smooth=cfg.pae_oracle_smooth,
            only_mistake=cfg.xctc_pae_ground_truth_only_mistake,
        )

    def __call__(self, x, lengths, deterministic: bool = True,
                 target=None, target_lengths=None):
        cfg = self.cfg
        a = cfg.acoustic
        T = x.shape[1]
        if cfg.textual_encoder_embed_norm:
            x = self.embed_norm(x)
        if not cfg.textual_encoder_no_scale_embedding:
            x = x * jnp.sqrt(a.encoder_embed_dim).astype(x.dtype)
        pos_emb = None
        if not cfg.text_no_pos_emb:
            if cfg.text_attention_type == "rel_pos":
                pos_emb = relative_encoding(T, a.encoder_embed_dim, x.dtype)
            else:
                # fairseq pad-aware table (valid frame i → position pad+1+i;
                # reference: s2t_sate.py:375-377 PositionalEmbedding)
                x = x + fairseq_sinusoidal_encoding(
                    T, a.encoder_embed_dim, a.pad_id, x.dtype
                )[None]
            x = self.drop(x, deterministic=deterministic)
        valid = lengths_to_mask(lengths, T)
        bias = padding_bias(valid, x.dtype)
        use_cross = cfg.xctc_cross_attn and cfg.cross_attn_start_layer > 0
        attn_x = None
        inter_xctc_logits = []
        for i, layer in enumerate(self.layers):
            if isinstance(layer, CrossStreamTextLayer):
                x = layer(x, bias, attn_x, bias, deterministic)
            else:
                x = layer(x, valid, bias, pos_emb, deterministic)
            layer_idx = i + 1
            if use_cross and layer_idx == cfg.cross_attn_layer:
                attn_x = self.attn_norm(x)
            if layer_idx in cfg.inter_xctc_layers and layer_idx != cfg.text_encoder_layers:
                if cfg.share_inter_xctc_norm:
                    h = self.final_norm(x)
                else:
                    h = self.inter_xctc_norms[str(layer_idx)](x)
                xlogits = self.xctc_head(h, deterministic)
                inter_xctc_logits.append((layer_idx, xlogits))
                if cfg.xctc_pae != "none":
                    probs = None
                    if (
                        cfg.xctc_pae_ground_truth_ratio > 0
                        and not deterministic
                        and target is not None
                    ):
                        probs = self._oracle_probs(
                            xlogits, lengths, target, target_lengths
                        )
                    pae_in = x if cfg.pae_unnorm_input else h
                    x = self.xpae(pae_in, xlogits, deterministic=deterministic,
                                  probs=probs)
        if a.encoder_normalize_before:
            x = self.final_norm(x)
        xctc = None
        if cfg.text_use_xctc or cfg.inter_xctc_layers:
            xctc = self.xctc_head(x, deterministic)
        return x, xctc, tuple(inter_xctc_logits)


class S2TSATEEncoder(nn.Module):
    cfg: SATEConfig

    def setup(self):
        a = self.cfg.acoustic
        if self.cfg.acoustic_encoder == "pds":
            from s2t_tpu.models.pds import PDSEncoder

            p = self.cfg.pds
            assert p is not None, "acoustic_encoder=pds needs a pds config"
            assert p.pds_embed_dims[-1] == a.encoder_embed_dim, (
                "PDS final stage dim must equal acoustic.encoder_embed_dim"
            )
            self.acoustic_enc = PDSEncoder(p, name="acoustic")
        else:
            self.acoustic_enc = S2TTransformerEncoder(a, name="acoustic")
        if self.cfg.adapter_type not in ("none", "shrink"):
            self.adapter = Adapter(
                a.encoder_embed_dim, a.ctc_vocab_size, self.cfg.adapter_type,
                self.cfg.adapter_temperature, dtype=a.dtype, name="adapter",
            )
        self.textual_enc = TextualEncoder(self.cfg, name="textual")

    def __call__(self, features, lengths, deterministic: bool = True,
                 transcript=None, transcript_lengths=None,
                 target=None, target_lengths=None):
        cfg = self.cfg
        if cfg.acoustic_encoder == "pds":
            enc = self.acoustic_enc(features, lengths, deterministic)
        else:
            enc = self.acoustic_enc(
                features, lengths, deterministic, transcript, transcript_lengths
            )
        x = enc["encoder_out"]
        enc_lengths = enc["encoder_lengths"]
        if cfg.freeze_acoustic_encoder:
            x = jax.lax.stop_gradient(x)
        ctc_logits = enc["ctc_logits"]
        if cfg.adapter_type == "shrink":
            # collapse CTC-repeat/blank frames (static-shape segment matmul,
            # reference: CTCCompressStrategy adapter.py:14-78)
            W, new_lengths = ctc_shrink_matrix(
                ctc_logits, enc_lengths, blank_id=0,
                strategy=cfg.adapter_shrink_strategy,
            )
            x = jnp.einsum("bst,btd->bsd", W.astype(x.dtype), x)
            enc_lengths = new_lengths
        elif cfg.adapter_type != "none":
            x = self.adapter(x, ctc_logits, deterministic=deterministic)
        x, xctc_logits, inter_xctc_logits = self.textual_enc(
            x, enc_lengths, deterministic, target, target_lengths
        )
        if cfg.freeze_textual_encoder:
            x = jax.lax.stop_gradient(x)
        return {
            **enc,
            "encoder_out": x,
            "encoder_lengths": enc_lengths,
            "xctc_logits": xctc_logits,
            "inter_xctc_logits": inter_xctc_logits,
        }


@register_model("s2t_sate")
class S2TSATEModel(nn.Module):
    cfg: SATEConfig

    def setup(self):
        a = self.cfg.acoustic
        self.encoder = S2TSATEEncoder(self.cfg, name="encoder")
        self.decoder = TransformerDecoder(
            vocab_size=a.vocab_size, embed_dim=a.decoder_embed_dim,
            ffn_dim=a.decoder_ffn_embed_dim, num_layers=a.decoder_layers,
            num_heads=a.decoder_attention_heads, dropout=a.dropout,
            attention_dropout=a.attention_dropout,
            activation_dropout=a.activation_dropout, activation=a.activation_fn,
            normalize_before=a.decoder_normalize_before,
            share_input_output_embed=a.share_decoder_input_output_embed,
            learned_pos=a.decoder_learned_pos,
            max_positions=a.max_target_positions, pad_id=a.pad_id,
            dtype=a.dtype, name="decoder",
        )

    def __call__(self, features, feat_lengths, prev_tokens, deterministic=True,
                 transcript=None, transcript_lengths=None,
                 target=None, target_lengths=None):
        enc = self.encoder(
            features, feat_lengths, deterministic,
            transcript, transcript_lengths, target, target_lengths,
        )
        enc_mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self.decoder(prev_tokens, enc["encoder_out"], enc_mask, deterministic)
        return {"decoder_logits": logits, **enc}

    def encode(self, features, feat_lengths, deterministic: bool = True):
        return self.encoder(features, feat_lengths, deterministic)

    def decode(self, prev_tokens, encoder_out, encoder_valid_mask):
        return self.decoder(prev_tokens, encoder_out, encoder_valid_mask, True)

    def decode_step(self, tokens, cache, index, encoder_out, encoder_valid_mask,
                    cross_kv=None):
        return self.decoder.step(tokens, cache, index, encoder_out,
                                 encoder_valid_mask, cross_kv=cross_kv)

    def precompute_cross(self, encoder_out):
        return self.decoder.precompute_cross(encoder_out)

    def init_cache(self, batch_size: int, max_len: int, kv_int8: bool = False):
        return self.decoder.init_cache(batch_size, max_len, kv_int8=kv_int8)


@register_model_architecture("s2t_sate", "s2t_sate")
@register_model_architecture("s2t_sate", "s2t_sate_s")
def s2t_sate_s(**kw) -> SATEConfig:
    # "acoustic_encoder" selects the encoder FAMILY (SATEConfig field) and
    # must not be prefix-routed into the acoustic transformer config
    enc_family = kw.pop("acoustic_encoder", "transformer")
    acoustic_kw = {
        k[len("acoustic_"):]: v for k, v in kw.items() if k.startswith("acoustic_")
    }
    rest = {k: v for k, v in kw.items() if not k.startswith("acoustic_")}
    rest["acoustic_encoder"] = enc_family
    # task-level ctx keys route into the acoustic config
    for key in (
        "vocab_size", "src_vocab_size", "input_feat_per_channel",
        "input_channels", "max_source_positions", "max_target_positions",
    ):
        if key in rest:
            acoustic_kw[key] = rest.pop(key)
    acoustic_kw.setdefault("inter_ctc_layers", ())
    pds_kw = {k: v for k, v in rest.items() if k.startswith("pds_")}
    for k in pds_kw:
        rest.pop(k)
    acoustic = s2t_transformer_s(**acoustic_kw)
    pds_cfg = None
    if rest.get("acoustic_encoder") == "pds":
        from s2t_tpu.models.pds import PDSConfig

        # the PDS stages inherit the shared/context dims from the acoustic
        # config (vocab, features, dtype); stage plan comes from pds_* keys
        pds_cfg = PDSConfig(
            vocab_size=acoustic.vocab_size,
            src_vocab_size=acoustic.src_vocab_size,
            input_feat_per_channel=acoustic.input_feat_per_channel,
            input_channels=acoustic.input_channels,
            max_source_positions=acoustic.max_source_positions,
            max_target_positions=acoustic.max_target_positions,
            encoder_embed_dim=acoustic.encoder_embed_dim,
            dropout=acoustic.dropout,
            attention_dropout=acoustic.attention_dropout,
            activation_dropout=acoustic.activation_dropout,
            activation_fn=acoustic.activation_fn,
            dtype_str=acoustic.dtype_str,
        ).replace(**pds_kw)
    return SATEConfig(acoustic=acoustic, pds=pds_cfg).replace(**rest)

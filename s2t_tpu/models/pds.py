"""PDS — Progressive Down-Sampling encoder (ACL'23).

(reference: fairseq/models/speech_to_text/pdss2t_transformer.py:53-1723 —
encoder split into stages; each stage = strided-conv Downsampling →
positional embed → N transformer layers → optional per-stage CTC + PAE;
multi-scale fusion of stage outputs into the final representation; arch
presets pdss2t_transformer_{s,sd,m,l}_{4,8,16,32}.)

Reference-exact semantics (validated by tests/test_fairseq_parity.py):
  * input padded to a multiple of prod(ratios) before stage 0
    (pdss2t_transformer.py:1049-1055)
  * Downsampling: conv(k, stride=ratio, pad=(k-1)//2) → LayerNorm; ratio 0 is
    identity, ratio 1 still applies the conv, ratio -1 delegates to the
    shared conv subsampling module (:534-548)
  * per-stage abs positions use the fairseq pad-aware sinusoidal table; no
    embed_scale is ever applied (constructed at :529 but unused in forward —
    a reference quirk kept for parity)
  * per-stage CTC taps: ctc_norm{i} → (shared) CTC head → PAE re-injection
    with the NORMED features by default (pae_unnorm_input flips it, :1160-1172)
  * the top CTC head's projection is tied to the inter head when shapes
    match (:860-868)
  * stage-growth via pds_conv_strides: the last layer of a stage carries a
    strided/expanding conv module (EffecientConformer; pds_layer.py:96-120)
  * fusion: per-stage pre-norm → conv(k=s=remaining_ratio)+BN+ReLU →
    post-norm, weighted sum (:585-622, :1186-1232).  BatchNorm here (and in
    conv modules) is a frozen per-channel affine on TPU — exact at
    inference with folded running stats, frozen-BN semantics in training.

TPU notes: every stage shrinks T, so deeper stages run on shorter
sequences — attention cost drops geometrically while dims stay MXU-aligned.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.modules.adapter import Adapter
from s2t_tpu.modules.attention import padding_bias
from s2t_tpu.modules.ctc_head import CTCHead
from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.modules.positional import (
    fairseq_sinusoidal_encoding,
    relative_encoding,
)
from s2t_tpu.modules.subsampling import Conv1dSubsampling, Conv2dSubsampling
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class PDSConfig:
    # input
    input_feat_per_channel: int = 80
    input_channels: int = 1
    # stages (reference defaults: set_pds_base_16, pdss2t_transformer.py:1504)
    pds_stages: int = 4
    pds_ratios: Tuple[int, ...] = (2, 2, 2, 2)  # -1 = subsampler, 0 = none
    pds_layers: Tuple[int, ...] = (2, 2, 6, 2)
    pds_kernel_sizes: Tuple[int, ...] = (5, 5, 5, 5)
    pds_embed_dims: Tuple[int, ...] = (256, 256, 256, 256)
    pds_attn_heads: Tuple[int, ...] = (4, 4, 4, 4)
    pds_ffn_ratios: Tuple[int, ...] = (8, 8, 8, 8)
    pds_position_embed: Tuple[int, ...] = (1, 1, 1, 1)
    pds_ctc: Tuple[int, ...] = ()  # per-stage inter-CTC flags
    pds_xctc: Tuple[int, ...] = ()  # per-stage target-language CTC flags
    pds_embed_norm: bool = True
    pds_ds_method: str = "conv"
    # strided conv module in the LAST layer of each stage; dims grow to the
    # next stage's embed dim (EffecientConformer, reference pds_layer.py)
    pds_conv_strides: Tuple[int, ...] = ()
    # per-stage conformer conv kernel override
    pds_cnn_kernel_sizes: Tuple[int, ...] = ()
    # stage dropout for stages > 0 (reference pds_dropout); <0 → dropout
    pds_dropout: float = -1.0
    # fusion
    pds_fusion: bool = False
    pds_fusion_method: str = "all_conv"
    pds_fusion_layers: Tuple[int, ...] = ()  # per-stage include flags
    pds_fusion_weight: Tuple[float, ...] = ()  # fixed weights; () = learned
    pds_final_layers: int = 0
    # subsampler used when pds_ratios[0] == -1 (reference :534-536)
    subsampling_type: str = "conv1d"
    subsampling_layers: int = 2
    subsampling_filter: int = 1024
    subsampling_kernel: int = 5
    subsampling_stride: int = 2
    subsampling_norm: str = "none"
    subsampling_activation: str = "glu"
    subsampling_ref_pad_semantics: bool = True
    # encoder globals
    encoder_embed_dim: int = 256  # == last stage dim
    encoder_attention_type: str = "abs"
    encoder_normalize_before: bool = True
    activation_fn: str = "relu"
    encoder_activation_fn: str = ""  # "" = activation_fn
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    macaron_style: bool = False
    use_cnn_module: bool = False
    cnn_module_kernel: int = 31
    cnn_module_norm: str = "layer_norm"  # "batch_norm" = frozen affine
    conv_module_bias: bool = False
    # CTC / PAE
    use_ctc: bool = True
    ctc_layer: int = 0  # global layer index of the main CTC tap; 0 = top
    use_xctc: bool = False
    xctc_layer: int = 0
    ctc_pae: str = "none"
    xctc_pae: str = "none"
    pae_ctc_temperature: float = 1.0
    pae_unnorm_input: bool = False
    pae_embed_norm: bool = False
    pae_out_norm: bool = False
    share_inter_ctc: bool = True
    # decoder
    decoder_embed_dim: int = 256
    decoder_ffn_embed_dim: int = 2048
    decoder_layers: int = 6
    decoder_attention_heads: int = 4
    decoder_normalize_before: bool = True
    decoder_learned_pos: bool = False
    share_decoder_input_output_embed: bool = True
    # sizes
    vocab_size: int = 1000
    src_vocab_size: int = -1
    max_source_positions: int = 6000
    max_target_positions: int = 1024
    pad_id: int = 1
    dtype_str: str = "float32"
    # kept for API parity with S2TTransformerConfig consumers
    compat_subsampling_layers: int = 0

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def enc_act(self):
        return self.encoder_activation_fn or self.activation_fn

    @property
    def ctc_vocab_size(self):
        return self.src_vocab_size if self.src_vocab_size > 0 else self.vocab_size

    @property
    def downsample_ratio(self):
        """Exact end-to-end T reduction, used by generators to size caches."""
        return self.total_ratio

    @property
    def total_ratio(self):
        r = 1
        for i, x in enumerate(self.pds_ratios):
            if x == -1:
                # the shared subsampler downsamples by stride**layers
                r *= self.subsampling_stride ** self.subsampling_layers
            else:
                r *= max(x, 1)
        for s in self.pds_conv_strides:
            r *= max(s, 1)
        return r

    @property
    def pad_multiple(self) -> int:
        """T must divide by prod(conv ratios) before stage 0
        (reference :1049-1055: reduce(max(1,a)*max(1,b), ratios))."""
        r = 1
        for x in self.pds_ratios:
            r *= max(1, x)
        return r

    def stage_conv_stride(self, i: int) -> int:
        if not self.pds_conv_strides:
            return 1
        return max(1, self.pds_conv_strides[i])

    def stage_expand_dim(self, i: int) -> int:
        """Output dim of stage i's last layer (reference :487-500)."""
        if self.stage_conv_stride(i) != 1:
            if i == self.pds_stages - 1:
                return self.pds_embed_dims[i]
            return self.pds_embed_dims[i + 1]
        return self.pds_embed_dims[i]

    def stage_cnn_kernel(self, i: int) -> int:
        if self.pds_cnn_kernel_sizes:
            return self.pds_cnn_kernel_sizes[i]
        return self.cnn_module_kernel

    @property
    def fusion_stages(self) -> Tuple[int, ...]:
        """Stage indices participating in fusion (reference :379-391)."""
        if not self.pds_fusion or self.pds_fusion_method in ("none", ""):
            return ()
        method = self.pds_fusion_method.split("_")[0]
        flags = self.pds_fusion_layers or tuple(1 for _ in range(self.pds_stages))
        idx = []
        for i in range(self.pds_stages):
            if not flags[i]:
                continue
            if method == "all" or (
                method == "same"
                and self.stage_expand_dim(i) == self.encoder_embed_dim
            ):
                idx.append(i)
        return tuple(idx) if len(idx) > 1 else ()

    @property
    def fusion_transform(self) -> str:
        parts = self.pds_fusion_method.split("_")
        return parts[1] if len(parts) == 2 else "conv"


class Downsampling(nn.Module):
    """Strided-conv stage downsampler (reference: pdss2t_transformer.py:53-146).

    stride 0 = identity; stride 1 still applies the conv (the reference only
    skips when stride == 0)."""

    out_dim: int
    kernel_size: int = 5
    stride: int = 2
    embed_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        if self.stride == 0:
            return x, lengths
        mask = lengths_to_mask(lengths, x.shape[1])[..., None]
        x = jnp.where(mask, x, 0.0)
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.out_dim, (self.kernel_size,), strides=(max(self.stride, 1),),
            padding=[(pad, pad)], dtype=self.dtype, name="conv",
        )(x)
        if self.stride > 1:
            lengths = (lengths - 1) // self.stride + 1
        if self.embed_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        mask = lengths_to_mask(lengths, x.shape[1])[..., None]
        return jnp.where(mask, x, 0.0), lengths


class _FusionBlock(nn.Module):
    """Pre-norm → conv(k=s=ratio)+frozen-BN+ReLU → post-norm
    (reference fusion_downsampling, pdss2t_transformer.py:600-612)."""

    in_dim: int
    out_dim: int
    ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(dtype=self.dtype, name="pre_norm")(x)
        x = nn.Conv(
            self.out_dim, (self.ratio,), strides=(self.ratio,),
            padding="VALID", dtype=self.dtype, name="conv",
        )(x)
        scale = self.param("norm_scale", nn.initializers.ones, (self.out_dim,))
        shift = self.param("norm_bias", nn.initializers.zeros, (self.out_dim,))
        x = x * scale.astype(x.dtype) + shift.astype(x.dtype)
        x = nn.relu(x)
        return nn.LayerNorm(dtype=self.dtype, name="post_norm")(x)


class PDSEncoder(nn.Module):
    cfg: PDSConfig

    def _make_layer(self, i: int, j: int, dt):
        cfg = self.cfg
        last = j == cfg.pds_layers[i] - 1
        stride = cfg.stage_conv_stride(i) if last else 1
        expand = cfg.stage_expand_dim(i) if last else cfg.pds_embed_dims[i]
        return S2TEncoderLayer(
            cfg.pds_embed_dims[i],
            expand * cfg.pds_ffn_ratios[i],
            cfg.pds_attn_heads[i], cfg.dropout, cfg.attention_dropout,
            cfg.activation_dropout, cfg.enc_act,
            cfg.encoder_normalize_before, cfg.encoder_attention_type,
            cfg.macaron_style, cfg.use_cnn_module, cfg.stage_cnn_kernel(i),
            dt,
            # the PDS layer builds its conv module with the ENCODER
            # activation (pds_layer.py:66,103), unlike the plain s2t layer
            # which uses activation_fn (s2t_transformer_layer.py:124)
            conv_activation=cfg.enc_act,
            conv_norm_type=cfg.cnn_module_norm,
            conv_bias=cfg.conv_module_bias,
            conv_expand_dim=expand if expand != cfg.pds_embed_dims[i] else 0,
            conv_stride=stride,
            macaron_ffn_dim=cfg.pds_embed_dims[i] * cfg.pds_ffn_ratios[i],
            name=f"stage{i}_layer{j}",
        )

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        n = cfg.pds_stages
        if cfg.pds_conv_strides and not cfg.use_cnn_module:
            raise ValueError(
                "pds_conv_strides downsample inside the conv module — "
                "use_cnn_module must be on (reference pds_layer.py:96)"
            )

        downs = []
        for i in range(n):
            ratio = cfg.pds_ratios[i]
            if ratio == -1:
                in_dim = cfg.input_feat_per_channel * cfg.input_channels
                if cfg.subsampling_type == "conv1d":
                    downs.append(Conv1dSubsampling(
                        cfg.subsampling_layers, cfg.subsampling_filter,
                        cfg.pds_embed_dims[i], cfg.subsampling_kernel,
                        cfg.subsampling_stride, cfg.subsampling_norm,
                        cfg.subsampling_activation,
                        not cfg.subsampling_ref_pad_semantics, dt,
                        name=f"ds{i}",
                    ))
                else:
                    downs.append(Conv2dSubsampling(
                        cfg.subsampling_layers, cfg.subsampling_filter,
                        cfg.pds_embed_dims[i], in_dim, cfg.subsampling_kernel,
                        cfg.subsampling_stride, cfg.subsampling_activation,
                        dt, name=f"ds{i}",
                    ))
            else:
                downs.append(Downsampling(
                    cfg.pds_embed_dims[i], cfg.pds_kernel_sizes[i], ratio,
                    cfg.pds_embed_norm, dt, name=f"ds{i}",
                ))
        self.downsamplers = downs

        self.stage_layers = [
            [self._make_layer(i, j, dt) for j in range(cfg.pds_layers[i])]
            for i in range(n)
        ]

        # ---- per-stage CTC taps (reference :645-680) ----------------------
        ctc_flags = cfg.pds_ctc or tuple(0 for _ in range(n))
        tapped = [i for i in range(n) if i < len(ctc_flags) and ctc_flags[i]]
        # sharing is only possible when tap dims agree (reference shares the
        # projection object whenever the shapes match)
        share = cfg.share_inter_ctc and len(
            {cfg.stage_expand_dim(i) for i in tapped} | {cfg.encoder_embed_dim}
        ) == 1
        self._ctc_share = share
        norms, heads, paes = {}, {}, {}
        shared_head = None
        shared_pae = None
        if tapped and cfg.use_ctc:
            if share:
                shared_head = CTCHead(
                    cfg.ctc_vocab_size, cfg.dropout, dtype=dt,
                    name="inter_ctc_head",
                )
            if share and cfg.ctc_pae != "none":
                shared_pae = Adapter(
                    cfg.pds_embed_dims[-1], cfg.ctc_vocab_size, cfg.ctc_pae,
                    cfg.pae_ctc_temperature, cfg.pae_embed_norm,
                    cfg.pae_out_norm, dtype=dt, name="pae",
                )
            for i in tapped:
                norms[str(i)] = nn.LayerNorm(dtype=dt, name=f"ctc_norm{i}")
                heads[str(i)] = shared_head or CTCHead(
                    cfg.ctc_vocab_size, cfg.dropout, dtype=dt,
                    name=f"ctc{i}",
                )
                if cfg.ctc_pae != "none" and i != n - 1:
                    paes[str(i)] = shared_pae or Adapter(
                        cfg.stage_expand_dim(i), cfg.ctc_vocab_size,
                        cfg.ctc_pae, cfg.pae_ctc_temperature,
                        cfg.pae_embed_norm, cfg.pae_out_norm, dtype=dt,
                        name=f"pae{i}",
                    )
        self.ctc_norms, self.inter_heads, self.paes = norms, heads, paes

        # ---- per-stage XCTC taps (reference :684-731) ---------------------
        xctc_flags = cfg.pds_xctc or tuple(0 for _ in range(n))
        xtapped = [i for i in range(n) if i < len(xctc_flags) and xctc_flags[i]]
        xnorms, xheads, xpaes = {}, {}, {}
        shared_xhead = None
        if xtapped:
            shared_xhead = CTCHead(
                cfg.vocab_size, cfg.dropout, dtype=dt, name="inter_xctc_head",
            )
            shared_xpae = (
                Adapter(
                    cfg.pds_embed_dims[-1], cfg.vocab_size, cfg.xctc_pae,
                    cfg.pae_ctc_temperature, cfg.pae_embed_norm,
                    cfg.pae_out_norm, dtype=dt, name="xpae",
                )
                if cfg.xctc_pae != "none" else None
            )
            for i in xtapped:
                xnorms[str(i)] = nn.LayerNorm(dtype=dt, name=f"xctc_norm{i}")
                xheads[str(i)] = shared_xhead
                if shared_xpae is not None and i != n - 1:
                    xpaes[str(i)] = shared_xpae
        self.xctc_norms, self.inter_xheads, self.xpaes = xnorms, xheads, xpaes

        # ---- top CTC/XCTC heads (reference :832-905) ----------------------
        if cfg.use_ctc:
            # tie the top projection to the inter head when dims agree
            if shared_head is not None and cfg.ctc_layer == 0:
                self.ctc_head = shared_head
            else:
                self.ctc_head = CTCHead(
                    cfg.ctc_vocab_size, cfg.dropout,
                    norm=cfg.ctc_layer != 0, dtype=dt, name="ctc_head",
                )
        if cfg.use_xctc:
            if shared_xhead is not None and cfg.xctc_layer == 0:
                self.xctc_head = shared_xhead
            else:
                self.xctc_head = CTCHead(
                    cfg.vocab_size, cfg.dropout,
                    norm=cfg.xctc_layer != 0, dtype=dt, name="xctc_head",
                )

        # ---- fusion (reference :585-622) ----------------------------------
        fusion = cfg.fusion_stages
        if fusion:
            if cfg.fusion_transform != "conv":
                raise NotImplementedError(
                    f"fusion transform {cfg.fusion_transform!r}: only 'conv' "
                    "is implemented (the reference's conv2/conv3/pool "
                    "variants appear in no recipe that enables fusion)"
                )
            blocks = {}
            for i in fusion:
                ratio = 1
                for v in cfg.pds_ratios[i + 1:]:
                    ratio *= max(v, 1)
                for s in (cfg.pds_conv_strides or ())[i + 1:]:
                    ratio *= max(s, 1)
                blocks[str(i)] = _FusionBlock(
                    cfg.stage_expand_dim(i), cfg.encoder_embed_dim, ratio,
                    dt, name=f"fusion{i}",
                )
            self.fusion_blocks = blocks
            if not cfg.pds_fusion_weight:
                self.fusion_weight = self.param(
                    "fusion_weight",
                    nn.initializers.constant(1.0 / len(fusion)),
                    (len(fusion),),
                )
            else:
                self.fusion_weight = None

        if cfg.pds_final_layers > 0:
            self.final_layers = [
                S2TEncoderLayer(
                    cfg.encoder_embed_dim,
                    cfg.encoder_embed_dim * cfg.pds_ffn_ratios[-1],
                    cfg.pds_attn_heads[-1], cfg.dropout, cfg.attention_dropout,
                    cfg.activation_dropout, cfg.enc_act,
                    cfg.encoder_normalize_before, cfg.encoder_attention_type,
                    cfg.macaron_style, cfg.use_cnn_module,
                    cfg.stage_cnn_kernel(cfg.pds_stages - 1), dt,
                    conv_activation=cfg.activation_fn,
                    conv_norm_type=cfg.cnn_module_norm,
                    conv_bias=cfg.conv_module_bias,
                    name=f"final_layer{j}",
                )
                for j in range(cfg.pds_final_layers)
            ]
        else:
            self.final_layers = []

        if cfg.encoder_normalize_before:
            self.final_norm = nn.LayerNorm(dtype=dt, name="final_norm")
        self.drop = _FastDropout(cfg.dropout)
        self.pds_drop = _FastDropout(
            cfg.dropout if cfg.pds_dropout < 0 else cfg.pds_dropout
        )

    def _positions(self, x, i_dim):
        cfg = self.cfg
        T = x.shape[1]
        if cfg.encoder_attention_type == "rel_pos":
            return x, relative_encoding(T, i_dim, x.dtype)
        if cfg.encoder_attention_type == "rope":
            return x, None
        # fairseq pad-aware sinusoidal table (valid frame i → pos pad+1+i)
        pe = fairseq_sinusoidal_encoding(T, i_dim, cfg.pad_id, x.dtype)
        return x + pe[None], None

    def __call__(self, features, lengths, deterministic: bool = True):
        cfg = self.cfg
        x = features.astype(cfg.dtype)
        # pad T to a multiple of the stage-ratio product (reference
        # :1049-1055) so every stage conv sees a divisible length
        mult = cfg.pad_multiple
        if mult > 1 and x.shape[1] % mult:
            pad_t = mult - x.shape[1] % mult
            x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))

        inter_ctc_logits = []
        inter_xctc_logits = []
        ctc_logit = None
        xctc_logit = None
        stage_outs = []
        stage_lens = []
        layer_idx = 0
        for i in range(cfg.pds_stages):
            x, lengths = self.downsamplers[i](x, lengths)
            dim_i = cfg.pds_embed_dims[i]
            if cfg.pds_position_embed[i]:
                x, pos_emb = self._positions(x, dim_i)
            else:
                pos_emb = None
            x = (self.drop if i == 0 else self.pds_drop)(
                x, deterministic=deterministic
            )
            valid = lengths_to_mask(lengths, x.shape[1])
            bias = padding_bias(valid, x.dtype)
            n_layers = cfg.pds_layers[i]
            for j, layer in enumerate(self.stage_layers[i]):
                x = layer(x, valid, bias, pos_emb, deterministic)
                layer_idx += 1
                if j == n_layers - 1 and cfg.stage_conv_stride(i) > 1:
                    s = cfg.stage_conv_stride(i)
                    lengths = (lengths - 1) // s + 1
                    valid = lengths_to_mask(lengths, x.shape[1])
                    bias = padding_bias(valid, x.dtype)
                # global-layer CTC taps (reference :1147-1152; the head
                # carries its own LayerNorm in the inter case)
                if cfg.use_ctc and cfg.ctc_layer == layer_idx:
                    ctc_logit = self.ctc_head(x, deterministic)
                if cfg.use_xctc and cfg.xctc_layer == layer_idx:
                    xctc_logit = self.xctc_head(x, deterministic)

            stage_outs.append(x)
            stage_lens.append(lengths)

            # per-stage CTC tap + PAE (reference :1160-1172)
            key = str(i)
            if cfg.use_ctc and key in self.ctc_norms:
                norm_x = self.ctc_norms[key](x)
                logits = self.inter_heads[key](norm_x, deterministic)
                inter_ctc_logits.append((layer_idx, logits, lengths))
                if key in self.paes:
                    pae_in = x if cfg.pae_unnorm_input else norm_x
                    x = self.paes[key](
                        pae_in, logits, deterministic=deterministic
                    )
            if key in self.xctc_norms:
                norm_x = self.xctc_norms[key](x)
                logits = self.inter_xheads[key](norm_x, deterministic)
                inter_xctc_logits.append((layer_idx, logits, lengths))
                if key in self.xpaes:
                    pae_in = x if cfg.pae_unnorm_input else norm_x
                    x = self.xpaes[key](
                        pae_in, logits, deterministic=deterministic
                    )

        fusion = cfg.fusion_stages
        if fusion:
            Tf = x.shape[1]
            if cfg.pds_fusion_weight:
                weights = jnp.asarray(cfg.pds_fusion_weight, x.dtype)
            else:
                weights = self.fusion_weight.astype(x.dtype)
            fused = jnp.zeros_like(x)
            for k, i in enumerate(fusion):
                # always zero padded frames before the strided fusion conv
                # (== the reference's pds_fusion_mask=True; its default False
                # lets pad garbage leak into the last valid window)
                sm = lengths_to_mask(stage_lens[i], stage_outs[i].shape[1])
                y = self.fusion_blocks[str(i)](
                    jnp.where(sm[..., None], stage_outs[i], 0.0)
                )
                if y.shape[1] >= Tf:
                    y = y[:, :Tf]
                else:
                    y = jnp.pad(y, ((0, 0), (0, Tf - y.shape[1]), (0, 0)))
                fused = fused + weights[k] * y
            x = fused

        if self.final_layers:
            x, pos_emb = self._positions(x, cfg.encoder_embed_dim)
            x = self.pds_drop(x, deterministic=deterministic)
            valid = lengths_to_mask(lengths, x.shape[1])
            bias = padding_bias(valid, x.dtype)
            for layer in self.final_layers:
                x = layer(x, valid, bias, pos_emb, deterministic)

        if cfg.encoder_normalize_before:
            x = self.final_norm(x)
        if cfg.use_ctc and ctc_logit is None:
            ctc_logit = self.ctc_head(x, deterministic)
        if cfg.use_xctc and xctc_logit is None:
            xctc_logit = self.xctc_head(x, deterministic)
        return {
            "encoder_out": x,
            "encoder_lengths": lengths,
            "ctc_logits": ctc_logit,
            "inter_ctc_logits": tuple(inter_ctc_logits),
            "xctc_logits": xctc_logit,
            "inter_xctc_logits": tuple(inter_xctc_logits),
        }


@register_model("pdss2t_transformer")
class PDSS2TTransformerModel(nn.Module):
    """PDS encoder + transformer decoder (reference: pdss2t_transformer.py:147)."""

    cfg: PDSConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = PDSEncoder(cfg, name="encoder")
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size, embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim, num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads, dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout,
            activation_dropout=cfg.activation_dropout,
            activation=cfg.activation_fn,
            normalize_before=cfg.decoder_normalize_before,
            share_input_output_embed=cfg.share_decoder_input_output_embed,
            learned_pos=cfg.decoder_learned_pos,
            max_positions=cfg.max_target_positions, pad_id=cfg.pad_id,
            dtype=cfg.dtype, name="decoder",
        )

    def __call__(self, features, feat_lengths, prev_tokens, deterministic=True):
        enc = self.encoder(features, feat_lengths, deterministic)
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

    def init_cache(self, batch_size: int, max_len: int):
        return self.decoder.init_cache(batch_size, max_len)


def _pds_preset(stages, ratios, layers, kernels, dims, heads, ffn_ratios, **kw):
    # the last stage dim is the encoder width; when the caller overrides the
    # stage plan, the global dims follow it unless set explicitly
    dims = tuple(kw.get("pds_embed_dims", dims))
    kw.setdefault("encoder_embed_dim", dims[-1])
    kw.setdefault("decoder_embed_dim", dims[-1])
    kw.setdefault("decoder_ffn_embed_dim", dims[-1] * 8)
    cfg = PDSConfig(
        pds_stages=stages, pds_ratios=ratios, pds_layers=layers,
        pds_kernel_sizes=kernels, pds_embed_dims=dims, pds_attn_heads=heads,
        pds_ffn_ratios=ffn_ratios,
        pds_position_embed=tuple(1 for _ in range(stages)),
        pds_ctc=tuple(0 for _ in range(stages)),
    )
    return cfg.replace(**kw)


# reference presets: pdss2t_transformer.py:1544-1723 (set_pds_base_* stage
# plans at :1439-1536)
@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_s")
@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_s_16")
def pdss2t_transformer_s_16(**kw) -> PDSConfig:
    return _pds_preset(
        4, (2, 2, 2, 2), (2, 2, 6, 2), (5, 5, 5, 5),
        (256, 256, 256, 256), (4, 4, 4, 4), (8, 8, 8, 8), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_s_4")
def pdss2t_transformer_s_4(**kw) -> PDSConfig:
    return _pds_preset(
        3, (2, 2, 1), (4, 4, 4), (5, 5, 5),
        (256, 256, 256), (4, 4, 4), (8, 8, 8), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_s_8")
def pdss2t_transformer_s_8(**kw) -> PDSConfig:
    return _pds_preset(
        4, (2, 2, 1, 2), (3, 3, 3, 3), (5, 5, 5, 5),
        (256, 256, 256, 256), (4, 4, 4, 4), (8, 8, 8, 8), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_s_32")
def pdss2t_transformer_s_32(**kw) -> PDSConfig:
    return _pds_preset(
        5, (2, 2, 2, 2, 2), (2, 2, 3, 3, 2), (5, 5, 5, 5, 5),
        (256, 256, 256, 256, 256), (4, 4, 4, 4, 4), (8, 8, 8, 8, 8), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_sd")
@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_sd_8")
def pdss2t_transformer_sd_8(**kw) -> PDSConfig:
    # deep-and-thin: set_pds_deep_8 layer plan (reference :1600-1614)
    return _pds_preset(
        4, (2, 2, 1, 2), (7, 7, 7, 9), (5, 5, 5, 5),
        (256, 256, 256, 256), (4, 4, 4, 4), (8, 8, 8, 8), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_sd_16")
def pdss2t_transformer_sd_16(**kw) -> PDSConfig:
    return _pds_preset(
        4, (2, 2, 2, 2), (5, 5, 12, 8), (5, 5, 5, 5),
        (256, 256, 256, 256), (4, 4, 4, 4), (8, 8, 8, 8), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_sd_32")
def pdss2t_transformer_sd_32(**kw) -> PDSConfig:
    return _pds_preset(
        5, (2, 2, 2, 2, 2), (5, 5, 7, 7, 6), (5, 5, 5, 5, 5),
        (256, 256, 256, 256, 256), (4, 4, 4, 4, 4), (8, 8, 8, 8, 8), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_m")
@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_m_16")
def pdss2t_transformer_m(**kw) -> PDSConfig:
    return _pds_preset(
        4, (2, 2, 2, 2), (2, 2, 6, 2), (5, 5, 5, 5),
        (512, 512, 512, 512), (8, 8, 8, 8), (4, 4, 4, 4), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_m_8")
def pdss2t_transformer_m_8(**kw) -> PDSConfig:
    return _pds_preset(
        4, (2, 2, 1, 2), (3, 3, 3, 3), (5, 5, 5, 5),
        (512, 512, 512, 512), (8, 8, 8, 8), (4, 4, 4, 4), **kw,
    )


@register_model_architecture("pdss2t_transformer", "pdss2t_transformer_m_32")
def pdss2t_transformer_m_32(**kw) -> PDSConfig:
    return _pds_preset(
        5, (2, 2, 2, 2, 2), (2, 2, 3, 3, 2), (5, 5, 5, 5, 5),
        (512, 512, 512, 512, 512), (8, 8, 8, 8, 8), (4, 4, 4, 4, 4), **kw,
    )

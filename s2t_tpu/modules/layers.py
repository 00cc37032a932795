"""Transformer encoder/decoder layers (optionally Conformer).

(reference: fairseq/modules/s2t_transformer_layer.py:69-322 — pre/post-norm
self-attention with optional macaron FFN and conv module;
fairseq/modules/transformer_layer.py decoder layer.)

All layers are pre-norm by default (the reference recipes set
encoder_normalize_before=true).  Dropout uses the flax "dropout" rng
collection gated by ``deterministic``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.modules.attention import (
    MultiHeadAttention,
    RelPositionMultiHeadAttention,
    padding_bias,
)
from s2t_tpu.modules.subsampling import get_activation
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


class FeedForward(nn.Module):
    dim: int
    ffn_dim: int
    activation: str = "relu"
    dropout: float = 0.0
    activation_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h = get_activation(self.activation)(h)
        h = _FastDropout(self.activation_dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return h


class ConformerConvModule(nn.Module):
    """Conformer convolution module: pointwise → GLU → depthwise → norm →
    act → pointwise (reference: fairseq/modules/convolution.py:8-120).

    ``norm_type="layer_norm"`` (default) is the TPU-native choice: stateless,
    nothing to thread through pjit.  ``norm_type="batch_norm"`` matches the
    reference's BatchNorm1d as a *frozen* per-channel affine — the importer
    folds the running statistics into (scale, bias), which is exact at
    inference and equals fine-tuning with frozen BN statistics in training.

    ``out_dim``/``stride`` support the reference's expand_embed_dim /
    strided depthwise conv (EffecientConformer stages; reference:
    modules/convolution.py stride arg, pds_layer.py conv_stride) — with
    stride > 1 the output is T' = (T-1)//stride + 1 frames and the caller
    must downsample masks/lengths the same way.
    """

    dim: int
    kernel_size: int = 31
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    out_dim: int = 0  # 0 → dim (reference expand_embed_dim)
    stride: int = 1
    norm_type: str = "layer_norm"  # "layer_norm" | "batch_norm" (frozen)
    use_bias: bool = True  # reference conv layers default to bias=False
    activation: str = "swish"

    @nn.compact
    def __call__(self, x, valid_mask, deterministic: bool = True):
        # x: (B, T, D); valid_mask: (B, T) — padded frames zeroed so the
        # depthwise conv never mixes padding into valid frames.
        D = self.out_dim or self.dim
        x = jnp.where(valid_mask[..., None], x, 0.0)
        h = nn.Dense(2 * D, use_bias=self.use_bias, dtype=self.dtype,
                     name="pointwise_conv1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)
        h = jnp.where(valid_mask[..., None], h, 0.0)
        h = nn.Conv(
            features=D,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)],
            feature_group_count=D,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="depthwise_conv",
        )(h)
        if self.norm_type == "batch_norm":
            scale = self.param("norm_scale", nn.initializers.ones, (D,))
            shift = self.param("norm_bias", nn.initializers.zeros, (D,))
            h = h * scale.astype(h.dtype) + shift.astype(h.dtype)
        else:
            h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        h = get_activation(self.activation)(h)
        h = nn.Dense(D, use_bias=self.use_bias, dtype=self.dtype,
                     name="pointwise_conv2")(h)
        if self.stride > 1:
            valid_mask = valid_mask[:, :: self.stride]
            h = jnp.where(valid_mask[..., None], h, 0.0)
        h = _FastDropout(self.dropout)(h, deterministic=deterministic)
        return h


class S2TEncoderLayer(nn.Module):
    """Speech encoder layer: [macaron FFN ·½] → self-attn → [conv module] →
    FFN (·½ if macaron) with pre- or post-norm
    (reference: modules/s2t_transformer_layer.py:69-229)."""

    dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    attention_type: str = "abs"  # abs | rel_pos | rope | relative | light | dynamic
    macaron_style: bool = False
    use_cnn_module: bool = False
    cnn_kernel: int = 31
    dtype: jnp.dtype = jnp.float32
    seq_parallel: bool = False  # ring attention over the mesh "seq" axis
    attention_stride: int = 1  # reduced-KV attention stride
    # Shaw relative attention clip distance when attention_type=="relative"
    max_relative_length: int = 0
    # Gaussian local attention knobs when attention_type=="local"
    # (reference: modules/local_multihead_attention.py)
    gauss_mask_sigma: float = 0.0
    init_mask_weight: float = 0.5
    # kernel width when attention_type is "light"/"dynamic" (reference:
    # s2t_dynamic_transformer.py — conv layers replace self-attention)
    lconv_kernel: int = 15
    # squeeze-excitation channel gate after the FFN (reference:
    # modules/squeeze_excitation.py SEAttention, --squeeze-excitation)
    use_se: bool = False
    # cross-stream "league" collaboration (reference:
    # modules/{transformer_s2_layer,s2t_transformer_s2_layer}.py — the
    # dual/multibranch S2 layers): "none" | "parallel" (self-attn and
    # s2-attn from the same normed input, combined s1·r1 + s2·r2 before the
    # residual) | "serial" (own pre-norm s2 block after the self-attn block)
    collaboration_mode: str = "none"
    league_s1_ratio: float = 0.5
    league_s2_ratio: float = 0.5
    # LayerNorm the incoming s2 stream before attending (the reference's
    # s2_norm, applied when the caller passes s2_need_norm=True —
    # multibranch does, dual does not)
    s2_apply_norm: bool = False
    # conv-module knobs matching the reference layer exactly
    # (reference: modules/convolution.py ConvolutionModule args,
    # modules/pds_layer.py conv_stride/expand_embed_dim)
    conv_activation: str = "swish"
    conv_norm_type: str = "layer_norm"  # "batch_norm" = frozen affine
    conv_bias: bool = True
    conv_expand_dim: int = 0  # 0 → dim; EffecientConformer stage growth
    conv_stride: int = 1  # strided depthwise conv downsampling in-layer
    # macaron FFN hidden width when it differs from ffn_dim (expanding
    # layers: macaron runs at the input dim, the final FFN at the expanded
    # dim — reference pds_layer.py:82-87 vs :125-131); 0 → ffn_dim
    macaron_ffn_dim: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        valid_mask: jnp.ndarray,
        attn_bias: Optional[jnp.ndarray] = None,
        pos_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        s2: Optional[jnp.ndarray] = None,
        s2_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        drop = _FastDropout(self.dropout)
        ffn_scale = 0.5 if self.macaron_style else 1.0

        if self.macaron_style:
            res = x
            norm_macaron = nn.LayerNorm(dtype=self.dtype, name="macaron_norm")
            h = norm_macaron(x) if self.normalize_before else x
            h = FeedForward(
                self.dim, self.macaron_ffn_dim or self.ffn_dim,
                self.activation, self.dropout,
                self.activation_dropout, self.dtype, name="macaron_ffn",
            )(h, deterministic)
            x = res + ffn_scale * drop(h, deterministic=deterministic)
            if not self.normalize_before:
                x = norm_macaron(x)

        res = x
        norm_attn_norm = nn.LayerNorm(dtype=self.dtype, name="attn_norm")
        h = norm_attn_norm(x) if self.normalize_before else x
        if self.attention_type in ("light", "dynamic"):
            from s2t_tpu.modules.lightconv import LightConvBlock

            h, _ = LightConvBlock(
                self.dim, self.dim, self.lconv_kernel, self.num_heads,
                conv_type=("lightweight" if self.attention_type == "light"
                           else "dynamic"),
                weight_dropout=self.attention_dropout, dtype=self.dtype,
                name="self_attn",
            )(h, valid_mask, deterministic)
        elif self.attention_type == "rel_pos":
            if attn_bias is None:
                # the encoder elides a pure-padding bias (the fused-attention
                # path rebuilds it internally); rel_pos attention is dense
                attn_bias = padding_bias(valid_mask, h.dtype)
            h = RelPositionMultiHeadAttention(
                self.dim, self.num_heads, self.attention_dropout, self.dtype,
                name="self_attn",
            )(h, h, h, pos_emb, attn_bias, deterministic)
        else:
            h, _ = MultiHeadAttention(
                self.dim, self.num_heads, self.attention_dropout,
                attention_type=self.attention_type,
                seq_parallel=self.seq_parallel,
                kv_stride=self.attention_stride,
                max_relative_length=self.max_relative_length,
                gauss_mask_sigma=self.gauss_mask_sigma,
                init_mask_weight=self.init_mask_weight, dtype=self.dtype,
                name="self_attn",
            )(h, h, h, attn_bias, deterministic, valid_mask=valid_mask)
        attn_in = norm_attn_norm(res) if self.normalize_before else res
        h = drop(h, deterministic=deterministic)
        if s2 is not None and self.collaboration_mode == "parallel":
            # reference parallel league (transformer_s2_layer.py:300-319 /
            # s2t_transformer_s2_layer.py:377-398): both attentions read the
            # SAME normed input; combine before the single residual add
            s2v = (nn.LayerNorm(dtype=self.dtype, name="s2_norm")(s2)
                   if self.s2_apply_norm else s2)
            h2, _ = MultiHeadAttention(
                self.dim, self.num_heads, self.attention_dropout,
                dtype=self.dtype, name="s2_attn",
            )(attn_in, s2v, s2v, s2_bias, deterministic)
            h2 = drop(h2, deterministic=deterministic)
            h = h * self.league_s1_ratio + h2 * self.league_s2_ratio
            x = res + h
        else:
            x = res + h
            if not self.normalize_before:
                x = norm_attn_norm(x)
            if s2 is not None and self.collaboration_mode == "serial":
                s2v = (nn.LayerNorm(dtype=self.dtype, name="s2_norm")(s2)
                       if self.s2_apply_norm else s2)
                res = x
                h = nn.LayerNorm(dtype=self.dtype, name="s2_attn_norm")(x)
                h, _ = MultiHeadAttention(
                    self.dim, self.num_heads, self.attention_dropout,
                    dtype=self.dtype, name="s2_attn",
                )(h, s2v, s2v, s2_bias, deterministic)
                x = res + drop(h, deterministic=deterministic)

        if self.use_cnn_module:
            expand = self.conv_expand_dim or self.dim
            res = x
            norm_conv = nn.LayerNorm(dtype=self.dtype, name="conv_norm")
            h = norm_conv(x) if self.normalize_before else x
            if self.seq_parallel:
                # batch-only layout around the depthwise conv: conv kernel
                # grads are miscompiled (x idle-mesh-axis-size) when the
                # activations are seq-sharded on a mesh with another >1
                # axis (see parallel/context.conv_grad_guard)
                from s2t_tpu.parallel.context import (
                    constrain, conv_grad_guard, seq_parallel_enabled,
                )

                h = conv_grad_guard(h)
            h = ConformerConvModule(
                self.dim, self.cnn_kernel, self.dropout, self.dtype,
                out_dim=expand, stride=self.conv_stride,
                norm_type=self.conv_norm_type, use_bias=self.conv_bias,
                activation=self.conv_activation, name="conv_module",
            )(h, valid_mask, deterministic)
            if self.seq_parallel and seq_parallel_enabled():
                h = constrain(h, "data", "seq", None)
            # conv residual (reference: pds_layer.py conv_res — 1×1 strided
            # conv when the layer expands dims, plain stride-slice otherwise;
            # the reference adds the conv output with no extra dropout: the
            # module's internal dropout is the only one on this path)
            if expand != self.dim:
                res = nn.Dense(expand, dtype=self.dtype, name="conv_res")(
                    res[:, :: self.conv_stride]
                )
            elif self.conv_stride > 1:
                res = res[:, :: self.conv_stride]
            if self.conv_stride > 1:
                valid_mask = valid_mask[:, :: self.conv_stride]
            x = res + h
            if not self.normalize_before:
                x = norm_conv(x)

        # after an expanding conv module the trailing FFN/norms run at the
        # expanded width (reference: pds_layer.py ffn/ffn_norm/final_norm
        # at expand_embed_dim)
        out_dim = (self.conv_expand_dim or self.dim) if self.use_cnn_module else self.dim
        res = x
        norm_ffn_norm = nn.LayerNorm(dtype=self.dtype, name="ffn_norm")
        h = norm_ffn_norm(x) if self.normalize_before else x
        h = FeedForward(
            out_dim, self.ffn_dim, self.activation, self.dropout,
            self.activation_dropout, self.dtype, name="ffn",
        )(h, deterministic)
        x = res + ffn_scale * drop(h, deterministic=deterministic)
        if not self.normalize_before:
            x = norm_ffn_norm(x)

        if self.use_se:
            m = valid_mask[..., None].astype(x.dtype)
            pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
            g = nn.Dense(max(self.dim // 16, 1), use_bias=False,
                         dtype=self.dtype, name="se_fc1")(pooled)
            g = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name="se_fc2")(nn.relu(g))
            x = x * nn.sigmoid(g)[:, None, :]

        if self.use_cnn_module:
            x = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return x


class TransformerDecoderLayer(nn.Module):
    """Pre-norm decoder layer: causal self-attn (cacheable) → cross-attn → FFN
    (reference: fairseq/modules/transformer_layer.py TransformerDecoderLayer)."""

    dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32
    has_cross_attention: bool = True
    # "abs" or "relative" (Shaw) self-attention; reference preset
    # s2t_transformer_s_relative sets max_decoder_relative_length=20
    self_attn_type: str = "abs"
    max_relative_length: int = 0
    # second-stream cross-attention league (reference:
    # transformer_s2_layer.py TransformerS2DecoderLayer:630-714): "none" |
    # "parallel" (both cross-attentions from the same normed input, league
    # s1·r1 + s2·r2 before the residual) | "serial" (own pre-norm s2 block)
    collaboration_mode: str = "none"
    league_s1_ratio: float = 0.5
    league_s2_ratio: float = 0.5

    def setup(self):
        # setup-style (not @compact) so cross_kv() can reuse the
        # cross-attention projections outside __call__; param names match
        # the previous compact layout exactly
        self.self_attn_norm_mod = nn.LayerNorm(dtype=self.dtype,
                                               name="self_attn_norm")
        self.self_attn_mod = MultiHeadAttention(
            self.dim, self.num_heads, self.attention_dropout,
            attention_type=self.self_attn_type,
            max_relative_length=self.max_relative_length, dtype=self.dtype,
            name="self_attn",
        )
        if self.has_cross_attention:
            self.cross_attn_norm_mod = nn.LayerNorm(dtype=self.dtype,
                                                    name="cross_attn_norm")
            self.cross_attn_mod = MultiHeadAttention(
                self.dim, self.num_heads, self.attention_dropout,
                dtype=self.dtype, sow_attn=True, name="cross_attn",
            )
            if self.collaboration_mode != "none":
                self.s2_cross_attn_mod = MultiHeadAttention(
                    self.dim, self.num_heads, self.attention_dropout,
                    dtype=self.dtype, name="s2_cross_attn",
                )
                if self.collaboration_mode == "serial":
                    self.s2_cross_norm_mod = nn.LayerNorm(
                        dtype=self.dtype, name="s2_cross_norm"
                    )
        self.ffn_norm_mod = nn.LayerNorm(dtype=self.dtype, name="ffn_norm")
        self.ffn_mod = FeedForward(
            self.dim, self.ffn_dim, self.activation, self.dropout,
            self.activation_dropout, self.dtype, name="ffn",
        )
        self.drop_mod = _FastDropout(self.dropout)

    def cross_kv(self, encoder_out):
        """Precompute the static cross-attention K/V for this layer."""
        return self.cross_attn_mod.project_kv(encoder_out)

    def __call__(
        self,
        x: jnp.ndarray,
        encoder_out: jnp.ndarray,
        self_bias: Optional[jnp.ndarray] = None,
        cross_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        cache: Optional[dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
        enc_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_ancestry: Optional[jnp.ndarray] = None,
        s2_out: Optional[jnp.ndarray] = None,
        s2_bias: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[dict]]:
        drop = self.drop_mod

        res = x
        h = self.self_attn_norm_mod(x) if self.normalize_before else x
        h, new_cache = self.self_attn_mod(
            h, h, h, self_bias, deterministic, cache=cache,
            cache_index=cache_index, cache_ancestry=cache_ancestry,
        )
        x = res + drop(h, deterministic=deterministic)
        if not self.normalize_before:
            x = self.self_attn_norm_mod(x)

        if self.has_cross_attention:
            res = x
            h = self.cross_attn_norm_mod(x) if self.normalize_before else x
            cross_in = h
            h, _ = self.cross_attn_mod(
                h, encoder_out, encoder_out, cross_bias, deterministic,
                kv_override=enc_kv,
            )
            h = drop(h, deterministic=deterministic)
            if s2_out is not None and self.collaboration_mode == "parallel":
                h2, _ = self.s2_cross_attn_mod(
                    cross_in, s2_out, s2_out, s2_bias, deterministic,
                )
                h2 = drop(h2, deterministic=deterministic)
                h = h * self.league_s1_ratio + h2 * self.league_s2_ratio
                x = res + h
            else:
                x = res + h
                if not self.normalize_before:
                    x = self.cross_attn_norm_mod(x)
                if s2_out is not None and self.collaboration_mode == "serial":
                    res = x
                    h = self.s2_cross_norm_mod(x)
                    h, _ = self.s2_cross_attn_mod(
                        h, s2_out, s2_out, s2_bias, deterministic,
                    )
                    x = res + drop(h, deterministic=deterministic)

        res = x
        h = self.ffn_norm_mod(x) if self.normalize_before else x
        h = self.ffn_mod(h, deterministic)
        x = res + drop(h, deterministic=deterministic)
        if not self.normalize_before:
            x = self.ffn_norm_mod(x)
        return x, new_cache

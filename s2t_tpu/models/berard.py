"""Berard LSTM speech-translation baseline, reference-faithful.

(reference: fairseq/models/speech_to_text/berard.py:20 — "End-to-End Automatic
Speech Translation of Audiobooks": input linear+tanh stack → strided 2-D convs
→ stacked bidirectional LSTM encoder (packed semantics: outputs beyond each
sequence's length are zero), MLP (Bahdanau) attention, and an LSTM decoder
with the reference's layer-state wiring (layer 0 consumes the previous step's
top-layer state; layer i>0 consumes the current step's layer-i−1 state,
berard.py:470-490), deep output layer and projection.

TPU notes: recurrences run as ``lax.scan`` with one fused (in+H)->4H gate
matmul per step; the model is sequential by construction and kept for
parity/benchmark comparisons rather than throughput.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class BerardConfig:
    input_feat_per_channel: int = 80
    input_channels: int = 1
    # linear+tanh input stack (reference --input-layers "[256, 128]")
    input_layers: Tuple[int, ...] = (256, 128)
    # (out_channels, kernel, stride) per conv (reference --conv-layers)
    conv_layers: Tuple[Tuple[int, int, int], ...] = ((16, 3, 2), (16, 3, 2))
    encoder_hidden: int = 256  # --lstm-size
    encoder_layers: int = 3  # --num-blstm-layers
    decoder_hidden: int = 512  # --decoder-hidden-dim
    decoder_layers: int = 2  # --decoder-num-layers
    decoder_embed_dim: int = 128
    attention_dim: int = 512
    output_layer_dim: int = 128
    dropout: float = 0.2
    vocab_size: int = 1000
    src_vocab_size: int = -1
    max_source_positions: int = 6000
    max_target_positions: int = 1024
    pad_id: int = 1
    use_ctc: bool = False
    dtype_str: str = "float32"

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32


def _lstm_gates(x, h, c, wi, wh, b):
    """One torch-layout LSTM step: gate order i, f, g, o."""
    z = x @ wi + h @ wh + b
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


class PackedLSTM(nn.Module):
    """Unidirectional LSTM over (B, T, D) with pack_padded semantics:
    outputs at t >= length are zero and (with ``reverse``) the recurrence
    runs over each sequence's valid frames only, like torch's packed RNN."""

    hidden: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        B, T, D = x.shape
        H = self.hidden
        wi = self.param("kernel_ih", nn.initializers.lecun_normal(), (D, 4 * H))
        wh = self.param("kernel_hh", nn.initializers.orthogonal(), (H, 4 * H))
        b = self.param("bias", nn.initializers.zeros, (4 * H,))
        wi, wh, b = (a.astype(self.dtype) for a in (wi, wh, b))

        if self.reverse:
            # flip each sequence within its own length (packed semantics)
            t_idx = jnp.arange(T)[None, :]
            src = jnp.clip(lengths[:, None] - 1 - t_idx, 0, T - 1)
            x = jnp.take_along_axis(x, src[..., None], axis=1)

        def step(carry, xt):
            h, c = carry
            h, c = _lstm_gates(xt, h, c, wi, wh, b)
            return (h, c), h

        h0 = jnp.zeros((B, H), self.dtype)
        x_t = jnp.swapaxes(x, 0, 1)  # (T, B, D)
        _, ys = jax.lax.scan(step, (h0, h0), x_t)
        ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)

        if self.reverse:
            t_idx = jnp.arange(T)[None, :]
            src = jnp.clip(lengths[:, None] - 1 - t_idx, 0, T - 1)
            ys = jnp.take_along_axis(ys, src[..., None], axis=1)
        mask = lengths_to_mask(lengths, T)[..., None]
        return jnp.where(mask, ys, 0.0)


class BerardEncoder(nn.Module):
    """(reference: BerardEncoder, berard.py:174-305)."""

    cfg: BerardConfig

    @nn.compact
    def __call__(self, features, lengths, deterministic: bool = True):
        cfg = self.cfg
        x = features.astype(cfg.dtype)  # (B, T, F)
        drop = _FastDropout(cfg.dropout)
        # linear + tanh input stack on the feature axis (+dropout in train)
        for i, width in enumerate(cfg.input_layers):
            x = nn.Dense(width, dtype=cfg.dtype, name=f"input{i}")(x)
            x = drop(x, deterministic=deterministic)
            x = jnp.tanh(x)
        # strided conv2d stack over (time, feat'), channel dim last (NHWC);
        # torch pads k//2 on both spatial dims (berard.py:225-232)
        h = x[..., None]  # (B, T, F', 1)
        for i, (ch, k, s) in enumerate(cfg.conv_layers):
            p = k // 2
            h = nn.Conv(
                features=ch, kernel_size=(k, k), strides=(s, s),
                padding=[(p, p), (p, p)], dtype=cfg.dtype, name=f"conv{i}",
            )(h)
            lengths = (lengths + 2 * p - k) // s + 1
        # flatten channel-major like torch's (B,C,T,F)->(T,B,C*F)
        B2, T2, F2, C2 = h.shape
        x = jnp.transpose(h, (0, 1, 3, 2)).reshape(B2, T2, C2 * F2)
        # stacked BiLSTM with packed semantics; inter-layer dropout
        for i in range(cfg.encoder_layers):
            fwd = PackedLSTM(cfg.encoder_hidden, dtype=cfg.dtype,
                             name=f"blstm{i}_fwd")(x, lengths)
            bwd = PackedLSTM(cfg.encoder_hidden, reverse=True, dtype=cfg.dtype,
                             name=f"blstm{i}_bwd")(x, lengths)
            y = jnp.concatenate([fwd, bwd], axis=-1)
            if i < cfg.encoder_layers - 1:
                y = drop(y, deterministic=deterministic)
            x = y
        x = drop(x, deterministic=deterministic)
        return {
            "encoder_out": x,
            "encoder_lengths": lengths,
            "ctc_logits": None,
            "inter_ctc_logits": (),
            "xctc_logits": None,
            "inter_xctc_logits": (),
        }


class MLPAttention(nn.Module):
    """Bahdanau MLP attention (reference: berard.py:317-377)."""

    attention_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, decoder_state, enc, enc_mask):
        k = nn.Dense(self.attention_dim, dtype=self.dtype, name="encoder_proj")(enc)
        q = nn.Dense(self.attention_dim, use_bias=False, dtype=self.dtype,
                     name="decoder_proj")(decoder_state)[:, None, :]
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="to_scores")(
            jnp.tanh(q + k)
        )[..., 0]
        e = jnp.where(enc_mask, e, -jnp.inf)
        a = jax.nn.softmax(e, axis=-1)
        return jnp.einsum("bt,btd->bd", a, enc), a


class LSTMAttentionDecoder(nn.Module):
    """(reference: LSTMDecoder, berard.py:380-527 — including the layer-state
    wiring where layer 0 reads the previous step's TOP-layer state and layer
    i>0 reads the current step's layer-i−1 state, :470-482)."""

    cfg: BerardConfig

    def setup(self):
        cfg = self.cfg
        H = cfg.decoder_hidden
        ctx = 2 * cfg.encoder_hidden
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.decoder_embed_dim, dtype=cfg.dtype,
            name="embed_tokens",
        )
        self.cell_params = [
            (
                self.param(
                    f"cell{i}_kernel_ih", nn.initializers.lecun_normal(),
                    ((cfg.decoder_embed_dim if i == 0 else ctx), 4 * H),
                ),
                self.param(f"cell{i}_kernel_hh",
                           nn.initializers.orthogonal(), (H, 4 * H)),
                self.param(f"cell{i}_bias", nn.initializers.zeros, (4 * H,)),
            )
            for i in range(cfg.decoder_layers)
        ]
        self.attention = MLPAttention(cfg.attention_dim, dtype=cfg.dtype,
                                      name="attention")
        self.deep_output_layer = nn.Dense(
            cfg.output_layer_dim, dtype=cfg.dtype, name="deep_output_layer"
        )
        self.output_projection = nn.Dense(
            cfg.vocab_size, dtype=cfg.dtype, name="output_projection"
        )
        self.drop = _FastDropout(cfg.dropout)

    def __call__(self, prev_tokens, enc, enc_mask, deterministic: bool = True):
        cfg = self.cfg
        B, U = prev_tokens.shape
        L, H = cfg.decoder_layers, cfg.decoder_hidden
        emb = self.embed_tokens(prev_tokens)
        x = self.drop(emb, deterministic=deterministic)
        # initial hiddens: mean of encoder outputs over the (padded) time
        # axis, exactly as the reference (berard.py:463 — plain .mean(dim=0)
        # over pad_packed zeros)
        h_init = jnp.mean(enc, axis=1).astype(cfg.dtype)
        hiddens = [h_init for _ in range(L)]
        cells = [jnp.zeros((B, H), cfg.dtype) for _ in range(L)]
        outs, attn_ctxs = [], []
        for j in range(U):
            inp = x[:, j]
            attention_out = None
            for i in range(L):
                wi, wh, b = self.cell_params[i]
                h, c = _lstm_gates(
                    inp, hiddens[(i - 1) % L], cells[(i - 1) % L],
                    wi.astype(cfg.dtype), wh.astype(cfg.dtype),
                    b.astype(cfg.dtype),
                )
                h = self.drop(h, deterministic=deterministic)
                hiddens[i], cells[i] = h, c
                if attention_out is None:
                    attention_out, _ = self.attention(h, enc, enc_mask)
                    attention_out = self.drop(
                        attention_out, deterministic=deterministic
                    )
                    attn_ctxs.append(attention_out)
                inp = attention_out
            outs.append(hiddens[L - 1])
        top = jnp.stack(outs, axis=1)  # (B, U, H)
        ctxs = jnp.stack(attn_ctxs, axis=1)  # (B, U, 2*enc_hidden)
        y = jnp.concatenate([top, ctxs, emb], axis=-1)
        y = jnp.tanh(self.deep_output_layer(y))
        y = self.drop(y, deterministic=deterministic)
        return self.output_projection(y)


@register_model("berard")
class BerardModel(nn.Module):
    cfg: BerardConfig

    def setup(self):
        self.encoder = BerardEncoder(self.cfg, name="encoder")
        self.decoder = LSTMAttentionDecoder(self.cfg, name="decoder")

    def __call__(self, features, feat_lengths, prev_tokens, deterministic=True):
        enc = self.encoder(features, feat_lengths, deterministic)
        enc_mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self.decoder(prev_tokens, enc["encoder_out"], enc_mask, deterministic)
        return {"decoder_logits": logits, **enc}

    def encode(self, features, feat_lengths, deterministic: bool = True):
        return self.encoder(features, feat_lengths, deterministic)


@register_model_architecture("berard", "berard")
@register_model_architecture("berard", "s2t_berard")
def berard_base(**kw) -> BerardConfig:
    """(reference: berard.py:546-567 — the arXiv:1802.04200 original)."""
    return BerardConfig().replace(**kw)


@register_model_architecture("berard", "s2t_berard_256_3_3")
def berard_256_3_3(**kw) -> BerardConfig:
    """(reference: berard.py:569-580 — CoVoST baseline, 3 decoder layers)."""
    return BerardConfig(decoder_layers=3).replace(**kw)


@register_model_architecture("berard", "berard_512_3_2")
@register_model_architecture("berard", "s2t_berard_512_3_2")
def berard_512_3_2(**kw) -> BerardConfig:
    """(reference: berard.py:583-594)."""
    return BerardConfig(
        encoder_hidden=512, dropout=0.3, decoder_embed_dim=256,
        decoder_layers=2, decoder_hidden=1024, attention_dim=512,
        output_layer_dim=256,
    ).replace(**kw)


@register_model_architecture("berard", "s2t_berard_512_5_3")
def berard_512_5_3(**kw) -> BerardConfig:
    """(reference: berard.py:596-606)."""
    return BerardConfig(
        encoder_layers=5, encoder_hidden=512, dropout=0.3,
        decoder_embed_dim=256, decoder_layers=3, decoder_hidden=1024,
        attention_dim=512, output_layer_dim=256,
    ).replace(**kw)

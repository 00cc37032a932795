"""Berard LSTM speech-translation baseline.

(reference: fairseq/models/speech_to_text/berard.py:20 — "End-to-End Automatic
Speech Translation of Audiobooks" architecture: conv subsampling + stacked
(b)LSTM encoder, LSTM decoder with attention.)

TPU notes: recurrences run as ``nn.RNN`` (lax.scan under jit); the model is
sequential by construction and kept for parity/benchmark comparisons rather
than throughput.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.subsampling import Conv1dSubsampling
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class BerardConfig:
    input_feat_per_channel: int = 80
    input_channels: int = 1
    encoder_hidden: int = 256
    encoder_layers: int = 3
    bidirectional: bool = True
    decoder_hidden: int = 512
    decoder_layers: int = 2
    decoder_embed_dim: int = 128
    dropout: float = 0.2
    vocab_size: int = 1000
    src_vocab_size: int = -1
    max_source_positions: int = 6000
    max_target_positions: int = 1024
    pad_id: int = 1
    use_ctc: bool = False
    dtype_str: str = "float32"
    subsampling_layers: int = 2
    subsampling_stride: int = 2

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32


class LSTMEncoder(nn.Module):
    cfg: BerardConfig

    @nn.compact
    def __call__(self, features, lengths, deterministic: bool = True):
        cfg = self.cfg
        x, lengths = Conv1dSubsampling(
            cfg.subsampling_layers, cfg.encoder_hidden * 2, cfg.encoder_hidden,
            5, cfg.subsampling_stride, activation="glu", dtype=cfg.dtype,
            name="subsample",
        )(features.astype(cfg.dtype), lengths)
        for i in range(cfg.encoder_layers):
            fwd = nn.RNN(nn.LSTMCell(cfg.encoder_hidden), name=f"lstm{i}_fwd")
            h_f = fwd(x, seq_lengths=lengths)
            if cfg.bidirectional:
                bwd = nn.RNN(
                    nn.LSTMCell(cfg.encoder_hidden), reverse=True,
                    keep_order=True, name=f"lstm{i}_bwd",
                )
                h_b = bwd(x, seq_lengths=lengths)
                h = jnp.concatenate([h_f, h_b], axis=-1)
                h = nn.Dense(cfg.encoder_hidden, dtype=cfg.dtype, name=f"proj{i}")(h)
            else:
                h = h_f
            x = _FastDropout(cfg.dropout)(h, deterministic=deterministic)
        return {
            "encoder_out": x,
            "encoder_lengths": lengths,
            "ctc_logits": None,
            "inter_ctc_logits": (),
            "xctc_logits": None,
            "inter_xctc_logits": (),
        }


class LSTMAttentionDecoder(nn.Module):
    """LSTM decoder with MLP attention over encoder states."""

    cfg: BerardConfig

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.decoder_embed_dim, dtype=cfg.dtype,
                              name="embed")
        self.cells = [
            nn.OptimizedLSTMCell(cfg.decoder_hidden, name=f"cell{i}")
            for i in range(cfg.decoder_layers)
        ]
        self.attn_query = nn.Dense(cfg.decoder_hidden, use_bias=False, name="attn_q")
        self.attn_key = nn.Dense(cfg.decoder_hidden, use_bias=False, name="attn_k")
        self.attn_v = nn.Dense(1, use_bias=False, name="attn_v")
        self.out = nn.Dense(cfg.vocab_size, dtype=cfg.dtype, name="out")
        self.drop = _FastDropout(cfg.dropout)

    def _attend(self, query, enc, enc_mask):
        # additive (MLP) attention
        q = self.attn_query(query)[:, None, :]
        k = self.attn_key(enc)
        e = self.attn_v(jnp.tanh(q + k))[..., 0]
        e = jnp.where(enc_mask, e, -1e9)
        a = jax.nn.softmax(e, axis=-1)
        return jnp.einsum("bt,btd->bd", a, enc)

    def _step(self, carry, tok_emb, enc, enc_mask, deterministic):
        states = carry
        ctx = self._attend(states[-1][1], enc, enc_mask)
        inp = jnp.concatenate([tok_emb, ctx], axis=-1)
        new_states = []
        h = inp
        for i, cell in enumerate(self.cells):
            st, h = cell(states[i], h)
            new_states.append(st)
        h = self.drop(h, deterministic=deterministic)
        logits = self.out(jnp.concatenate([h, ctx], axis=-1))
        return new_states, logits

    def __call__(self, prev_tokens, enc, enc_mask, deterministic: bool = True):
        B, U = prev_tokens.shape
        emb = self.embed(prev_tokens)
        states = [
            self.cells[i].initialize_carry(
                jax.random.PRNGKey(0), (B, self.cfg.decoder_hidden)
            )
            for i in range(self.cfg.decoder_layers)
        ]
        logits = []
        for u in range(U):
            states, l = self._step(states, emb[:, u], enc, enc_mask, deterministic)
            logits.append(l)
        return jnp.stack(logits, axis=1)


@register_model("berard")
class BerardModel(nn.Module):
    cfg: BerardConfig

    def setup(self):
        self.encoder = LSTMEncoder(self.cfg, name="encoder")
        self.decoder = LSTMAttentionDecoder(self.cfg, name="decoder")

    def __call__(self, features, feat_lengths, prev_tokens, deterministic=True):
        enc = self.encoder(features, feat_lengths, deterministic)
        enc_mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self.decoder(prev_tokens, enc["encoder_out"], enc_mask, deterministic)
        return {"decoder_logits": logits, **enc}

    def encode(self, features, feat_lengths, deterministic: bool = True):
        return self.encoder(features, feat_lengths, deterministic)


@register_model_architecture("berard", "berard")
@register_model_architecture("berard", "berard_512_3_2")
def berard_base(**kw) -> BerardConfig:
    return BerardConfig().replace(**kw)

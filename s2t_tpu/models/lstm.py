"""LSTM encoder-decoder MT model with attention (Luong-style input feeding).

(reference: fairseq/models/lstm.py:27 — bidirectional LSTM encoder, LSTM
decoder with attention and input feeding, incremental decoding.)

TPU notes: the recurrence is a lax.scan over time (sequential by nature);
all gates fuse into one (B, 4H) matmul per step via flax's LSTMCell.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class LSTMConfig:
    encoder_embed_dim: int = 512
    encoder_hidden_size: int = 512
    encoder_layers: int = 1
    encoder_bidirectional: bool = True
    decoder_embed_dim: int = 512
    decoder_hidden_size: int = 512
    decoder_layers: int = 1
    dropout: float = 0.1
    share_decoder_input_output_embed: bool = True
    vocab_size: int = 1000
    src_vocab_size: int = -1
    max_source_positions: int = 1024
    max_target_positions: int = 1024
    pad_id: int = 1
    dtype_str: str = "float32"
    subsampling_layers: int = 0
    subsampling_stride: int = 1

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def src_vocab(self):
        return self.src_vocab_size if self.src_vocab_size > 0 else self.vocab_size


def reverse_padded(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row's VALID prefix, zeroing the padded tail.

    A plain jnp.flip would put pad embeddings first, contaminating the
    backward LSTM state of every valid frame with batch-padding history
    (the reference packs sequences to avoid exactly this)."""
    T = x.shape[1]
    idx = jnp.clip(lengths[:, None] - 1 - jnp.arange(T)[None, :], 0, T - 1)
    rev = jnp.take_along_axis(x, idx[..., None], axis=1)
    valid = jnp.arange(T)[None, :] < lengths[:, None]
    return jnp.where(valid[..., None], rev, 0.0)


def _scan_cell():
    """LSTMCell lifted over the time axis (flax nn.scan)."""
    return nn.scan(
        nn.OptimizedLSTMCell,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=1,
        out_axes=1,
    )


@register_model("lstm")
class LSTMModel(nn.Module):
    cfg: LSTMConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        H = cfg.encoder_hidden_size
        self.src_embed = nn.Embed(
            cfg.src_vocab, cfg.encoder_embed_dim, dtype=dt,
            embedding_init=nn.initializers.normal(0.1), name="src_embed",
        )
        self.tgt_embed = nn.Embed(
            cfg.vocab_size, cfg.decoder_embed_dim, dtype=dt,
            embedding_init=nn.initializers.normal(0.1), name="tgt_embed",
        )
        Scan = _scan_cell()
        self.enc_fw = [
            Scan(H, name=f"enc_fw{i}") for i in range(cfg.encoder_layers)
        ]
        self.enc_bw = [
            Scan(H, name=f"enc_bw{i}") for i in range(cfg.encoder_layers)
        ] if cfg.encoder_bidirectional else []
        enc_out_dim = H * (2 if cfg.encoder_bidirectional else 1)
        if enc_out_dim != cfg.decoder_hidden_size:
            self.enc_proj = nn.Dense(cfg.decoder_hidden_size, dtype=dt,
                                     name="enc_proj")
        Hd = cfg.decoder_hidden_size
        self.dec_cells = [
            nn.OptimizedLSTMCell(Hd, name=f"dec{i}")
            for i in range(cfg.decoder_layers)
        ]
        self.attn_proj = nn.Dense(Hd, use_bias=False, dtype=dt, name="attn_proj")
        self.out_proj = nn.Dense(Hd, dtype=dt, name="out_proj")
        if not cfg.share_decoder_input_output_embed:
            self.logits_proj = nn.Dense(cfg.vocab_size, use_bias=False,
                                        dtype=dt, name="logits_proj")
        self.drop = _FastDropout(cfg.dropout)

    # ------------------------------------------------------------------ #
    def encode(self, src_tokens, src_lengths=None, deterministic: bool = True):
        cfg = self.cfg
        if src_lengths is None:
            src_lengths = jnp.sum((src_tokens != cfg.pad_id).astype(jnp.int32), 1)
        x = self.src_embed(src_tokens)
        x = self.drop(x, deterministic=deterministic)
        valid0 = lengths_to_mask(src_lengths, x.shape[1])
        x = jnp.where(valid0[..., None], x, 0.0)
        B = x.shape[0]
        H = cfg.encoder_hidden_size
        for i in range(cfg.encoder_layers):
            init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
            _, fw = self.enc_fw[i](init, x)
            if cfg.encoder_bidirectional:
                # backward pass over each row's valid prefix reversed
                _, bw = self.enc_bw[i](init, reverse_padded(x, src_lengths))
                bw = reverse_padded(bw, src_lengths)
                x = jnp.concatenate([fw, bw], axis=-1)
            else:
                x = fw
        if x.shape[-1] != cfg.decoder_hidden_size:
            x = self.enc_proj(x)
        valid = lengths_to_mask(src_lengths, x.shape[1])
        x = jnp.where(valid[..., None], x, 0.0)
        return {
            "encoder_out": x, "encoder_lengths": src_lengths,
            "ctc_logits": None, "inter_ctc_logits": (), "xctc_logits": None,
            "inter_xctc_logits": (), "mixup": None,
        }

    def _attend(self, h, enc_out, enc_valid):
        # Luong general attention: score = h W enc
        scores = jnp.einsum("bd,btd->bt", self.attn_proj(h), enc_out)
        scores = jnp.where(enc_valid, scores, -1e30)
        w = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(h.dtype)
        return jnp.einsum("bt,btd->bd", w, enc_out)

    def _dec_step(self, tok_emb, states, input_feed, enc_out, enc_valid,
                  deterministic=True):
        x = jnp.concatenate([tok_emb, input_feed], axis=-1)
        new_states = []
        for i, cell in enumerate(self.dec_cells):
            (c, h), x = cell(states[i], x)
            new_states.append((c, h))
        ctx = self._attend(x, enc_out, enc_valid)
        out = jnp.tanh(self.out_proj(jnp.concatenate([x, ctx], axis=-1)))
        out = self.drop(out, deterministic=deterministic)
        return out, new_states, out  # out doubles as next input_feed

    def _logits(self, out):
        if self.cfg.share_decoder_input_output_embed:
            return self.tgt_embed.attend(out)
        return self.logits_proj(out)

    def __call__(self, src_tokens, src_lengths, prev_tokens,
                 deterministic: bool = True) -> Dict[str, Any]:
        cfg = self.cfg
        enc = self.encode(src_tokens, src_lengths, deterministic)
        enc_valid = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        B, U = prev_tokens.shape
        Hd = cfg.decoder_hidden_size
        emb = self.drop(self.tgt_embed(prev_tokens), deterministic=deterministic)
        states = [
            (jnp.zeros((B, Hd), cfg.dtype), jnp.zeros((B, Hd), cfg.dtype))
            for _ in range(cfg.decoder_layers)
        ]
        feed = jnp.zeros((B, Hd), cfg.dtype)

        # nn.scan over the target axis: one compiled step regardless of U
        # (a python loop would unroll U copies of attention+cells into the
        # graph — minutes of compile time at MT lengths)
        def body(module, carry, tok_emb):
            states, feed = carry
            out, new_states, new_feed = module._dec_step(
                tok_emb, states, feed, enc["encoder_out"], enc_valid,
                deterministic,
            )
            return (new_states, new_feed), out

        scan = nn.scan(
            body, variable_broadcast="params",
            split_rngs={"params": False, "dropout": True}, in_axes=1, out_axes=1,
        )
        _, outs = scan(self, (states, feed), emb)
        return {"decoder_logits": self._logits(outs), **enc}

    # -- incremental decode protocol ----------------------------------------- #
    def init_cache(self, batch_size: int, max_len: int):
        Hd = self.cfg.decoder_hidden_size
        return {
            "states": [
                (jnp.zeros((batch_size, Hd), self.cfg.dtype),
                 jnp.zeros((batch_size, Hd), self.cfg.dtype))
                for _ in range(self.cfg.decoder_layers)
            ],
            "feed": jnp.zeros((batch_size, Hd), self.cfg.dtype),
        }

    def decode_step(self, tokens, cache, index, encoder_out, encoder_valid_mask):
        emb = self.tgt_embed(tokens[:, 0])
        out, states, feed = self._dec_step(
            emb, cache["states"], cache["feed"], encoder_out,
            encoder_valid_mask, True,
        )
        return self._logits(out), {"states": states, "feed": feed}


@register_model_architecture("lstm", "lstm")
@register_model_architecture("lstm", "lstm_wiseman_iwslt_de_en")
def lstm_iwslt(**kw) -> LSTMConfig:
    return LSTMConfig(
        encoder_embed_dim=256, encoder_hidden_size=256, decoder_embed_dim=256,
        decoder_hidden_size=256,
    ).replace(**kw)


@register_model("lstm_lm")
class LSTMLM(nn.Module):
    """Decoder-only LSTM language model (reference: models/lstm_lm.py —
    an LSTMDecoder without attention used for language_modeling).  Shares
    the TransformerLM call/decode_step/init_cache protocol so eval_lm and
    shallow fusion work unchanged."""

    cfg: LSTMConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        self.tgt_embed = nn.Embed(
            cfg.vocab_size, cfg.decoder_embed_dim, dtype=dt,
            embedding_init=nn.initializers.normal(0.1), name="tgt_embed",
        )
        Scan = _scan_cell()
        self.cells = [
            Scan(cfg.decoder_hidden_size, name=f"lstm{i}")
            for i in range(cfg.decoder_layers)
        ]
        if cfg.decoder_hidden_size != cfg.decoder_embed_dim \
                and cfg.share_decoder_input_output_embed:
            self.out_to_emb = nn.Dense(cfg.decoder_embed_dim, dtype=dt,
                                       name="out_to_emb")
        if not cfg.share_decoder_input_output_embed:
            self.logits_proj = nn.Dense(cfg.vocab_size, use_bias=False,
                                        dtype=dt, name="logits_proj")
        self.drop = _FastDropout(cfg.dropout)

    def _logits(self, out):
        if self.cfg.share_decoder_input_output_embed:
            if out.shape[-1] != self.cfg.decoder_embed_dim:
                out = self.out_to_emb(out)
            return self.tgt_embed.attend(out)
        return self.logits_proj(out)

    def _run(self, x, init_states):
        """x (B, T, E) -> (out (B, T, H), final states)."""
        states = []
        for i, cell in enumerate(self.cells):
            s, x = cell(init_states[i], x)
            states.append(s)
        return x, states

    def __call__(self, prev_tokens, deterministic: bool = True,
                 targets: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
        cfg = self.cfg
        B = prev_tokens.shape[0]
        H = cfg.decoder_hidden_size
        x = self.drop(self.tgt_embed(prev_tokens), deterministic=deterministic)
        init = [
            (jnp.zeros((B, H), cfg.dtype), jnp.zeros((B, H), cfg.dtype))
            for _ in range(cfg.decoder_layers)
        ]
        out, _ = self._run(x, init)
        out = self.drop(out, deterministic=deterministic)
        return {"decoder_logits": self._logits(out)}

    def init_cache(self, batch_size: int, max_len: int):
        H = self.cfg.decoder_hidden_size
        return [
            (jnp.zeros((batch_size, H), self.cfg.dtype),
             jnp.zeros((batch_size, H), self.cfg.dtype))
            for _ in range(self.cfg.decoder_layers)
        ]

    def decode_step(self, tokens, cache, index):
        x = self.tgt_embed(tokens)  # (B, 1, E)
        out, states = self._run(x, cache)
        return self._logits(out[:, 0]), states


@register_model_architecture("lstm_lm", "lstm_lm")
def lstm_lm(**kw) -> LSTMConfig:
    return LSTMConfig(
        encoder_bidirectional=False, decoder_layers=1,
    ).replace(**kw)

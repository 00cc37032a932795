"""Insertion Transformer (Stern et al. 2019).

(reference: fairseq/models/nat/insertion_transformer.py — a NAT that builds
the target by repeatedly inserting tokens into slots between the current
canvas tokens; training subsamples a canvas and supervises every slot with a
balanced-binary-tree soft distribution over the missing tokens, computed by
the libnat `suggested_ed2_path` C++ kernel.)

TPU-native redesign:
  * Canvas subsampling and the tree-weighted slot targets are pure jittable
    tensor ops (cumsums + one-hot scatter-adds) inside the train step — no
    host DP kernel.  Slots of a kept-token subsequence of a target are
    contiguous runs of dropped tokens, so slot id = #kept-before, and the
    in-slot position is distance from the last kept token.
  * Decoding is a jitted while_loop over a fixed-width canvas: all slots
    predict in parallel, every confident slot inserts simultaneously
    (parallel insertion decode), positions re-scattered by cumsum — the
    dynamic canvas growth the reference does in python becomes a static
    (B, Tmax) scatter.

Canvas convention: [bos, t1..tk, eos, pad...]; slot j sits between canvas
positions j and j+1; the "no insertion" label is pad.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.models.transformer import TransformerMTConfig, TransformerTextEncoder
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask


@dataclass(frozen=True)
class InsertionConfig(TransformerMTConfig):
    insertion_tau: float = 1.0  # tree-weight temperature (reference --label-tau)
    unk_id: int = 3
    bos_id: int = 0
    eos_id: int = 2


def make_slot_targets(tgt, keep, pad_id, vocab_size, tau=1.0,
                      bos_id=0, eos_id=2):
    """Soft insertion targets from a kept-subsequence canvas.

    tgt (B, T) target ids (eos-terminated, pad-padded); keep (B, T) bool —
    tokens that stay on the canvas (pad positions must be False).
    Returns (canvas (B, T+2) with bos/eos framing, slot_tgt (B, T+1, V) soft
    distributions, slot_valid (B, T+1) bool).
    """
    B, T = tgt.shape
    S = T + 1
    nonpad = tgt != pad_id
    keep = keep & nonpad
    dropped = nonpad & ~keep

    # canvas: compact kept tokens left, frame with bos/eos
    order = jnp.argsort(~keep, axis=1, stable=True)  # kept first, stable
    compact = jnp.take_along_axis(tgt, order, axis=1)
    n_keep = jnp.sum(keep, axis=1)  # (B,)
    pos = jnp.arange(T)[None, :]
    compact = jnp.where(pos < n_keep[:, None], compact, pad_id)
    canvas = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), compact, jnp.full((B, 1), pad_id, jnp.int32)],
        axis=1,
    )  # bos placeholder ids fixed below
    # write eos right after the kept tokens
    canvas = canvas.at[jnp.arange(B), n_keep + 1].set(eos_id)
    canvas = canvas.at[:, 0].set(bos_id)

    # slot of a dropped token = #kept before it (slot j: canvas[j] -> canvas[j+1])
    kept_before = jnp.cumsum(keep.astype(jnp.int32), axis=1) - keep.astype(jnp.int32)
    slot = kept_before  # (B, T) in [0, n_keep]
    # in-slot position: distance from the last kept position
    idx = jnp.arange(T)[None, :]
    last_kept = jax.lax.associative_scan(
        jnp.maximum, jnp.where(keep, idx, -1), axis=1
    )
    p = idx - last_kept - 1  # 0-based position within the run of dropped

    # per-slot counts
    slot_hot = jax.nn.one_hot(slot, S, dtype=jnp.float32) * dropped[..., None]
    n_slot = jnp.sum(slot_hot, axis=1)  # (B, S)
    n_tok = jnp.take_along_axis(n_slot, slot, axis=1)  # (B, T) count in own slot
    center = (n_tok - 1.0) / 2.0
    depth = jnp.abs(p.astype(jnp.float32) - center)
    w = jnp.exp(-tau * depth) * dropped.astype(jnp.float32)  # (B, T)

    # scatter into (B, S, V) and normalise per slot
    tgt_hot = jax.nn.one_hot(tgt, vocab_size, dtype=jnp.float32)
    slot_tgt = jnp.einsum("bts,btv->bsv", slot_hot * w[..., None], tgt_hot)
    mass = jnp.sum(slot_tgt, axis=-1, keepdims=True)
    # empty (but valid) slots: "insert nothing" == pad label
    pad_hot = jax.nn.one_hot(jnp.full((B, S), pad_id), vocab_size,
                             dtype=jnp.float32)
    slot_tgt = jnp.where(mass > 0, slot_tgt / jnp.maximum(mass, 1e-9), pad_hot)
    slot_valid = jnp.arange(S)[None, :] <= n_keep[:, None]  # slots 0..n_keep
    return canvas, slot_tgt, slot_valid


@register_model("insertion_transformer")
class InsertionTransformerModel(nn.Module):
    cfg: InsertionConfig

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
            max_positions=cfg.max_target_positions + 2, pad_id=cfg.pad_id,
            dtype=cfg.dtype, causal=False, name="decoder",
        )
        # slot head: adjacent-pair features -> vocab (reference: the pooled
        # in/out projections around forward_word_ins)
        self.slot_proj = nn.Dense(cfg.decoder_embed_dim, dtype=cfg.dtype,
                                  name="slot_proj")

    def _slot_logits(self, canvas, encoder_out, enc_valid, deterministic):
        feats = self.decoder.forward_features(
            canvas, encoder_out, enc_valid, deterministic
        )  # (B, L, D)
        pair = jnp.concatenate([feats[:, :-1], feats[:, 1:]], axis=-1)
        h = nn.gelu(self.slot_proj(pair))
        return self.decoder.output_logits(h)  # (B, L-1, V)

    def __call__(self, src_tokens, src_lengths, canvas,
                 slot_tgt: Optional[jnp.ndarray] = None,
                 slot_valid: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Dict[str, Any]:
        enc = self.encoder(src_tokens, src_lengths, deterministic)
        enc_valid = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self._slot_logits(canvas, enc["encoder_out"], enc_valid,
                                   deterministic)
        out: Dict[str, Any] = {"slot_logits": logits, **enc}
        if slot_tgt is not None:
            out["slot_tgt"] = slot_tgt
            out["slot_valid"] = slot_valid
        return out

    # -- decode hooks ---------------------------------------------------------
    def encode(self, src_tokens, src_lengths, deterministic: bool = True):
        return self.encoder(src_tokens, src_lengths, deterministic)

    def slot_logits(self, canvas, encoder_out, enc_valid):
        return self._slot_logits(canvas, encoder_out, enc_valid, True)


def insertion_decode(model, params, enc_out, enc_valid, batch_size, Tmax,
                     max_iter=10, bos=0, pad=1, eos=2, threshold=0.0,
                     pad_penalty=0.0):
    """Parallel insertion decode over a fixed-width canvas.

    Returns (tokens (B, Tmax) without bos, scores (B,))."""
    B = batch_size
    canvas = jnp.full((B, Tmax), pad, jnp.int32)
    canvas = canvas.at[:, 0].set(bos).at[:, 1].set(eos)
    length = jnp.full((B,), 2, jnp.int32)

    def cond(carry):
        canvas, length, it, changed = carry
        return (it < max_iter) & changed

    def body(carry):
        canvas, length, it, _ = carry
        logits = model.apply(
            {"params": params}, canvas, enc_out, enc_valid,
            method=type(model).slot_logits,
        )  # (B, Tmax-1, V)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # discourage premature stopping (reference: --iter-decode-eos-penalty
        # subtracted from the no-insert label in forward_decoder)
        lp = lp.at[..., pad].add(-pad_penalty)
        best = jnp.argmax(lp, axis=-1).astype(jnp.int32)  # (B, S)
        best_lp = jnp.max(lp, axis=-1)
        pad_lp = lp[..., pad]
        S = best.shape[1]
        slot_valid = jnp.arange(S)[None, :] < (length - 1)[:, None]
        do_ins = (
            slot_valid & (best != pad)
            & (best_lp > pad_lp + threshold)
        )
        # canvas capacity: insertions that would overflow are dropped
        ins_before = jnp.cumsum(do_ins.astype(jnp.int32), axis=1)
        total_ins = ins_before[:, -1]
        overflow = length + total_ins > Tmax
        do_ins = do_ins & ~overflow[:, None]
        ins_before = jnp.cumsum(do_ins.astype(jnp.int32), axis=1)

        # new position of canvas token i: i + insertions in slots < i
        shift = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), ins_before], axis=1
        )[:, :Tmax]
        old_pos = jnp.arange(Tmax)[None, :]
        valid_old = old_pos < length[:, None]
        new_pos = jnp.where(valid_old, old_pos + shift, Tmax)  # Tmax = dropped
        new_canvas = jnp.full((B, Tmax), pad, jnp.int32)
        bidx = jnp.arange(B)[:, None].repeat(Tmax, 1)
        new_canvas = new_canvas.at[bidx, new_pos].set(
            jnp.where(valid_old, canvas, pad), mode="drop"
        )
        # inserted token for slot j lands right after canvas token j's new spot
        ins_pos = jnp.where(
            do_ins,
            old_pos[:, : S] + 1 + (ins_before - do_ins.astype(jnp.int32)),
            Tmax,
        )
        bidx_s = jnp.arange(B)[:, None].repeat(S, 1)
        new_canvas = new_canvas.at[bidx_s, ins_pos].set(
            jnp.where(do_ins, best, pad), mode="drop"
        )
        n_ins = jnp.sum(do_ins.astype(jnp.int32), axis=1)
        return new_canvas, length + n_ins, it + 1, jnp.any(n_ins > 0)

    canvas, length, _, _ = jax.lax.while_loop(
        cond, body, (canvas, length, jnp.zeros((), jnp.int32),
                     jnp.asarray(True))
    )
    # strip the leading bos; keep eos so output matches target convention
    tokens = jnp.concatenate(
        [canvas[:, 1:], jnp.full((B, 1), pad, jnp.int32)], axis=1
    )
    return tokens, jnp.zeros((B,), jnp.float32)


class InsertionGenerator:
    """generate(params, batch) -> (tokens (B,1,Tmax), scores (B,1), enc)."""

    def __init__(self, model, max_iter=10, max_target_positions=128,
                 bos_id=0, pad_id=1, eos_id=2, pad_penalty=0.0):
        self.model = model
        self.max_iter = max_iter
        self.Tmax = max_target_positions
        self.bos, self.pad, self.eos = bos_id, pad_id, eos_id
        self.pad_penalty = pad_penalty
        self._compiled = {}

    def _build(self):
        model, Tmax, max_iter = self.model, self.Tmax, self.max_iter
        bos, pad, eos = self.bos, self.pad, self.eos
        pad_penalty = self.pad_penalty

        @jax.jit
        def run(params, src_tokens, src_lengths):
            enc = model.apply(
                {"params": params}, src_tokens, src_lengths,
                method=type(model).encode,
            )
            enc_valid = lengths_to_mask(
                enc["encoder_lengths"], enc["encoder_out"].shape[1]
            )
            tokens, scores = insertion_decode(
                model, params, enc["encoder_out"], enc_valid,
                src_tokens.shape[0], Tmax, max_iter, bos, pad, eos,
                pad_penalty=pad_penalty,
            )
            return tokens[:, None, :], scores[:, None], enc

        return run

    def generate(self, params, batch):
        src = batch.get("src_tokens", batch.get("features"))
        lens = batch.get("src_lengths", batch.get("feat_lengths"))
        key = src.shape
        if key not in self._compiled:
            self._compiled[key] = self._build()
        return self._compiled[key](params, src, lens)


@register_model_architecture("insertion_transformer", "insertion_transformer")
def insertion_transformer(**kw) -> InsertionConfig:
    return InsertionConfig(
        encoder_normalize_before=False, decoder_normalize_before=False,
    ).replace(**kw)

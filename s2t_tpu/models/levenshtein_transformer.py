"""Levenshtein Transformer — edit-based NAT (delete / insert / fill).

(reference: fairseq/models/nat/levenshtein_transformer.py:28 — a NAT decoder
with three heads: per-token deletion classifier, per-gap placeholder-count
classifier (0..255), and the word predictor; training rolls in from
random-deleted targets with libnat oracles
(models/nat/levenshtein_utils.py), decoding iterates delete→insert→fill
(iterative_refinement_generator.py).)

TPU design, all static shapes over a (B, Tmax) canvas:
  * random word-dropping keeps a boolean kept-mask, so the insertion oracle
    is closed-form index arithmetic (gap count = index gap - 1) instead of an
    edit-distance kernel; only the deletion oracle (against the model's own
    roll-in predictions) needs the LCS DP in ops/levenshtein.py
  * canvas compaction (deletions) is an argsort-gather; insertion re-scatters
    kept tokens to cumsum-shifted indices with <unk> placeholders between
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.models.cmlm_transformer import CMLMConfig
from s2t_tpu.models.transformer import TransformerTextEncoder
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask


@dataclass(frozen=True)
class LevenshteinConfig(CMLMConfig):
    max_ins: int = 64  # placeholder-count classifier arity (reference: 256)


def compact_tokens(tokens: jnp.ndarray, keep: jnp.ndarray, pad_id: int):
    """Left-pack kept tokens; drop the rest to pad (static shape)."""
    B, T = tokens.shape
    pos = jnp.arange(T)[None, :]
    order_key = jnp.where(keep, pos, T + pos)
    order = jnp.argsort(order_key, axis=1)
    packed = jnp.take_along_axis(tokens, order, axis=1)
    n_keep = jnp.sum(keep.astype(jnp.int32), axis=1)
    return jnp.where(pos < n_keep[:, None], packed, pad_id), n_keep


def insert_placeholders(
    tokens: jnp.ndarray, counts: jnp.ndarray, pad_id: int, unk_id: int
):
    """Insert ``counts[b, i]`` <unk> placeholders after token i.

    tokens: (B, T) left-packed; counts: (B, T) (count after position i; the
    final valid token — eos — gets 0).  Total clamped to fit T.
    """
    B, T = tokens.shape
    valid = tokens != pad_id
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
    # only interior gaps exist: never insert after the last valid token (the
    # reference canvas has no (eos, pad) gap — its length IS n_valid)
    pos = jnp.arange(T)[None, :]
    counts = jnp.where(valid & (pos < (n_valid - 1)[:, None]), counts, 0)
    # greedy-clamp so the canvas never overflows T
    cs_excl = jnp.cumsum(counts, axis=1) - counts
    budget = jnp.maximum(T - n_valid[:, None] - cs_excl, 0)
    counts = jnp.minimum(counts, budget)
    # new index of kept token i = i + sum(counts[:i])
    new_idx = jnp.arange(T)[None, :] + (jnp.cumsum(counts, axis=1) - counts)
    new_idx = jnp.where(valid, new_idx, T)  # park pads out of bounds
    out = jnp.full((B, T), unk_id, jnp.int32)
    out = out.at[jnp.arange(B)[:, None], new_idx].set(tokens, mode="drop")
    new_len = n_valid + jnp.sum(counts, axis=1)
    pos = jnp.arange(T)[None, :]
    out = jnp.where(pos < new_len[:, None], out, pad_id)
    return out.astype(jnp.int32), new_len


def random_delete_with_mask(rng, tgt, pad_id=1, bos_id=0, eos_id=2):
    """Drop a random subset of non-special target tokens; return the packed
    result AND the kept-mask over the original positions (reference:
    translation_lev.py _random_delete, but mask-aware so the insertion
    oracle needs no DP)."""
    deletable = (tgt != pad_id) & (tgt != bos_id) & (tgt != eos_id)
    k1, k2 = jax.random.split(rng)
    score = jnp.where(deletable, jax.random.uniform(k1, tgt.shape), -1.0)
    n_del_max = jnp.sum(deletable, axis=1).astype(jnp.float32)
    k = (n_del_max * jax.random.uniform(k2, (tgt.shape[0],))).astype(jnp.int32)
    order = jnp.argsort(-score, axis=1)  # deletable positions first (desc)
    rank = jnp.argsort(order, axis=1)
    dele = deletable & (rank < k[:, None])
    keep = (tgt != pad_id) & ~dele
    packed, _ = compact_tokens(tgt, keep, pad_id)
    return packed, keep


def ins_oracle_leftmost(y_del, tgt, pad_id=1):
    """Canonical insertion oracle: greedy LEFTMOST matching of the packed
    subsequence ``y_del`` inside ``tgt``; counts[b, i] = number of target
    tokens to insert after packed token i.

    Determinism matters: libnat's suggested path is canonical, so dropping
    any one of several identical adjacent tokens yields the SAME label —
    using the actual kept-mask instead spreads the label mass over
    equivalent gaps and argmax decoding washes out on repeated tokens
    (observed: repeated-token targets decoded one token short)."""
    B, T = y_del.shape
    n_keep = jnp.sum((y_del != pad_id).astype(jnp.int32), axis=1)

    def one(a, b, nk):
        b_valid = b != pad_id

        def step(carry, bj):
            i, counts = carry
            b_tok, b_ok = bj
            match = b_ok & (i < nk) & (b_tok == a[jnp.minimum(i, T - 1)])
            dropped = b_ok & ~match
            counts = counts.at[jnp.maximum(i - 1, 0)].add(
                dropped.astype(jnp.int32)
            )
            return (i + match.astype(jnp.int32), counts), None

        (_, counts), _ = jax.lax.scan(
            step, (jnp.int32(0), jnp.zeros((T,), jnp.int32)), (b, b_valid)
        )
        return counts

    return jax.vmap(one)(y_del, tgt, n_keep)


@register_model("levenshtein_transformer")
class LevenshteinTransformerModel(nn.Module):
    cfg: LevenshteinConfig

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
        self.del_head = nn.Dense(2, dtype=cfg.dtype, name="del_head")
        self.ins_head = nn.Dense(cfg.max_ins, dtype=cfg.dtype, name="ins_head")

    def _feats(self, tokens, enc_out, enc_valid, deterministic=True):
        return self.decoder.forward_features(tokens, enc_out, enc_valid,
                                             deterministic)

    def _ins_logits(self, feats):
        pair = jnp.concatenate([feats[:, :-1], feats[:, 1:]], axis=-1)
        return self.ins_head(pair)  # (B, T-1, max_ins)

    def __call__(
        self,
        src_tokens: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_tokens: Optional[jnp.ndarray] = None,  # unused; LevT rolls in itself
        tgt_tokens: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        """Training forward: roll-in + three oracles
        (reference: levenshtein_transformer.py forward)."""
        cfg = self.cfg
        if tgt_tokens is None:
            tgt_tokens = prev_tokens
        enc = self.encoder(src_tokens, src_lengths, deterministic)
        enc_valid = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        eo = enc["encoder_out"]

        # bos anchor so insertions before the first real token are modelled
        # (the reference prepends bos to bitext targets, translation_lev.py:62)
        B = tgt_tokens.shape[0]
        tgt_tokens = jnp.concatenate(
            [jnp.full((B, 1), cfg.bos_id, tgt_tokens.dtype), tgt_tokens], axis=1
        )

        rng = self.make_rng("dropout")
        y_del, keep = random_delete_with_mask(
            rng, tgt_tokens, cfg.pad_id, cfg.bos_id, cfg.eos_id
        )

        # --- insertion step: predict placeholder counts on y_del ---------- #
        feats_del = self._feats(y_del, eo, enc_valid, deterministic)
        ins_logits = self._ins_logits(feats_del)  # (B, T-1, K)
        ins_tgt = ins_oracle_leftmost(y_del, tgt_tokens, cfg.pad_id)[:, :-1]
        ins_tgt = jnp.clip(ins_tgt, 0, cfg.max_ins - 1)
        n_keep = jnp.sum((y_del != cfg.pad_id).astype(jnp.int32), axis=1)
        ins_mask = jnp.arange(ins_logits.shape[1])[None, :] < (n_keep - 1)[:, None]

        # --- fill step: word prediction on the unk canvas ------------------ #
        canvas = jnp.where(keep, tgt_tokens, cfg.unk_id)
        canvas = jnp.where(tgt_tokens == cfg.pad_id, cfg.pad_id, canvas)
        feats_fill = self._feats(canvas, eo, enc_valid, deterministic)
        word_logits = self.decoder.output_logits(feats_fill)
        word_mask = canvas == cfg.unk_id

        # --- deletion step: roll-in from own predictions ------------------- #
        from s2t_tpu.ops.levenshtein import del_targets

        pred_fill = jnp.where(
            word_mask, jnp.argmax(jax.lax.stop_gradient(word_logits), -1), canvas
        ).astype(jnp.int32)
        del_logits = self.del_head(
            self._feats(pred_fill, eo, enc_valid, deterministic)
        )
        del_tgt = del_targets(pred_fill, tgt_tokens, cfg.pad_id)
        del_mask = pred_fill != cfg.pad_id

        return {
            "word_ins_logits": word_logits,
            "word_ins_mask": word_mask,
            "word_ins_tgt": tgt_tokens,  # bos-prefixed; overrides batch target
            "ins_logits": ins_logits,
            "ins_tgt": ins_tgt,
            "ins_mask": ins_mask,
            "del_logits": del_logits,
            "del_tgt": del_tgt,
            "del_mask": del_mask,
            **enc,
        }

    # -- refinement decoding hooks ------------------------------------------ #
    def encode(self, src_tokens, src_lengths, deterministic: bool = True):
        return self.encoder(src_tokens, src_lengths, deterministic)

    def init_canvas(self, encoder_out, enc_valid, Tmax: int):
        B = encoder_out.shape[0]
        tokens = jnp.full((B, Tmax), self.cfg.pad_id, jnp.int32)
        tokens = tokens.at[:, 0].set(self.cfg.bos_id)
        tokens = tokens.at[:, 1].set(self.cfg.eos_id)
        return tokens

    def refine_step(self, tokens, scores, encoder_out, enc_valid, step):
        """One delete→insert→fill round (reference: forward_decoder)."""
        cfg = self.cfg
        B, T = tokens.shape

        # 1) delete (never bos/eos/pad)
        feats = self._feats(tokens, encoder_out, enc_valid)
        del_pred = jnp.argmax(self.del_head(feats), axis=-1) == 1
        special = (
            (tokens == cfg.pad_id) | (tokens == cfg.bos_id) | (tokens == cfg.eos_id)
        )
        # skip the delete step on the first iteration (empty canvas)
        del_pred = del_pred & ~special & (step > 0)
        tokens, _ = compact_tokens(tokens, ~del_pred & (tokens != cfg.pad_id),
                                   cfg.pad_id)
        scores = jnp.zeros_like(scores)

        # 2) insert placeholders
        feats = self._feats(tokens, encoder_out, enc_valid)
        ins_logits = self._ins_logits(feats)
        counts = jnp.argmax(ins_logits, axis=-1).astype(jnp.int32)
        counts = jnp.concatenate(
            [counts, jnp.zeros((B, 1), jnp.int32)], axis=1
        )
        tokens, _ = insert_placeholders(tokens, counts, cfg.pad_id, cfg.unk_id)

        # 3) fill words
        feats = self._feats(tokens, encoder_out, enc_valid)
        lp = jax.nn.log_softmax(
            self.decoder.output_logits(feats).astype(jnp.float32), axis=-1
        )
        fill = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        fill_scores = jnp.max(lp, axis=-1)
        masked = tokens == cfg.unk_id
        tokens = jnp.where(masked, fill, tokens)
        scores = jnp.where(masked, fill_scores, scores)
        return tokens, scores


@register_model_architecture("levenshtein_transformer", "levenshtein_transformer")
def levenshtein_transformer(**kw) -> LevenshteinConfig:
    return LevenshteinConfig().replace(**kw)


@register_model_architecture("levenshtein_transformer", "levenshtein_transformer_small")
def levenshtein_transformer_small(**kw) -> LevenshteinConfig:
    return LevenshteinConfig(
        encoder_embed_dim=256, encoder_ffn_embed_dim=1024,
        encoder_attention_heads=4, decoder_embed_dim=256,
        decoder_ffn_embed_dim=1024, decoder_attention_heads=4,
    ).replace(**kw)

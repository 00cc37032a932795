"""Multilingual transformer: one model per language pair with parameter
sharing options.

(reference: fairseq/models/multilingual_transformer.py:23-228 —
MultilingualTransformerModel keyed by lang pair, with
--share-encoder-embeddings / --share-decoder-embeddings /
--share-encoders / --share-decoders; trained by
tasks/multilingual_translation.py's round-robin over pairs.)

TPU-first design: instead of a dict of N independent torch models stepped
one-per-pair in Python (reference FairseqMultiModel), this is ONE flax
module whose setup instantiates the per-language encoders/decoders (shared
instances when sharing is on — flax deduplicates parameters by module
instance) and whose ``__call__`` takes a round-robin zip batch
``{pair: sub_batch}`` and evaluates EVERY pair in a single traced graph.
One jit compile covers the whole round-robin update (the reference's
for-loop over pairs inside train_step, multilingual_translation.py), so
the MXU sees all pairs' matmuls back-to-back with no host round-trips.

For inference, ``pair_view(pair)`` returns a single-pair module with the
SAME parameter naming, so the full checkpoint's params apply directly and
the standard SequenceGenerator drives it like any TransformerModel.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from s2t_tpu.models.transformer import TransformerMTConfig, TransformerTextEncoder
from s2t_tpu.models.transformer_decoder import TransformerDecoder
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask


@dataclass(frozen=True)
class MultilingualTransformerConfig(TransformerMTConfig):
    # "src-tgt" pairs; the task passes these through build_model ctx
    lang_pairs: Tuple[str, ...] = ()
    # sharing flags (reference: multilingual_transformer.py:47-66)
    share_encoder_embeddings: bool = False
    share_decoder_embeddings: bool = False
    share_encoders: bool = False
    share_decoders: bool = False
    # per-language vocab sizes for separate dictionaries, e.g.
    # (("en", 32000), ("de", 40000)); empty = one joint dictionary of
    # vocab_size for every language (reference builds one dict per lang,
    # task.dicts; the joint-dict case is the common modern setup)
    lang_vocab_sizes: Tuple[Tuple[str, int], ...] = ()


def _uniq(seq):
    out = []
    for s in seq:
        if s not in out:
            out.append(s)
    return out


@register_model("multilingual_transformer")
class MultilingualTransformerModel(nn.Module):
    """All-pairs module (training) and single-pair view (inference).

    Parameter naming is identical in both modes, so ``pair_view(p)``
    applies against the full model's params (extra subtrees are ignored
    by flax's scope lookup).
    """

    cfg: MultilingualTransformerConfig
    pair: Optional[str] = None  # set -> single-pair inference view

    def _vocab(self, lang: str) -> int:
        for l, v in self.cfg.lang_vocab_sizes:
            if l == lang:
                return v
        return self.cfg.vocab_size

    def setup(self):
        cfg = self.cfg
        assert cfg.lang_pairs, "multilingual_transformer needs lang_pairs"
        pairs = [self.pair] if self.pair else list(cfg.lang_pairs)
        src_langs = _uniq(p.split("-")[0] for p in pairs)
        tgt_langs = _uniq(p.split("-")[1] for p in pairs)
        share_enc_emb = cfg.share_encoder_embeddings or cfg.share_all_embeddings
        share_dec_emb = cfg.share_decoder_embeddings or cfg.share_all_embeddings
        # reference: --share-encoders implies --share-encoder-embeddings
        share_enc_emb = share_enc_emb or cfg.share_encoders
        share_dec_emb = share_dec_emb or cfg.share_decoders

        enc_embed = dec_embed = None
        if cfg.share_all_embeddings:
            if cfg.encoder_embed_dim != cfg.decoder_embed_dim:
                raise ValueError(
                    "share_all_embeddings requires encoder_embed_dim =="
                    " decoder_embed_dim"
                )
            enc_embed = dec_embed = nn.Embed(
                cfg.vocab_size, cfg.encoder_embed_dim,
                embedding_init=nn.initializers.normal(cfg.encoder_embed_dim**-0.5),
                dtype=cfg.dtype, name="shared_embed",
            )
        else:
            if share_enc_emb:
                enc_embed = nn.Embed(
                    cfg.src_vocab, cfg.encoder_embed_dim,
                    embedding_init=nn.initializers.normal(
                        cfg.encoder_embed_dim**-0.5),
                    dtype=cfg.dtype, name="shared_encoder_embed",
                )
            if share_dec_emb:
                dec_embed = nn.Embed(
                    cfg.vocab_size, cfg.decoder_embed_dim,
                    embedding_init=nn.initializers.normal(
                        cfg.decoder_embed_dim**-0.5),
                    dtype=cfg.dtype, name="shared_decoder_embed",
                )

        def make_encoder(lang: str) -> TransformerTextEncoder:
            sub = dataclasses.replace(
                cfg, src_vocab_size=self._vocab(lang) if not share_enc_emb
                else cfg.src_vocab)
            name = "encoder_shared" if cfg.share_encoders else f"encoder_{lang}"
            return TransformerTextEncoder(sub, shared_embed=enc_embed, name=name)

        def make_decoder(lang: str) -> TransformerDecoder:
            name = "decoder_shared" if cfg.share_decoders else f"decoder_{lang}"
            return TransformerDecoder(
                vocab_size=self._vocab(lang) if not share_dec_emb
                else cfg.vocab_size,
                embed_dim=cfg.decoder_embed_dim,
                ffn_dim=cfg.decoder_ffn_embed_dim,
                num_layers=cfg.decoder_layers,
                num_heads=cfg.decoder_attention_heads, dropout=cfg.dropout,
                attention_dropout=cfg.attention_dropout,
                activation_dropout=cfg.activation_dropout,
                activation=cfg.activation_fn,
                normalize_before=cfg.decoder_normalize_before,
                share_input_output_embed=cfg.share_decoder_input_output_embed,
                no_scale_embedding=cfg.no_scale_embedding,
                learned_pos=cfg.decoder_learned_pos,
                layernorm_embedding=cfg.layernorm_embedding,
                max_positions=cfg.max_target_positions, pad_id=cfg.pad_id,
                shared_embed=dec_embed, dtype=cfg.dtype, name=name,
            )

        if cfg.share_encoders:
            shared_enc = make_encoder(src_langs[0])
            encoders = {l: shared_enc for l in src_langs}
        else:
            encoders = {l: make_encoder(l) for l in src_langs}
        if cfg.share_decoders:
            shared_dec = make_decoder(tgt_langs[0])
            decoders = {l: shared_dec for l in tgt_langs}
        else:
            decoders = {l: make_decoder(l) for l in tgt_langs}
        self.encoders = encoders
        self.decoders = decoders

    # ---- training: all pairs in one graph -------------------------------
    def _pair_forward(self, pair: str, src_tokens, src_lengths, prev_tokens,
                      deterministic: bool):
        src, tgt = pair.split("-")
        enc = self.encoders[src](src_tokens, src_lengths, deterministic)
        enc_mask = lengths_to_mask(
            enc["encoder_lengths"], enc["encoder_out"].shape[1])
        logits = self.decoders[tgt](
            prev_tokens, enc["encoder_out"], enc_mask, deterministic)
        return {"decoder_logits": logits, **enc}

    def __call__(self, pairs: Dict[str, Dict[str, jnp.ndarray]],
                 deterministic: bool = True):
        """``pairs``: round-robin zip batch {"en-de": {src_tokens, ...}}.

        Single-pair views take the plain (src_tokens, src_lengths,
        prev_tokens) signature instead (see pair_view).
        """
        if self.pair is not None or not isinstance(pairs, dict):
            raise ValueError(
                "all-pairs __call__ takes a {pair: batch} dict; use "
                "pair_view(pair) for single-pair forwards"
            )
        out = {}
        for pair in self.cfg.lang_pairs:
            if pair not in pairs:
                continue
            b = pairs[pair]
            out[pair] = self._pair_forward(
                pair, b["src_tokens"], b["src_lengths"], b["prev_tokens"],
                deterministic)
        return {"pairs": out}

    # ---- inference: single-pair TransformerModel interface --------------
    def pair_view(self, pair: str) -> "MultilingualTransformerModel":
        assert pair in self.cfg.lang_pairs, f"unknown lang pair {pair!r}"
        # parent=None: detach from the (possibly unbound) caller's module
        # context so the view is a fresh top-level module
        return type(self)(cfg=self.cfg, pair=pair, parent=None)

    def _pair_modules(self):
        src, tgt = self.pair.split("-")
        return self.encoders[src], self.decoders[tgt]

    def forward_pair(self, src_tokens, src_lengths, prev_tokens,
                     deterministic: bool = True):
        return self._pair_forward(self.pair, src_tokens, src_lengths,
                                  prev_tokens, deterministic)

    def encode(self, src_tokens, src_lengths, deterministic: bool = True):
        enc, _ = self._pair_modules()
        return enc(src_tokens, src_lengths, deterministic)

    def decode(self, prev_tokens, encoder_out, encoder_valid_mask):
        _, dec = self._pair_modules()
        return dec(prev_tokens, encoder_out, encoder_valid_mask, True)

    def decode_step(self, tokens, cache, index, encoder_out,
                    encoder_valid_mask, cross_kv=None):
        _, dec = self._pair_modules()
        return dec.step(tokens, cache, index, encoder_out,
                        encoder_valid_mask, cross_kv=cross_kv)

    def precompute_cross(self, encoder_out):
        _, dec = self._pair_modules()
        return dec.precompute_cross(encoder_out)

    def init_cache(self, batch_size: int, max_len: int):
        _, dec = self._pair_modules()
        return dec.init_cache(batch_size, max_len)


@register_model_architecture("multilingual_transformer",
                             "multilingual_transformer")
def multilingual_transformer(**kw) -> MultilingualTransformerConfig:
    return MultilingualTransformerConfig().replace(**kw)


@register_model_architecture("multilingual_transformer",
                             "multilingual_transformer_iwslt_de_en")
def multilingual_transformer_iwslt(**kw) -> MultilingualTransformerConfig:
    """reference: multilingual_transformer.py:221-228."""
    return MultilingualTransformerConfig(
        encoder_embed_dim=512, encoder_ffn_embed_dim=1024,
        encoder_attention_heads=4, decoder_embed_dim=512,
        decoder_ffn_embed_dim=1024, decoder_attention_heads=4,
    ).replace(**kw)

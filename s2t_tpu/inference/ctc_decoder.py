"""CTC decoders: greedy (on-device) and prefix beam search.

(reference: fairseq/models/speech_to_text/s2t_ctc.py:174-346 — CTCDecoder with
greedy collapse, ctcdecode beam, self-ensemble over inter-CTC logits,
intermediate-logit decode.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.ops.ctc import ctc_greedy_decode


class CTCDecoder:
    """Decode from encoder CTC logits.

    self_ensemble: average log-probs over inter-CTC logits + final
    (reference: s2t_ctc.py:176-192,313-320).
    intermediate_logit: decode from the k-th inter-CTC logit instead of final
    (reference: s2t_ctc.py:276-286).
    """

    def __init__(
        self,
        blank_id: int = 0,
        pad_id: int = 1,
        beam_size: int = 1,
        self_ensemble: bool = False,
        intermediate_logit: int = 0,
    ):
        self.blank_id = blank_id
        self.pad_id = pad_id
        self.beam_size = beam_size
        self.self_ensemble = self_ensemble
        self.intermediate_logit = intermediate_logit

    def select_logits(self, encoder_out: Dict[str, Any]) -> jnp.ndarray:
        logits = encoder_out["ctc_logits"]
        inter = encoder_out.get("inter_ctc_logits") or ()
        if self.intermediate_logit > 0 and len(inter) >= self.intermediate_logit:
            logits = inter[self.intermediate_logit - 1][1]
        if self.self_ensemble and len(inter) > 0:
            lps = [jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)]
            for entry in inter:
                l = entry[1]
                # PDS stage taps live at coarser time scales — the ensemble
                # can only average distributions on the final scale
                if l.shape[1] == logits.shape[1] and l.shape[-1] == logits.shape[-1]:
                    lps.append(jax.nn.log_softmax(l.astype(jnp.float32), axis=-1))
            return sum(lps) / len(lps)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def decode_greedy(
        self, encoder_out: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        log_probs = self.select_logits(encoder_out)
        return ctc_greedy_decode(
            log_probs, encoder_out["encoder_lengths"], self.blank_id, self.pad_id
        )

    def decode(self, encoder_out: Dict[str, Any]):
        if self.beam_size <= 1:
            return self.decode_greedy(encoder_out)
        log_probs = self.select_logits(encoder_out)
        return ctc_prefix_beam_decode(
            log_probs,
            encoder_out["encoder_lengths"],
            beam_size=self.beam_size,
            blank_id=self.blank_id,
            pad_id=self.pad_id,
        )


class CTCGenerator:
    """SequenceGenerator-compatible wrapper for encoder-only (NAST) models:
    one encoder pass, CTC greedy/beam decode (reference: the s2t_ctc model's
    CTCDecoder-as-decoder design, s2t_ctc.py:28-174)."""

    def __init__(self, model, decoder: "CTCDecoder",
                 input_keys=("features", "feat_lengths"), use_xctc: bool = False,
                 ngram_lm=None, lm_weight: float = 0.5,
                 word_bonus: float = 0.0, dictionary=None):
        self.model = model
        self.decoder = decoder
        self.input_keys = input_keys
        self.use_xctc = use_xctc
        # n-gram (ARPA/kenlm-style) shallow fusion: the jitted beam produces
        # the n-best, the LM re-ranks it on the host — the same division of
        # labour as the reference's ctcdecode+kenlm (s2t_ctc.py:215-231)
        self.ngram_lm = ngram_lm
        self.lm_weight = lm_weight
        self.word_bonus = word_bonus
        self.dictionary = dictionary
        self._jitted = {}

    def _build(self):
        import jax as _jax

        def run(params, features, lengths):
            enc = self.model.apply(
                {"params": params}, features, lengths, method=self.model.encode
            )
            if self.use_xctc and enc.get("xctc_logits") is not None:
                enc = {**enc, "ctc_logits": enc["xctc_logits"]}
            out = self.decoder.decode(enc)
            return out, enc

        return _jax.jit(run)

    def generate(self, params, batch):
        feats = batch[self.input_keys[0]]
        key = feats.shape
        if key not in self._jitted:
            self._jitted[key] = self._build()
        (tokens_or_pair), enc = self._jitted[key](
            params, feats, batch[self.input_keys[1]]
        )
        tokens, second = tokens_or_pair
        if tokens.ndim == 2:  # greedy: (B, T) + lengths -> add beam dim
            B, T = tokens.shape
            scores = jnp.zeros((B, 1), jnp.float32)
            return tokens[:, None, :], scores, enc
        if self.ngram_lm is not None and self.dictionary is not None:
            from s2t_tpu.data.ngram_lm import rescore_nbest

            tokens, second = rescore_nbest(
                np.asarray(tokens), np.asarray(second), self.dictionary,
                self.ngram_lm, self.lm_weight, self.word_bonus,
                pad_id=self.decoder.pad_id,
            )
            return jnp.asarray(tokens), jnp.asarray(second), enc
        return tokens, second, enc  # beam: (B, K, T), scores (B, K)


def ctc_prefix_beam_decode(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    beam_size: int = 5,
    blank_id: int = 0,
    pad_id: int = 1,
    prune_k: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched CTC prefix beam search, fully on device.

    The classic ragged-dict algorithm (the reference shells out to the
    ``ctcdecode`` C++ extension, s2t_ctc.py:215-231) re-shaped for TPU: the
    beam holds dense (B, K, T) token buffers with per-hypothesis blank/
    non-blank log-probs; each frame does a (K·k)-candidate expand + merge +
    top-K, all static shapes (k = ``prune_k`` emission candidates).

    Prefix merging is exact (up to beam pruning): an "extend" candidate whose
    resulting prefix equals an existing beam entry folds its non-blank mass
    into that entry via a K×K prefix-match, so the beam stays duplicate-free
    and scores are true prefix marginals.

    Returns (tokens (B, K, T) padded with pad_id, scores (B, K)).
    """
    B, T, V = log_probs.shape
    K = beam_size
    k = min(prune_k, V)
    NEG = -1e30

    # state: prefixes (B, K, T), prefix_len (B, K),
    # p_b (B, K) logprob of prefix ending in blank, p_nb ending in non-blank
    prefixes = jnp.full((B, K, T), pad_id, jnp.int32)
    plen = jnp.zeros((B, K), jnp.int32)
    p_b = jnp.concatenate([jnp.zeros((B, 1)), jnp.full((B, K - 1), NEG)], axis=1)
    p_nb = jnp.full((B, K), NEG)

    def step(carry, t):
        prefixes, plen, p_b, p_nb = carry
        lp_t = log_probs[:, t]  # (B, V)
        top_lp, top_tok = jax.lax.top_k(lp_t, k)  # (B, k)
        lp_blank = lp_t[:, blank_id]  # (B,)

        p_tot = jnp.logaddexp(p_b, p_nb)  # (B, K)

        # --- candidate 0: extend with blank (prefix unchanged) --------------
        cand0_pb = p_tot + lp_blank[:, None]  # (B, K)

        # last token of each prefix
        last = jnp.take_along_axis(
            prefixes, jnp.maximum(plen - 1, 0)[..., None], axis=2
        )[..., 0]
        last = jnp.where(plen > 0, last, -1)

        # --- candidates: extend with top-k tokens ----------------------------
        tok = top_tok[:, None, :]  # (B, 1, k)
        lp_e = top_lp[:, None, :]  # (B, 1, k)
        same_as_last = tok == last[..., None]  # (B, K, k)
        is_blank_tok = tok == blank_id
        # repeat token: only the blank-ending mass extends the prefix;
        # the non-blank mass merges into the same prefix (stays, handled below)
        extend_mass = jnp.where(same_as_last, p_b[..., None], p_tot[..., None])
        cand_ext_pnb = extend_mass + lp_e  # (B, K, k) new prefix ending non-blank
        cand_ext_pnb = jnp.where(is_blank_tok, NEG, cand_ext_pnb)
        # same-token repeat without boundary: merges into the ORIGINAL prefix
        stay_pnb = jnp.where(
            same_as_last, p_nb[..., None] + lp_e, NEG
        )  # (B, K, k)
        cand0_pnb = jax.nn.logsumexp(
            jnp.where(is_blank_tok, NEG, stay_pnb), axis=2
        )  # (B, K) non-blank mass staying on same prefix

        active = (t < lengths)[:, None]

        # --- merge: extend-candidates equal to an existing beam entry -------
        # merge_ab[a, b] = prefix_b == prefix_a + [*]  (length and prefix match)
        pos = jnp.arange(T)
        pa = prefixes[:, :, None, :]
        pb = prefixes[:, None, :, :]
        cmp_mask = pos[None, None, None, :] < plen[:, :, None, None]
        eq = jnp.all(jnp.where(cmp_mask, pa == pb, True), axis=-1)  # (B, K, K)
        len_ok = plen[:, None, :] == plen[:, :, None] + 1
        merge_ab = eq & len_ok
        # nt[a, b] = prefix_b's token at position plen_a (its last token)
        nt = jnp.take_along_axis(
            jnp.broadcast_to(pb, (B, K, K, T)),
            jnp.minimum(plen, T - 1)[:, :, None, None],
            axis=3,
        )[..., 0]  # (B, K, K)
        tok_match = nt[..., None] == top_tok[:, None, None, :]  # (B, Ka, Kb, k)
        target = merge_ab[..., None] & tok_match & active[:, :, None, None]
        add_mass = jax.nn.logsumexp(
            jnp.where(target, cand_ext_pnb[:, :, None, :], NEG), axis=(1, 3)
        )  # (B, Kb)
        cand0_pnb = jnp.logaddexp(cand0_pnb, add_mass)
        merged_away = jnp.any(target, axis=2)  # (B, Ka, k)
        cand_ext_pnb = jnp.where(merged_away, NEG, cand_ext_pnb)

        # --- assemble candidate pool: K "stay" + K*k "extend" ----------------
        stay_score = jnp.logaddexp(cand0_pb, cand0_pnb)  # (B, K)
        ext_score = cand_ext_pnb  # (B, K, k) (p_b = NEG for new extended prefix)

        all_scores = jnp.concatenate(
            [stay_score, ext_score.reshape(B, K * k)], axis=1
        )  # (B, K + K*k)
        # frames past length: force stay with unchanged scores
        keep_scores = jnp.concatenate(
            [jnp.logaddexp(p_b, p_nb), jnp.full((B, K * k), NEG)], axis=1
        )
        all_scores = jnp.where(active, all_scores, keep_scores)

        top_scores, sel = jax.lax.top_k(all_scores, K)  # (B, K)
        is_stay = sel < K
        parent = jnp.where(is_stay, sel, (sel - K) // k)
        ext_tok_idx = jnp.where(is_stay, 0, (sel - K) % k)
        new_tok = jnp.take_along_axis(top_tok, ext_tok_idx, axis=1)  # (B, K)

        new_prefixes = jnp.take_along_axis(prefixes, parent[..., None], axis=1)
        new_plen = jnp.take_along_axis(plen, parent, axis=1)
        # write the extension token at position new_plen
        write_pos = jnp.where(is_stay, T, new_plen)  # T = dropped
        bidx = jnp.arange(B)[:, None].repeat(K, 1)
        kidx = jnp.arange(K)[None, :].repeat(B, 0)
        new_prefixes = new_prefixes.at[bidx, kidx, write_pos].set(
            jnp.where(is_stay, 0, new_tok), mode="drop"
        )
        new_plen = jnp.where(is_stay, new_plen, new_plen + 1)

        sel_pb = jnp.where(
            is_stay,
            jnp.take_along_axis(jnp.where(active, cand0_pb, p_b), parent, axis=1),
            NEG,
        )
        stay_pnb_sel = jnp.take_along_axis(
            jnp.where(active, cand0_pnb, p_nb), parent, axis=1
        )
        ext_pnb_sel = jnp.take_along_axis(
            cand_ext_pnb.reshape(B, K * k),
            jnp.clip(sel - K, 0, K * k - 1),
            axis=1,
        )
        sel_pnb = jnp.where(is_stay, stay_pnb_sel, ext_pnb_sel)

        return (new_prefixes, new_plen, sel_pb, sel_pnb), None

    (prefixes, plen, p_b, p_nb), _ = jax.lax.scan(
        step, (prefixes, plen, p_b, p_nb), jnp.arange(T)
    )
    scores = jnp.logaddexp(p_b, p_nb)
    order = jnp.argsort(-scores, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    prefixes = jnp.take_along_axis(prefixes, order[..., None], axis=1)
    plen = jnp.take_along_axis(plen, order, axis=1)
    # mask beyond plen
    pos = jnp.arange(T)[None, None, :]
    prefixes = jnp.where(pos < plen[..., None], prefixes, pad_id)
    return prefixes, scores

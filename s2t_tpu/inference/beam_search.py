"""Batched beam search as a single jitted ``lax.scan`` over decode steps.

Replaces the reference's Python-loop SequenceGenerator
(reference: fairseq/sequence_generator.py:176-786): the entire beam loop —
incremental decode, top-k, beam reorder, EOS finalisation — compiles to one
XLA program; the KV cache is preallocated and reordered on device with
gathers (the reference reorders python dicts per step, :900-935).

Layout: everything is (B, K, ...) reshaped to (B*K, ...) for the model.
Scores follow fairseq semantics: cumulative log-prob; finalised hypotheses
ranked by score / length**lenpen (reference: search.py BeamSearch +
sequence_generator.py finalize_hypos :650-786).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


class BeamState(NamedTuple):
    alive_tokens: jnp.ndarray  # (B, K, L)
    alive_scores: jnp.ndarray  # (B, K) cumulative logprob
    finished_tokens: jnp.ndarray  # (B, K, L)
    finished_scores: jnp.ndarray  # (B, K) length-normalised
    finished_mask: jnp.ndarray  # (B, K) bool
    cache: Any  # pytree with leading dim B*K
    ctc_state: Any = ()  # CTCPrefixState when joint decoding, else ()


def _flatten_beam(x):
    return x.reshape((-1,) + x.shape[2:])


def _unflatten_beam(x, B, K):
    return x.reshape((B, K) + x.shape[1:])


def _gather_beams(tree, indices, B, K, flat: bool = None):
    """Gather beam dim: indices (B, K) select along old beam axis."""
    import os

    if flat is None:
        # experiment knob ("1"/"true"/"flat" or "einsum"); "0"/"false"/unset
        # keep the default take_along_axis form, the measured winner
        # (docs/design.md: four formulations table)
        env = os.environ.get("S2T_FLAT_BEAM_GATHER", "").strip().lower()
        flat = "einsum" if env == "einsum" else env in ("1", "true", "flat")
    if flat == "einsum":
        # reorder as a (K_new, K_old) one-hot matmul per sentence: each leaf
        # is read once and written once through the MXU
        onehot = jax.nn.one_hot(indices, K, dtype=jnp.bfloat16)  # (B, Kn, Ko)

        def gather_leaf(x):
            xb = x.reshape((B, K, -1))
            out = jnp.einsum("bkj,bjf->bkf", onehot.astype(x.dtype), xb)
            return out.reshape(x.shape)

        return jax.tree.map(gather_leaf, tree)
    if flat:
        rows = (jnp.arange(B)[:, None] * K + indices).reshape(-1)

        def gather_leaf(x):
            return jnp.take(x, rows, axis=0)

        return jax.tree.map(gather_leaf, tree)

    def gather_leaf(x):
        xb = x.reshape((B, -1) + x.shape[1:])
        out = jnp.take_along_axis(
            xb, indices.reshape(indices.shape + (1,) * (xb.ndim - 2)), axis=1
        )
        return out.reshape((-1,) + x.shape[1:])

    return jax.tree.map(gather_leaf, tree)


def length_penalty(lengths, lenpen: float):
    return jnp.power(lengths.astype(jnp.float32), lenpen)


def beam_search(
    decode_step: Callable[[jnp.ndarray, Any, jnp.ndarray], Tuple[jnp.ndarray, Any]],
    init_cache: Any,
    batch_size: int,
    beam_size: int,
    max_len: int,
    eos_id: int = 2,
    pad_id: int = 1,
    bos_id: int = 2,
    blank_id: int = 0,
    vocab_size: int = 0,
    lenpen: float = 1.0,
    min_len: int = 1,
    no_repeat_ngram_size: int = 0,
    step_scores_fn: Optional[Callable] = None,
    ctc_scorer=None,
    ctc_weight: float = 0.0,
    ctc_prune_k: int = 8,
    prefix_tokens: Optional[jnp.ndarray] = None,
    diverse_groups: int = 1,
    diverse_strength: float = 0.5,
    diverse_siblings_gamma: float = 0.0,
    reorder_fn: Optional[Callable] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run beam search.

    Args:
      decode_step: fn(tokens (N,1) int32, cache, index scalar) -> (logprobs
        (N, V) float32, new_cache), where N = batch*beam.  Must already apply
        temperature/log_softmax.
      init_cache: cache pytree with leading dim batch*beam.
      step_scores_fn: optional hook(logprobs, tokens_so_far, index) -> logprobs
        to blend external scores (LM fusion) in.
      ctc_scorer / ctc_weight: joint CTC rescoring (reference:
        --infer-ctc-weight, sequence_generator.py:355-386) — candidates are
        pruned to the decoder's top ``ctc_prune_k`` (+EOS), scored with the
        on-device prefix scorer, and blended as
        (1-w)·attention + w·CTC, fully inside the compiled step.

    Returns:
      tokens: (B, K, max_len) int32 — finished hypotheses, EOS-terminated,
        sorted best-first; pad after EOS.
      scores: (B, K) float32 — length-normalised scores, descending.
    """
    B, K = batch_size, beam_size
    L = max_len

    alive_tokens = jnp.full((B, K, L), pad_id, jnp.int32)
    # first input token is BOS/EOS (fairseq starts with EOS, generator :616);
    # one live seed per diverse group (all groups share the same start)
    if diverse_groups > 1:
        seed = (jnp.arange(K) % (K // diverse_groups)) == 0
        alive_scores = jnp.where(seed[None, :], 0.0, NEG_INF) * jnp.ones((B, 1))
    else:
        alive_scores = jnp.concatenate(
            [jnp.zeros((B, 1)), jnp.full((B, K - 1), NEG_INF)], axis=1
        )
    finished_tokens = jnp.full((B, K, L), pad_id, jnp.int32)
    finished_scores = jnp.full((B, K), NEG_INF)
    finished_mask = jnp.zeros((B, K), bool)

    ctc_state = ctc_scorer.init_state() if ctc_scorer is not None else ()
    state = BeamState(
        alive_tokens, alive_scores, finished_tokens, finished_scores,
        finished_mask, init_cache, ctc_state,
    )

    def step(state: BeamState, i):
        prev_tok = jnp.where(
            i == 0,
            jnp.full((B, K), bos_id, jnp.int32),
            state.alive_tokens[:, :, jnp.maximum(i - 1, 0)],
        )
        logprobs, new_cache = decode_step(
            _flatten_beam(prev_tok)[:, None], state.cache, i
        )  # (B*K, V)
        V = logprobs.shape[-1]
        logprobs = _unflatten_beam(logprobs, B, K)  # (B, K, V)
        if step_scores_fn is not None:
            logprobs = step_scores_fn(logprobs, state.alive_tokens, i)

        # min-len: no EOS before min_len
        logprobs = jnp.where(
            (i < min_len) & (jnp.arange(V)[None, None, :] == eos_id),
            NEG_INF,
            logprobs,
        )
        # never emit pad; never emit the blank/bos index (the reference
        # fork bans index 0 unconditionally — sequence_generator.py:74,401:
        # self.blank defaults to 0, which is also <s> in fairseq dicts)
        logprobs = logprobs.at[:, :, pad_id].set(NEG_INF)
        if blank_id is not None and blank_id >= 0:
            logprobs = logprobs.at[:, :, blank_id].set(NEG_INF)
        # at max_len, force EOS so every hypothesis terminates
        # (reference: sequence_generator.py max-len forcing)
        logprobs = jnp.where(
            (i == L - 1) & (jnp.arange(V)[None, None, :] != eos_id),
            NEG_INF,
            logprobs,
        )

        if no_repeat_ngram_size > 0:
            logprobs = _ngram_block(
                logprobs, state.alive_tokens, i, no_repeat_ngram_size, NEG_INF
            )

        if prefix_tokens is not None:
            # force the hypothesis to start with the given prefix
            # (reference: sequence_generator.py:128,616 _prefix_tokens)
            Pfx = prefix_tokens.shape[1]
            forced = jnp.take(
                prefix_tokens, jnp.minimum(i, Pfx - 1), axis=1
            )  # (B,)
            active = (i < Pfx) & (forced != pad_id)
            allow = jax.nn.one_hot(forced, V, dtype=bool)  # (B, V)
            # keep the forced token's own score (fairseq keeps its lprob)
            logprobs = jnp.where(
                active[:, None, None] & ~allow[:, None, :], NEG_INF, logprobs
            )

        if diverse_groups > 1:
            # Diverse Beam Search (Vijayakumar et al.; reference search.py:552):
            # beams split into G groups; group g is penalised by
            # strength * count of tokens groups <g already picked this step.
            G = diverse_groups
            Kg = K // G
            lp_groups = logprobs.reshape(B, G, Kg, V)
            div_buf = jnp.zeros((B, V), jnp.float32)
            penalised = []
            for g in range(G):
                lp_g = lp_groups[:, g] - diverse_strength * div_buf[:, None, :]
                penalised.append(lp_g)
                # tokens group g would pick: its top 2*Kg candidates — the
                # reference's inner BeamSearch.step returns 2*beam
                # candidates and the diversity buffer counts ALL of them
                # (search.py:597-613 scatter_add over indices_buf)
                total_g = state.alive_scores.reshape(B, G, K // G)[:, g][..., None] + lp_g
                kk = min(2 * Kg, Kg * V - 1)
                _, top_g = jax.lax.top_k(total_g.reshape(B, Kg * V), kk)
                picked = jax.nn.one_hot(top_g % V, V, dtype=jnp.float32).sum(1)
                div_buf = div_buf + picked
            logprobs = jnp.stack(penalised, axis=1).reshape(B, K, V)

        if diverse_siblings_gamma > 0:
            # Diverse Siblings (Li & Jurafsky; reference search.py:746):
            # within each beam, the r-th best continuation is penalised by
            # gamma*r, discouraging all K survivors sharing one parent.  Only
            # the per-beam top 2K can ever be selected, so the rest are masked.
            kk = min(2 * K, V)
            s_lp, s_idx = jax.lax.top_k(logprobs, kk)  # (B, K, kk)
            s_lp = s_lp - diverse_siblings_gamma * jnp.arange(
                1, kk + 1, dtype=s_lp.dtype
            )
            sib_b = jnp.arange(B)[:, None, None]
            sib_k = jnp.arange(K)[None, :, None]
            logprobs = jnp.full_like(logprobs, NEG_INF).at[
                sib_b, sib_k, s_idx
            ].set(s_lp)

        cand_idx = cand_new_r = cand_psi = None
        if ctc_scorer is not None:
            # prune to decoder top-k plus EOS, score with the CTC prefix
            # lattice, blend, and scatter back into the (B, K, V) frame
            kc = ctc_prune_k
            dec_cand, cand_idx = jax.lax.top_k(logprobs, kc - 1)
            eos_col = jnp.full((B, K, 1), eos_id, cand_idx.dtype)
            cand_idx = jnp.concatenate([cand_idx, eos_col], axis=-1)
            dec_cand = jnp.concatenate(
                [dec_cand, logprobs[:, :, eos_id : eos_id + 1]], axis=-1
            )
            delta, cand_new_r, cand_psi = ctc_scorer.score_candidates(
                state.ctc_state, cand_idx.reshape(B * K, kc)
            )
            delta = delta.reshape(B, K, kc)
            blended = (1.0 - ctc_weight) * dec_cand + ctc_weight * delta
            b_ix = jnp.arange(B)[:, None, None]
            k_ix = jnp.arange(K)[None, :, None]
            logprobs = jnp.full_like(logprobs, NEG_INF).at[
                b_ix, k_ix, cand_idx
            ].set(blended)

        total = state.alive_scores[:, :, None] + logprobs  # (B, K, V)

        # take top 2K over K*V so that K non-EOS survive even if K EOS appear;
        # with diverse groups, candidates are selected per group (2Kg each) so
        # no group can be starved by another (reference: search.py:552)
        if diverse_groups > 1:
            G = diverse_groups
            Kg = K // G
            total_g = total.reshape(B, G, Kg * V)
            ts_g, ti_g = jax.lax.top_k(total_g, 2 * Kg)  # (B, G, 2Kg)
            beam_idx = (ti_g // V) + (jnp.arange(G) * Kg)[None, :, None]
            top_scores = ts_g.reshape(B, 2 * K)
            beam_idx = beam_idx.reshape(B, 2 * K)
            tok_idx = (ti_g % V).reshape(B, 2 * K)
        else:
            flat = total.reshape(B, K * V)
            top_scores, top_idx = jax.lax.top_k(flat, 2 * K)  # (B, 2K)
            beam_idx = top_idx // V
            tok_idx = top_idx % V

        # candidate token rows
        cand_tokens = jnp.take_along_axis(state.alive_tokens, beam_idx[..., None], axis=1)
        cand_tokens = jnp.where(
            (jnp.arange(L)[None, None, :] == i), tok_idx[..., None], cand_tokens
        )
        is_eos = tok_idx == eos_id

        # ---- update finished set with EOS candidates -----------------------
        norm = length_penalty(jnp.asarray(i + 1), lenpen)
        eos_norm_scores = jnp.where(is_eos, top_scores / norm, NEG_INF)
        # merge (finished_K, 2K candidates) -> keep top K
        all_fin_scores = jnp.concatenate([state.finished_scores, eos_norm_scores], axis=1)
        all_fin_tokens = jnp.concatenate([state.finished_tokens, cand_tokens], axis=1)
        all_fin_mask = jnp.concatenate(
            [state.finished_mask, is_eos], axis=1
        )
        fin_scores, fin_sel = jax.lax.top_k(all_fin_scores, K)
        fin_tokens = jnp.take_along_axis(all_fin_tokens, fin_sel[..., None], axis=1)
        fin_mask = jnp.take_along_axis(all_fin_mask, fin_sel, axis=1) & (
            fin_scores > NEG_INF / 2
        )

        # ---- alive set: top K non-EOS candidates ---------------------------
        alive_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        if diverse_groups > 1:
            # keep Kg alive per group (candidate layout is group-major)
            G = diverse_groups
            Kg = K // G
            acs_g = alive_cand_scores.reshape(B, G, 2 * Kg)
            s_g, sel_g = jax.lax.top_k(acs_g, Kg)
            alive_sel = (sel_g + (jnp.arange(G) * 2 * Kg)[None, :, None]).reshape(B, K)
            alive_sel_scores = s_g.reshape(B, K)
        else:
            alive_sel_scores, alive_sel = jax.lax.top_k(alive_cand_scores, K)
        new_alive_tokens = jnp.take_along_axis(
            cand_tokens, alive_sel[..., None], axis=1
        )
        new_beam_idx = jnp.take_along_axis(beam_idx, alive_sel, axis=1)
        if reorder_fn is not None:
            # lazy reorder: big cache leaves stay in place; only the tiny
            # ancestry map moves (modules/attention.py cache_ancestry)
            new_cache = reorder_fn(new_cache, new_beam_idx, i)
        else:
            new_cache = _gather_beams(new_cache, new_beam_idx, B, K)

        new_ctc_state = state.ctc_state
        if ctc_scorer is not None:
            alive_tok = jnp.take_along_axis(tok_idx, alive_sel, axis=1)  # (B, K)
            cand_idx_parent = jnp.take_along_axis(
                cand_idx, new_beam_idx[..., None], axis=1
            )  # (B, K, kc)
            cand_pos = jnp.argmax(
                cand_idx_parent == alive_tok[..., None], axis=-1
            )  # position of the chosen token in its parent's candidate list
            new_ctc_state = ctc_scorer.select(
                state.ctc_state, cand_idx, cand_new_r, cand_psi,
                new_beam_idx, cand_pos, alive_tok,
            )

        return (
            BeamState(
                new_alive_tokens, alive_sel_scores, fin_tokens, fin_scores,
                fin_mask, new_cache, new_ctc_state,
            ),
            None,
        )

    # Hybrid loop with fairseq's early termination (sequence_generator.py
    # finalize logic): inner lax.scan chunks keep full step throughput; an
    # outer while_loop checks between chunks whether every sentence already
    # holds K finished hypotheses that no alive beam's optimistic bound can
    # beat, and stops.  Real decodes finish in ~hypothesis-length steps
    # instead of always max_len; the worst case pays one cheap check per
    # CHUNK steps.
    CHUNK = 16
    n_full = L // CHUNK
    rem = L % CHUNK

    def should_continue(state, i):
        all_filled = jnp.all(state.finished_mask)
        # optimistic bound: cumulative logprobs are <= 0 and only decrease, so
        # any future finalized score <= alive_score / max attainable norm
        # (norm(L) for lenpen > 0, norm(i) for lenpen <= 0)
        norm_bound = jnp.maximum(
            length_penalty(jnp.maximum(i, 1), lenpen),
            length_penalty(jnp.asarray(L), lenpen),
        )
        bound = state.alive_scores / norm_bound
        can_improve = jnp.any(
            jnp.max(bound, axis=1) > jnp.min(state.finished_scores, axis=1)
        )
        return ~all_filled | can_improve

    # TIERED KV-CACHE PREFIX: the per-step cache reorder and the attention
    # cache reads are the decode loop's dominant traffic, and both scale
    # with the cache LENGTH — yet at step i only positions <= i hold data.
    # Static shapes forbid slicing to i, but the chunked loop gives static
    # bounds: the full-chunk region is split into a few TIERS; within a
    # tier all cache work runs on a lax.slice'd prefix of l_hi positions
    # (the suffix is still unwritten), written back into the full buffer at
    # tier exit.  Exact-by-construction (every touched index < l_hi), and
    # reorder+read bytes become ~2/3 triangular instead of rectangular.
    # Tier count stays small because each distinct l_hi traces its own
    # step body (compile time).  Skipped for the lazy-ancestry path, whose
    # (B, K, L) map would need its own slicing rule.
    def _sliceable(x):
        # eager-only: the lazy path's (B, K, L) ancestry map indexes length
        # on axis 2 and must not be touched
        if reorder_fn is not None:
            return False
        return hasattr(x, "ndim") and x.ndim >= 2 and x.shape[1] == L

    def slice_cache(cache, l_hi):
        return jax.tree.map(
            lambda x: jax.lax.slice_in_dim(x, 0, l_hi, axis=1)
            if _sliceable(x) else x,
            cache,
        )

    def restore_cache(full, part):
        return jax.tree.map(
            lambda xf, xp: jax.lax.dynamic_update_slice_in_dim(
                xf, xp, 0, axis=1
            ) if _sliceable(xf) else xp,
            full, part,
        )

    def run_tiers(state, edges):
        ci = jnp.zeros((), jnp.int32)
        for hi_chunks in edges:
            l_hi = hi_chunks * CHUNK
            part = state._replace(cache=slice_cache(state.cache, l_hi))

            def cond(carry, hi_chunks=hi_chunks):
                s, c = carry
                return (c < hi_chunks) & should_continue(s, c * CHUNK)

            def body(carry):
                s, c = carry
                s, _ = jax.lax.scan(step, s, c * CHUNK + jnp.arange(CHUNK))
                return s, c + 1

            part, ci = jax.lax.while_loop(cond, body, (part, ci))
            state = part._replace(
                cache=restore_cache(state.cache, part.cache)
            )
        return state

    if n_full > 0:
        if reorder_fn is None and n_full >= 3:
            third = -(-n_full // 3)
            edges = sorted({third, 2 * third, n_full})
        else:
            edges = [n_full]
        state = run_tiers(state, edges)
    if rem:
        def tail(s):
            s, _ = jax.lax.scan(step, s, n_full * CHUNK + jnp.arange(rem))
            return s

        state = jax.lax.cond(
            should_continue(state, n_full * CHUNK), tail, lambda s: s, state
        )

    # any still-alive beams compete with finished ones at final length norm
    final_norm = length_penalty(jnp.asarray(L), lenpen)
    alive_final = state.alive_scores / final_norm
    all_scores = jnp.concatenate([state.finished_scores, alive_final], axis=1)
    all_tokens = jnp.concatenate([state.finished_tokens, state.alive_tokens], axis=1)
    best_scores, sel = jax.lax.top_k(all_scores, K)
    best_tokens = jnp.take_along_axis(all_tokens, sel[..., None], axis=1)

    # pad everything after the first EOS
    eos_pos = jnp.argmax(best_tokens == eos_id, axis=-1)
    has_eos = jnp.any(best_tokens == eos_id, axis=-1)
    eos_pos = jnp.where(has_eos, eos_pos, L - 1)
    pos = jnp.arange(L)[None, None, :]
    best_tokens = jnp.where(pos > eos_pos[..., None], pad_id, best_tokens)
    return best_tokens, best_scores


def _ngram_block(logprobs, tokens, i, n, neg):
    """Mask continuations that would repeat an n-gram (in-XLA replacement for
    the reference's CUDA ngram_repeat_block, fairseq/clib/cuda/*)."""
    B, K, V = logprobs.shape
    L = tokens.shape[-1]
    if n <= 1:
        return logprobs
    # context: last n-1 tokens ending at i-1
    def ctx_at(offset_start):
        idx = offset_start[None, None, :] if offset_start.ndim == 1 else offset_start
        return idx

    # gather previous (n-1)-gram for the current position
    prev_idx = i - (n - 1) + jnp.arange(n - 1)  # positions of current context
    prev_idx = jnp.clip(prev_idx, 0, L - 1)
    cur_ctx = tokens[:, :, prev_idx]  # (B, K, n-1)

    # all historical n-gram starts s in [0, i-n]: context tokens[s:s+n-1], next tokens[s+n-1]
    starts = jnp.arange(L)  # static upper bound; mask invalid
    ctx_idx = starts[:, None] + jnp.arange(n - 1)[None, :]  # (L, n-1)
    ctx_idx = jnp.clip(ctx_idx, 0, L - 1)
    hist_ctx = tokens[:, :, ctx_idx]  # (B, K, L, n-1)
    next_idx = jnp.clip(starts + (n - 1), 0, L - 1)
    hist_next = tokens[:, :, next_idx]  # (B, K, L)
    valid = (starts + (n - 1) <= i - 1)[None, None, :]  # n-gram fully in history
    match = jnp.all(hist_ctx == cur_ctx[:, :, None, :], axis=-1) & valid  # (B, K, L)
    # mask each matched next token
    banned = jax.nn.one_hot(hist_next, V, dtype=bool) & match[..., None]
    banned = jnp.any(banned, axis=2)  # (B, K, V)
    return jnp.where(banned, neg, logprobs)

"""Lexically constrained beam search, fully on device.

(reference: fairseq/search.py:211 LexicallyConstrainedBeamSearch — Dynamic
Beam Allocation, Post & Vilar 2018 — with ragged per-hypothesis
``ConstraintState`` python objects updated on the host every step.)

TPU-native redesign: constraint state is a dense tensor recurrence carried
through one jitted ``lax.scan``:

  done   (B, K, C)  bool   — constraint fully emitted
  active (B, K)     int32  — index of the in-progress multi-token phrase, or -1
  pos    (B, K)     int32  — matched length within the active phrase

Beam allocation is two-bank: each step, half the beam is selected purely by
score ("free" bank) and half from candidates that *advance* constraint
progress ("progress" bank; trivially all candidates once every constraint is
met).  EOS is masked until a hypothesis has met all its constraints, so every
finished hypothesis contains every constraint phrase.  This collapses DBA's
per-step dynamic bank sizing into a static split that XLA can compile, while
keeping its two invariants: progress candidates can never be starved by
high-scoring unconstrained ones, and scores are never distorted (banks gate
*selection*, not the cumulative log-probs).

Constraints are a (B, C, Lc) int32 tensor padded with ``pad_id``; use
``pack_constraints`` to build it.  ``ordered=True`` requires phrases to be
emitted in the given order (reference's ordered mode).
"""

from __future__ import annotations

from typing import Any, Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.inference.beam_search import (
    NEG_INF,
    _flatten_beam,
    _gather_beams,
    _unflatten_beam,
    length_penalty,
)


def pack_constraints(
    batch_constraints: List[List[List[int]]], pad_id: int = 1
) -> np.ndarray:
    """[[phrase ids...] per constraint] per sentence -> (B, C, Lc) array."""
    B = len(batch_constraints)
    C = max((len(cs) for cs in batch_constraints), default=1) or 1
    Lc = max(
        (len(p) for cs in batch_constraints for p in cs), default=1
    ) or 1
    out = np.full((B, C, Lc), pad_id, np.int32)
    for b, cs in enumerate(batch_constraints):
        for c, phrase in enumerate(cs):
            out[b, c, : len(phrase)] = phrase
    return out


class ConstrainedState(NamedTuple):
    alive_tokens: jnp.ndarray  # (B, K, L)
    alive_scores: jnp.ndarray  # (B, K)
    done: jnp.ndarray  # (B, K, C) bool
    active: jnp.ndarray  # (B, K) int32, -1 = none
    pos: jnp.ndarray  # (B, K) int32
    finished_tokens: jnp.ndarray  # (B, K, L)
    finished_scores: jnp.ndarray  # (B, K)
    finished_mask: jnp.ndarray  # (B, K) bool
    cache: Any


def constrained_beam_search(
    decode_step: Callable,
    init_cache: Any,
    constraints: jnp.ndarray,  # (B, C, Lc) int32, pad-padded
    batch_size: int,
    beam_size: int,
    max_len: int,
    eos_id: int = 2,
    pad_id: int = 1,
    bos_id: int = 2,
    blank_id: int = 0,
    lenpen: float = 1.0,
    min_len: int = 1,
    ordered: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens (B, K, L) best-first, scores (B, K))."""
    B, K, L = batch_size, beam_size, max_len
    C, Lc = constraints.shape[1], constraints.shape[2]
    Kp = K // 2  # progress bank
    Kf = K - Kp  # free bank
    if Kp == 0:
        Kp, Kf = 1, max(K - 1, 1)

    con_len = jnp.sum(constraints != pad_id, axis=-1)  # (B, C)
    con_exists = con_len > 0  # (B, C)

    alive_tokens = jnp.full((B, K, L), pad_id, jnp.int32)
    alive_scores = jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.full((B, K - 1), NEG_INF)], axis=1
    )
    state = ConstrainedState(
        alive_tokens,
        alive_scores,
        done=~jnp.broadcast_to(con_exists[:, None, :], (B, K, C)),
        active=jnp.full((B, K), -1, jnp.int32),
        pos=jnp.zeros((B, K), jnp.int32),
        finished_tokens=jnp.full((B, K, L), pad_id, jnp.int32),
        finished_scores=jnp.full((B, K), NEG_INF),
        finished_mask=jnp.zeros((B, K), bool),
        cache=init_cache,
    )

    def startable(done, active):
        """(B, K, C) bool — constraints a beam may begin now."""
        can = ~done & con_exists[:, None, :] & (active < 0)[:, :, None]
        if ordered:
            # only the first not-done constraint may start
            first_undone = jnp.argmax(~done, axis=-1)  # (B, K)
            can = can & (jnp.arange(C)[None, None, :] == first_undone[..., None])
        return can

    def step(state: ConstrainedState, i):
        prev_tok = jnp.where(
            i == 0,
            jnp.full((B, K), bos_id, jnp.int32),
            state.alive_tokens[:, :, jnp.maximum(i - 1, 0)],
        )
        logprobs, new_cache = decode_step(
            _flatten_beam(prev_tok)[:, None], state.cache, i
        )
        V = logprobs.shape[-1]
        logprobs = _unflatten_beam(logprobs, B, K)

        all_done = jnp.all(state.done, axis=-1)  # (B, K)
        vocab = jnp.arange(V)[None, None, :]
        # EOS only once all constraints are met (and not before min_len) —
        # EXCEPT at the horizon, where force-EOS takes precedence so an
        # unsatisfiable constraint set still yields a best-effort hypothesis
        # (the reference's finalize-at-max-len)
        logprobs = jnp.where(
            (vocab == eos_id)
            & (~all_done[..., None] | (i < min_len))
            & (i < L - 1),
            NEG_INF,
            logprobs,
        )
        logprobs = logprobs.at[:, :, pad_id].set(NEG_INF)
        if blank_id is not None and blank_id >= 0:
            logprobs = logprobs.at[:, :, blank_id].set(NEG_INF)
        logprobs = jnp.where(
            (i == L - 1) & (vocab != eos_id), NEG_INF, logprobs
        )

        # ---- progress mask: tokens that advance constraint coverage --------
        cont_tok = constraints[
            jnp.arange(B)[:, None],
            jnp.maximum(state.active, 0),
            jnp.clip(state.pos, 0, Lc - 1),
        ]  # (B, K) next token of the active phrase
        prog = jnp.zeros((B, K, V), bool)
        has_active = state.active >= 0
        prog = prog | (
            jax.nn.one_hot(cont_tok, V, dtype=bool) & has_active[..., None]
        )
        can_start = startable(state.done, state.active)  # (B, K, C)
        first_toks = constraints[:, :, 0]  # (B, C)
        start_hot = jax.nn.one_hot(first_toks, V, dtype=bool)  # (B, C, V)
        prog = prog | jnp.any(
            start_hot[:, None, :, :] & can_start[..., None], axis=2
        )
        # satisfied hypotheses: any continuation (incl. EOS) counts as progress
        prog = prog | all_done[..., None]

        total = state.alive_scores[:, :, None] + logprobs  # (B, K, V)
        flat = total.reshape(B, K * V)

        # free bank: best 2*Kf anywhere
        free_scores, free_idx = jax.lax.top_k(flat, 2 * Kf)
        # progress bank: ranked by constraint tokens met FIRST, score second
        # (DBA's bank ladder — otherwise a fresh phrase start from a
        # high-scoring free beam outranks the mid-phrase continuation every
        # step and multi-token phrases never complete).  The bank bonus is a
        # selection key only; true cumulative scores are gathered after.
        met_parent = jnp.sum(
            jnp.where(state.done & con_exists[:, None, :], con_len[:, None, :], 0),
            axis=-1,
        ) + jnp.where(state.active >= 0, state.pos, 0)  # (B, K)
        BONUS = 1e5
        met_after = met_parent[:, :, None] + jnp.where(
            prog & ~all_done[..., None], 1, 0
        )
        sel_flat = jnp.where(
            prog.reshape(B, K * V),
            flat + BONUS * met_after.reshape(B, K * V).astype(flat.dtype),
            NEG_INF,
        )
        # dedup against the free candidates that will actually survive as
        # alive beams — the first Kf NON-EOS entries of the free list (EOS
        # candidates go to the finished set, not the beam; alive selection
        # below masks them).  Blanking all 2*Kf would starve progress
        # candidates the free bank lists but never keeps; blanking only the
        # top Kf positions would let an EOS-displaced survivor be selected
        # twice, duplicating alive beams
        free_is_eos = (free_idx % V) == eos_id
        nf_rank = jnp.cumsum((~free_is_eos).astype(jnp.int32), axis=1)
        # blank (a) the free bank's alive survivors (first Kf non-EOS) and
        # (b) every EOS the free bank lists — EOS candidates go straight to
        # the finished set, so a progress-bank copy would duplicate the
        # finished hypothesis and displace a distinct n-best entry
        kept_free = free_is_eos | (nf_rank <= Kf)  # (B, 2Kf)
        b_sel = jnp.arange(B)[:, None]
        cur = jnp.take_along_axis(sel_flat, free_idx, axis=1)
        sel_flat = sel_flat.at[b_sel, free_idx].set(
            jnp.where(kept_free, NEG_INF, cur)
        )
        prog_sel_scores, prog_idx = jax.lax.top_k(sel_flat, 2 * Kp)
        prog_true = jnp.take_along_axis(flat, prog_idx, axis=1)
        prog_true = jnp.where(prog_sel_scores > NEG_INF / 2, prog_true, NEG_INF)

        cand_scores = jnp.concatenate([free_scores, prog_true], axis=1)
        # selection-ordering scores (bank-bonused on the progress half)
        cand_sel_scores = jnp.concatenate([free_scores, prog_sel_scores], axis=1)
        cand_flat_idx = jnp.concatenate([free_idx, prog_idx], axis=1)
        n_cand = cand_scores.shape[1]  # 2K
        beam_idx = cand_flat_idx // V
        tok_idx = cand_flat_idx % V

        cand_tokens = jnp.take_along_axis(
            state.alive_tokens, beam_idx[..., None], axis=1
        )
        cand_tokens = jnp.where(
            jnp.arange(L)[None, None, :] == i, tok_idx[..., None], cand_tokens
        )
        is_eos = (tok_idx == eos_id) & (cand_scores > NEG_INF / 2)

        # ---- finished set ---------------------------------------------------
        norm = length_penalty(jnp.asarray(i + 1), lenpen)
        # horizon-forced EOS can finalize a hypothesis with unmet
        # constraints (best-effort output for an unsatisfiable set); rank it
        # strictly below every satisfying hypothesis, more-met first
        total_con = jnp.sum(jnp.where(con_exists, con_len, 0), axis=-1)  # (B,)
        met_cand = jnp.take_along_axis(met_parent, beam_idx, axis=1)
        unmet = (total_con[:, None] - met_cand).astype(jnp.float32)  # (B, 2K)
        eos_norm = jnp.where(is_eos, cand_scores / norm - 1e4 * unmet, NEG_INF)
        all_fin_scores = jnp.concatenate([state.finished_scores, eos_norm], 1)
        all_fin_tokens = jnp.concatenate([state.finished_tokens, cand_tokens], 1)
        all_fin_mask = jnp.concatenate([state.finished_mask, is_eos], 1)
        fin_scores, fin_sel = jax.lax.top_k(all_fin_scores, K)
        fin_tokens = jnp.take_along_axis(all_fin_tokens, fin_sel[..., None], 1)
        fin_mask = jnp.take_along_axis(all_fin_mask, fin_sel, 1) & (
            fin_scores > NEG_INF / 2
        )

        # ---- alive selection: Kf from the free half, Kp from the progress
        # half (candidate layout is [free 2Kf | progress 2Kp]); the progress
        # half is ordered by the bank-bonused key, scores kept true ----------
        alive_cand = jnp.where(is_eos, NEG_INF, cand_sel_scores)
        _, f_sel = jax.lax.top_k(alive_cand[:, : 2 * Kf], Kf)
        _, p_sel = jax.lax.top_k(alive_cand[:, 2 * Kf :], Kp)
        if K == 1:
            # single beam: the free-then-progress concat would truncate to
            # the free pick and constraints would never be enforced; DBA
            # degenerates to constrained greedy — the progress candidate
            # takes the one slot whenever it exists
            p_val = jnp.take_along_axis(
                alive_cand[:, 2 * Kf :], p_sel[:, :1], axis=1
            )
            alive_sel = jnp.where(
                p_val > NEG_INF / 2, p_sel[:, :1] + 2 * Kf, f_sel[:, :1]
            )
        else:
            alive_sel = jnp.concatenate(
                [f_sel, p_sel + 2 * Kf], axis=1
            )[:, :K]
        new_alive_scores = jnp.take_along_axis(
            jnp.where(is_eos, NEG_INF, cand_scores), alive_sel, axis=1
        )

        new_alive_tokens = jnp.take_along_axis(
            cand_tokens, alive_sel[..., None], axis=1
        )
        new_beam_idx = jnp.take_along_axis(beam_idx, alive_sel, axis=1)
        new_tok = jnp.take_along_axis(tok_idx, alive_sel, axis=1)  # (B, K)
        new_cache = _gather_beams(new_cache, new_beam_idx, B, K)

        # ---- constraint-state transition for the chosen token --------------
        b_ix = jnp.arange(B)[:, None]
        g_done = jnp.take_along_axis(state.done, new_beam_idx[..., None], 1)
        g_active = jnp.take_along_axis(state.active, new_beam_idx, 1)
        g_pos = jnp.take_along_axis(state.pos, new_beam_idx, 1)

        has_act = g_active >= 0
        act_next = constraints[b_ix, jnp.maximum(g_active, 0), jnp.clip(g_pos, 0, Lc - 1)]
        act_len = con_len[b_ix, jnp.maximum(g_active, 0)]
        continues = has_act & (new_tok == act_next)
        completes = continues & (g_pos + 1 >= act_len)

        # a token that abandons the active phrase may itself start another
        # constraint, so start-eligibility is computed as if the abandoned
        # phrase were already dropped
        eff_active = jnp.where(continues, g_active, -1)
        can_start = startable(g_done, eff_active)  # (B, K, C)
        starts_c = can_start & (constraints[:, None, :, 0] == new_tok[..., None])
        any_start = jnp.any(starts_c, axis=-1) & ~continues
        start_idx = jnp.argmax(starts_c, axis=-1)  # (B, K)
        start_len = con_len[b_ix, start_idx]
        start_completes = any_start & (start_len <= 1)

        # done updates
        done_upd = g_done
        done_upd = jnp.where(
            completes[..., None]
            & (jnp.arange(C)[None, None, :] == jnp.maximum(g_active, 0)[..., None]),
            True,
            done_upd,
        )
        done_upd = jnp.where(
            start_completes[..., None]
            & (jnp.arange(C)[None, None, :] == start_idx[..., None]),
            True,
            done_upd,
        )
        # active/pos updates (abandoning a phrase mid-match resets progress,
        # as in the reference's unwind)
        new_active = jnp.where(
            continues & ~completes,
            g_active,
            jnp.where(any_start & ~start_completes, start_idx, -1),
        ).astype(jnp.int32)
        new_pos = jnp.where(
            continues & ~completes,
            g_pos + 1,
            jnp.where(any_start & ~start_completes, 1, 0),
        ).astype(jnp.int32)

        return (
            ConstrainedState(
                new_alive_tokens, new_alive_scores, done_upd, new_active,
                new_pos, fin_tokens, fin_scores, fin_mask, new_cache,
            ),
            None,
        )

    state, _ = jax.lax.scan(step, state, jnp.arange(L))

    final_norm = length_penalty(jnp.asarray(L), lenpen)
    alive_final = state.alive_scores / final_norm
    # prefer finished (constraint-satisfying) hypotheses over alive ones
    all_scores = jnp.concatenate([state.finished_scores, alive_final], axis=1)
    all_tokens = jnp.concatenate([state.finished_tokens, state.alive_tokens], 1)
    best_scores, sel = jax.lax.top_k(all_scores, K)
    best_tokens = jnp.take_along_axis(all_tokens, sel[..., None], axis=1)

    eos_pos = jnp.argmax(best_tokens == eos_id, axis=-1)
    has_eos = jnp.any(best_tokens == eos_id, axis=-1)
    eos_pos = jnp.where(has_eos, eos_pos, L - 1)
    pos = jnp.arange(L)[None, None, :]
    best_tokens = jnp.where(pos > eos_pos[..., None], pad_id, best_tokens)
    return best_tokens, best_scores

"""On-device CTC prefix scorer for joint CTC/attention beam decoding.

Replaces the reference's host-side espnet ``CTCPrefixScore`` (reference:
fairseq/sequence_generator.py:255-269,355-386 — a per-step numpy computation
with ragged python dict state, a host-sync inside the beam loop and the
dominant RTF cost) with a dense tensor formulation:

  * per-hypothesis state is (N, 2, T): log-probs of the prefix ending in
    non-blank / blank at each frame, plus the carried prefix score psi
  * scoring kc candidate extensions runs the espnet forward recurrence
    r_nb[t] = x_c[t] + (r_nb[t-1] ⊕ phi[t-1])
    r_b[t]  = x_b[t] + (r_b[t-1] ⊕ r_nb[t-1])
    as a **log-semiring associative scan over 3x3 transition matrices**
    (depth log2(T) instead of T sequential steps — TPU-friendly)
  * frames past the input length are masked by giving blank log-prob 0 and
    non-blank -inf, which freezes the recurrence without branches

Candidate score used for blending: psi(g·c) - psi(g); EOS scores the complete
sequence r_b[T-1] ⊕ r_nb[T-1] (espnet semantics).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG = -1e9


def _log_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Log-semiring matmul over the last two dims: (..., i, k) ⊗ (..., k, j)."""
    return jax.nn.logsumexp(a[..., :, :, None] + b[..., None, :, :], axis=-2)


class CTCPrefixState(NamedTuple):
    r: jnp.ndarray  # (N, 2, T): [0]=r_nb, [1]=r_b for the current prefix
    psi: jnp.ndarray  # (N,) carried prefix score
    last: jnp.ndarray  # (N,) last token of the prefix (-1 if empty)


class CTCPrefixScorer:
    """Batched prefix scorer bound to one batch's CTC log-probs."""

    def __init__(
        self,
        ctc_log_probs: jnp.ndarray,  # (B, T, V)
        lengths: jnp.ndarray,  # (B,)
        beam_size: int,
        blank_id: int = 0,
        eos_id: int = 2,
    ):
        B, T, V = ctc_log_probs.shape
        lp = ctc_log_probs.astype(jnp.float32)
        valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        # past-length freeze: blank 0, others -inf
        frozen = jnp.full((V,), NEG).at[blank_id].set(0.0)
        lp = jnp.where(valid, lp, frozen[None, None, :])
        # expand to beams: (B*K, T, V)
        self.lp = jnp.repeat(lp, beam_size, axis=0)
        self.lp_blank = self.lp[:, :, blank_id]  # (N, T)
        self.blank_id = blank_id
        self.eos_id = eos_id
        self.B, self.K, self.T, self.V = B, beam_size, T, V

    def init_state(self) -> CTCPrefixState:
        N, T = self.B * self.K, self.T
        # empty prefix: r_b[t] = cumulative blank, r_nb = -inf
        r_b = jnp.cumsum(self.lp_blank, axis=1)
        r = jnp.stack([jnp.full((N, T), NEG), r_b], axis=1)
        return CTCPrefixState(
            r=r, psi=jnp.zeros((N,)), last=jnp.full((N,), -1, jnp.int32)
        )

    def score_candidates(
        self, state: CTCPrefixState, cand: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Score kc candidate extensions per hypothesis.

        Args:
          state: current prefix state (leading dim N = B*K).
          cand: (N, kc) int32 candidate tokens.
        Returns:
          delta: (N, kc) score increments psi(g·c) - psi(g); EOS candidates
            get the complete-sequence score.
          new_r: (N, kc, 2, T) updated lattice states for each candidate.
        """
        N, kc = cand.shape
        T = self.T
        r_nb_prev, r_b_prev = state.r[:, 0], state.r[:, 1]  # (N, T)
        empty = state.last < 0

        # phi[t] = r_b_prev[t] ⊕ (c != last: r_nb_prev[t])  -> (N, kc, T)
        same = cand == state.last[:, None]
        phi = jnp.where(
            same[..., None],
            r_b_prev[:, None, :],
            jnp.logaddexp(r_b_prev, r_nb_prev)[:, None, :],
        )
        # phi shifted right by one frame; phi[-1] = 0 for the empty prefix
        phi_init = jnp.where(empty, 0.0, NEG)[:, None]  # (N, 1)
        phi_prev = jnp.concatenate(
            [jnp.broadcast_to(phi_init[..., None], (N, kc, 1)), phi[..., :-1]],
            axis=-1,
        )  # (N, kc, T)

        x_c = jnp.take_along_axis(
            self.lp, jnp.broadcast_to(cand[:, None, :], (N, T, kc)), axis=-1
        )  # (N, T, kc)
        x_c = jnp.moveaxis(x_c, 1, 2)  # (N, kc, T)
        x_b = jnp.broadcast_to(self.lp_blank[:, None, :], (N, kc, T))

        # 3x3 log-semiring transition matrices, scanned over T
        M = jnp.full((N, kc, T, 3, 3), NEG)
        M = M.at[..., 0, 0].set(x_c)
        M = M.at[..., 0, 2].set(x_c + phi_prev)
        M = M.at[..., 1, 0].set(x_b)
        M = M.at[..., 1, 1].set(x_b)
        M = M.at[..., 2, 2].set(0.0)
        M = jnp.moveaxis(M, 2, 0)  # (T, N, kc, 3, 3)

        def combine(earlier, later):
            # state evolves s[t] = M[t] ⊗ s[t-1], so compose later ⊗ earlier
            return _log_matmul(later, earlier)

        P = jax.lax.associative_scan(combine, M, axis=0)  # prefix products
        P = jnp.moveaxis(P, 0, 2)  # (N, kc, T, 3, 3)
        new_r_nb = P[..., 0, 2]  # (N, kc, T)
        new_r_b = P[..., 1, 2]
        new_r = jnp.stack([new_r_nb, new_r_b], axis=2)  # (N, kc, 2, T)

        # psi(g·c) = logsumexp_t(phi[t-1] + x_c[t])
        psi_new = jax.nn.logsumexp(phi_prev + x_c, axis=-1)  # (N, kc)
        delta = psi_new - state.psi[:, None]

        # EOS: complete-sequence probability of g itself
        complete = jnp.logaddexp(r_b_prev[:, -1], r_nb_prev[:, -1])  # (N,)
        is_eos = cand == self.eos_id
        delta = jnp.where(is_eos, complete[:, None] - state.psi[:, None], delta)
        # repeating the last token without a blank boundary is handled by phi;
        # blank candidates never extend a prefix in joint decoding
        is_blank = cand == self.blank_id
        delta = jnp.where(is_blank, NEG, delta)
        return delta, new_r, psi_new

    def select(
        self,
        state: CTCPrefixState,
        cand: jnp.ndarray,
        new_r: jnp.ndarray,
        psi_new: jnp.ndarray,
        parent_idx: jnp.ndarray,
        cand_pos: jnp.ndarray,
        selected_tok: jnp.ndarray,
    ) -> CTCPrefixState:
        """Gather the state for selected (parent, candidate-position) pairs.

        parent_idx, cand_pos, selected_tok: (B, K) selections after top-k.
        """
        B, K = parent_idx.shape
        N = B * K

        def gather_beam(x, idx):
            xb = x.reshape((B, K) + x.shape[1:])
            return jnp.take_along_axis(
                xb, idx.reshape((B, K) + (1,) * (xb.ndim - 2)), axis=1
            )

        # reorder by parent beam, then pick the candidate slot
        r_cand = gather_beam(new_r, parent_idx)  # (B, K, kc, 2, T)
        psi_cand = gather_beam(psi_new, parent_idx)  # (B, K, kc)
        r_sel = jnp.take_along_axis(
            r_cand, cand_pos[:, :, None, None, None], axis=2
        )[:, :, 0]  # (B, K, 2, T)
        psi_sel = jnp.take_along_axis(psi_cand, cand_pos[:, :, None], axis=2)[:, :, 0]
        return CTCPrefixState(
            r=r_sel.reshape(N, 2, self.T),
            psi=psi_sel.reshape(N),
            last=selected_tok.reshape(N).astype(jnp.int32),
        )

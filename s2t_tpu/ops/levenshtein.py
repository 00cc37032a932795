"""Device-side Levenshtein/LCS oracles for NAT training — the libnat
equivalent.

(reference: fairseq/clib/libnat/edit_dist.cpp:231 and
libnat_cuda/edit_dist.cu:332, consumed via
fairseq/models/nat/levenshtein_utils.py _get_ins_targets/_get_del_targets.)

TPU design: the LCS table builds as a lax.scan over rows (one row carried),
and the backtrace is a bounded lax.while_loop (≤ N+M steps) vmapped over the
batch — the device analogue of the CUDA dynamic-programming kernels.  For
the insertion oracle, when the "deleted" sequence is constructed by this
framework itself the kept-mask is known and the oracle reduces to closed-form
index arithmetic (no DP at all); see levenshtein_transformer.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _lcs_table(a: jnp.ndarray, b: jnp.ndarray, a_valid, b_valid) -> jnp.ndarray:
    """LCS DP table L of shape (N+1, M+1) for one pair."""
    N = a.shape[0]
    M = b.shape[0]

    def row_step(prev_row, ai):
        a_tok, a_ok = ai

        # compute row i from row i-1 via scan over j
        def col_step(carry, bj):
            left, diag = carry  # L[i, j-1], L[i-1, j-1]
            b_tok, b_ok, up = bj  # up = L[i-1, j]
            match = (a_tok == b_tok) & a_ok & b_ok
            val = jnp.where(match, diag + 1, jnp.maximum(left, up))
            return (val, up), val

        (_, _), row = jax.lax.scan(
            col_step, (jnp.int32(0), jnp.int32(0)), (b, b_valid, prev_row[1:])
        )
        row = jnp.concatenate([jnp.zeros((1,), jnp.int32), row])
        return row, row

    row0 = jnp.zeros((M + 1,), jnp.int32)
    _, rows = jax.lax.scan(row_step, row0, (a, a_valid))
    return jnp.concatenate([row0[None], rows], axis=0)  # (N+1, M+1)


def _del_backtrace(L, a, b, a_len, b_len) -> jnp.ndarray:
    """Per-position delete labels for `a` vs reference `b`: 1 where `a[i]`
    is NOT part of the LCS alignment (the suggested deletion expert)."""
    N = a.shape[0]

    def cond(state):
        i, j, _ = state
        return (i > 0) | (j > 0)

    def body(state):
        i, j, keep = state
        can_diag = (i > 0) & (j > 0) & (a[i - 1] == b[j - 1]) & (
            L[i, j] == L[i - 1, j - 1] + 1
        )
        can_up = (i > 0) & (L[i, j] == L[i - 1, j])  # delete a[i-1]
        new_keep = jnp.where(
            can_diag, keep.at[jnp.maximum(i - 1, 0)].set(True), keep
        )
        i2 = jnp.where(can_diag, i - 1, jnp.where(can_up, i - 1, i))
        j2 = jnp.where(can_diag, j - 1, jnp.where(can_up, j, j - 1))
        return i2, j2, new_keep

    keep0 = jnp.zeros((N,), bool)
    _, _, keep = jax.lax.while_loop(cond, body, (a_len, b_len, keep0))
    return ~keep  # True = delete


@partial(jax.jit, static_argnames=("pad_id",))
def del_targets(
    in_tokens: jnp.ndarray, out_tokens: jnp.ndarray, pad_id: int = 1
) -> jnp.ndarray:
    """(B, N) binary deletion labels: 1 where in_tokens[i] should be deleted
    to best align with out_tokens (reference: _get_del_targets via libnat).
    Pad positions are labelled 0."""
    in_valid = in_tokens != pad_id
    out_valid = out_tokens != pad_id
    in_len = jnp.sum(in_valid.astype(jnp.int32), axis=1)
    out_len = jnp.sum(out_valid.astype(jnp.int32), axis=1)

    def one(a, b, av, bv, al, bl):
        L = _lcs_table(a, b, av, bv)
        dele = _del_backtrace(L, a, b, al, bl)
        return dele & av

    labels = jax.vmap(one)(in_tokens, out_tokens, in_valid, out_valid,
                           in_len, out_len)
    return labels.astype(jnp.int32)

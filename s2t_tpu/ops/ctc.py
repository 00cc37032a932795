"""CTC lattice ops as TPU-friendly ``lax.scan`` recurrences.

Replaces, with pure-JAX device code:
  - cuDNN ``F.ctc_loss``                (reference: fairseq/criterions/ctc.py:435-476)
  - torch_imputer ``imputer_loss``      (reference: fairseq/torch_imputer/imputer.cu:88-903)
  - torch_imputer ``best_alignment``    (reference: fairseq/torch_imputer/best_alignment.cu:338)
  - greedy collapse decode              (reference: models/speech_to_text/s2t_ctc.py:312-346)

Design notes (TPU):
  * The lattice has S = 2U+1 states (blanks interleaved with labels).  We scan
    over time T carrying ``alpha`` of static shape (B, S) — T-major layout so
    each step is a cheap (B, S) vector op; XLA keeps alpha resident in VMEM.
  * All computation is float32 log-space; gradients come from JAX autodiff
    through the scan (the adjoint of logsumexp-scan IS the beta recurrence, so
    autodiff yields the classic alpha-beta gradient at the same asymptotic cost).
  * Variable lengths are handled by masking, never by dynamic shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: keeps grads NaN-free


def _extend_labels(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """(B, U) labels -> (B, 2U+1) blank-interleaved extended sequence."""
    B, U = labels.shape
    S = 2 * U + 1
    ext = jnp.full((B, S), blank_id, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    return ext


def _lattice_logp(
    log_probs: jnp.ndarray, ext_labels: jnp.ndarray, normalized: bool = True
) -> jnp.ndarray:
    """Gather per-state emission scores: (B, T, V),(B, S) -> (B, T, S).

    Implemented as a one-hot matmul, not take_along_axis: on TPU the dynamic
    gather over the vocab axis lowers to scalarised loads (~35 ms at
    B=32,T=250,V=10k measured on v5e) while the equivalent einsum rides the
    MXU (<1 ms), and its transpose (the backward scatter) does too.  One-hot
    selection with f32 accumulation is exact in any input dtype.

    ``normalized=False`` takes RAW logits and subtracts the log-softmax
    normalizer from the (B, T, S) gather result instead of from the (B, T, V)
    input.  Same math — log_softmax(x)[lbl] == x[lbl] - logsumexp(x) — but it
    never materializes an f32 (B, T, V) tensor: the bf16 logits the model
    already produced feed the MXU directly and the logsumexp is a fused
    reduction over them.  At the bench shape (40,250,10k) the f32
    log_softmax materialization was 400 MB of HBM write + read per head.
    """
    one_hot = jax.nn.one_hot(ext_labels, log_probs.shape[-1], dtype=log_probs.dtype)
    emit = jnp.einsum(
        "btv,bsv->bts", log_probs, one_hot,
        preferred_element_type=jnp.float32,
    )
    if not normalized:
        emit = emit - _logsumexp_v(log_probs)[:, :, None]
    return emit


def _logsumexp_v(logits: jnp.ndarray) -> jnp.ndarray:
    """(B, T, V) -> (B, T) f32 log-softmax normalizer as a fused reduction
    (never materializes an f32 (B, T, V) tensor; layout-agnostic reads)."""
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
    return m.astype(jnp.float32) + jnp.log(
        jnp.sum(
            jnp.exp(logits.astype(jnp.float32) - m[..., None].astype(jnp.float32)),
            axis=-1,
        )
    )


def _fused_head_logsumexp(fused_head: dict) -> jnp.ndarray:
    """(B, T) f32 log-softmax normalizer computed CHUNKED over the vocab from
    the head input — the (B, T, V) logits tensor never exists.

    An online-logsumexp ``lax.scan`` over vocab chunks of the classifier: per
    chunk z = h @ W[:, c] (+ b[c]) is a (B, T, C) matmul whose max/sum-exp
    folds into a running (m, s) carry.  vs materializing the logits this
    removes, at the bench shape (40,250,10k): the 400 MB logits write+read,
    its backward layout copy, the f32 softmax buffer, and the full-width
    bias-grad reduce — the backward of the scan re-derives softmax chunks and
    accumulates dh/dW/db per chunk (same matmul count as the dense backward).
    V is padded to a lane multiple with -1e9 bias columns (exp -> 0)."""
    h, W, b = fused_head["hidden"], fused_head["kernel"], fused_head["bias"]
    B, T, D = h.shape
    V = W.shape[1]
    C = 1024
    nc = -(-V // C)
    pad = nc * C - V
    b_eff = jnp.zeros((V,), jnp.float32) if b is None else b.astype(jnp.float32)
    if pad:
        W = jnp.pad(W, ((0, 0), (0, pad)))
        b_eff = jnp.pad(b_eff, (0, pad), constant_values=-1e9)
    Wc = W.reshape(D, nc, C).transpose(1, 0, 2)  # (nc, D, C)
    bc = b_eff.reshape(nc, C)

    def chunk(carry, wb):
        m, s = carry
        w, bb = wb
        z = (
            jnp.einsum("btd,dc->btc", h, w, preferred_element_type=jnp.float32)
            + bb[None, None, :]
        )
        zm = jnp.max(z, axis=-1)
        new_m = jnp.maximum(m, zm)
        s = s * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(z - new_m[..., None]), axis=-1
        )
        return (new_m, s), None

    init = (
        jnp.full((B, T), -jnp.inf, jnp.float32),
        jnp.zeros((B, T), jnp.float32),
    )
    # remat the chunk: without it the scan saves every f32 (B, T, C) chunk
    # for backward (same HBM traffic as the dense logits, measured slower);
    # recomputing the chunk matmul in backward costs one extra matmul pass
    # and keeps the residuals at O(B*T) per chunk
    (m, s), _ = jax.lax.scan(jax.checkpoint(chunk), init, (Wc, bc))
    return m + jnp.log(s)


def _fused_head_emissions(
    logits: jnp.ndarray, ext_labels: jnp.ndarray, fused_head: dict
) -> jnp.ndarray:
    """Emission scores straight from the CTC head's INPUT: (B, T, S) =
    hidden @ gather(kernel, ext_labels) + bias[ext_labels] - logsumexp(logits).

    The (B, T, V) logits feed only the logsumexp reduction; the per-state
    scores come from a (B,T,D)x(B,S,D) matmul against the S gathered
    classifier columns.  vs gathering from the logits tensor this removes
    the big-tensor einsum read (and its layout copy) in forward and the
    (B,T,S)x(B,S,V) scatter matmul in backward — the gradient of the gather
    path flows through the small matmuls into hidden/kernel directly.
    Exactness: gathered-column matmul accumulates the SAME products the
    logits matmul accumulates, in f32 on the MXU."""
    h, W, b = fused_head["hidden"], fused_head["kernel"], fused_head["bias"]
    # a precomputed normalizer ("norm") lets callers that evaluate the loss
    # for several label sets over the SAME head (mixup's two target rows)
    # run the vocab-wide logsumexp once instead of relying on XLA CSE'ing
    # two separate scans
    norm = fused_head.get("norm")
    if norm is None:
        norm = _fused_head_logsumexp(fused_head)
    one_hot = jax.nn.one_hot(ext_labels, W.shape[1], dtype=h.dtype)
    w_ext = jnp.einsum("dv,bsv->bsd", W.astype(h.dtype), one_hot)
    em = jnp.einsum(
        "btd,bsd->bts", h, w_ext, preferred_element_type=jnp.float32
    )
    if b is not None:
        b_ext = jnp.einsum(
            "v,bsv->bs", b.astype(jnp.float32), one_hot.astype(jnp.float32)
        )
        em = em + b_ext[:, None, :]
    return em - norm[:, :, None]


def _transition_mask(ext_labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """(B, S) bool: True where the skip transition s-2 -> s is allowed.

    Allowed iff state s is a label state and differs from the label at s-2.
    """
    B, S = ext_labels.shape
    is_label = jnp.arange(S) % 2 == 1
    prev2 = jnp.concatenate(
        [jnp.full((B, 2), -1, dtype=ext_labels.dtype), ext_labels[:, :-2]], axis=1
    )
    return is_label[None, :] & (ext_labels != prev2)


def _shift_right(x: jnp.ndarray, n: int, fill: float = NEG_INF) -> jnp.ndarray:
    """Shift (B, S) right along S by n, filling with `fill`."""
    pad = jnp.full(x.shape[:-1] + (n,), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-n]], axis=-1)


def ctc_forward_alphas(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    blank_id: int = 0,
    force_emits: Optional[jnp.ndarray] = None,
    normalized: bool = True,
    fused_head: Optional[dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the alpha recurrence. Returns (final_alpha (B,S), ext_labels (B,S)).

    ``force_emits``: optional (B, T) int32; at frame t, if force_emits[b,t] >= 0
    the lattice is constrained to that state index (imputer semantics,
    reference: torch_imputer/imputer.py force_emits argument).
    ``normalized=False``: log_probs are raw logits (see _lattice_logp).
    ``fused_head``: emission gather from the head input (_fused_head_emissions).
    """
    B, T, V = log_probs.shape
    ext = _extend_labels(labels, blank_id)
    S = ext.shape[1]
    if fused_head is not None:
        emit = _fused_head_emissions(log_probs, ext, fused_head)  # (B, T, S)
    else:
        emit = _lattice_logp(log_probs, ext, normalized=normalized)
    skip_ok = _transition_mask(ext, blank_id)  # (B, S)

    init = jnp.full((B, S), NEG_INF, dtype=jnp.float32)
    init = init.at[:, 0].set(emit[:, 0, 0])
    init = init.at[:, 1].set(jnp.where(S > 1, emit[:, 0, 1], NEG_INF))
    if force_emits is not None:
        f0 = force_emits[:, 0]
        keep0 = (f0 < 0)[:, None] | (jnp.arange(S)[None, :] == f0[:, None])
        init = jnp.where(keep0, init, NEG_INF)

    t_idx = jnp.arange(1, T)
    emits_t = jnp.moveaxis(emit[:, 1:], 1, 0)  # (T-1, B, S)
    if force_emits is not None:
        force_t = jnp.moveaxis(force_emits[:, 1:], 1, 0)  # (T-1, B)
    else:
        force_t = jnp.zeros((T - 1, B), dtype=jnp.int32) - 1

    def step(alpha, xs):
        t, e_t, f_t = xs
        stay = alpha
        step1 = _shift_right(alpha, 1)
        step2 = jnp.where(skip_ok, _shift_right(alpha, 2), NEG_INF)
        new = jnp.logaddexp(jnp.logaddexp(stay, step1), step2) + e_t
        keep = (f_t < 0)[:, None] | (jnp.arange(S)[None, :] == f_t[:, None])
        new = jnp.where(keep, new, NEG_INF)
        # frames past the input length carry alpha unchanged
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    alpha, _ = jax.lax.scan(
        step, init, (t_idx, emits_t, force_t), unroll=8
    )
    return alpha, ext


def ctc_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    reduction: str = "sum",
    zero_infinity: bool = True,
    normalized: bool = True,
    fused_head: Optional[dict] = None,
) -> jnp.ndarray:
    """Negative log likelihood CTC loss.

    Args:
      log_probs: (B, T, V) log-softmax outputs — or raw logits with
        ``normalized=False`` (preferred in training: skips the f32 (B, T, V)
        log_softmax materialization, see _lattice_logp).
      labels: (B, U) int labels, padded arbitrarily beyond label_lengths.
      input_lengths: (B,) valid frames.
      label_lengths: (B,) valid labels.
      fused_head: optional head internals {"hidden","kernel","bias"} —
        emissions gathered from the head input (_fused_head_emissions);
        implies the logits in ``log_probs`` are raw.
    Matches torch.nn.functional.ctc_loss semantics (parity-tested in
    tests/test_ctc.py).
    """
    from s2t_tpu.ops.ctc_pallas import ctc_nll_pallas, pallas_ctc_available

    B, T, _ = log_probs.shape
    S = 2 * labels.shape[1] + 1
    if pallas_ctc_available(B, T, S):
        # fused single-kernel lattice (custom fwd/bwd); same numerics as the
        # scan below, ~10x faster on TPU (see ops/ctc_pallas.py)
        nll = ctc_nll_pallas(
            log_probs, labels, input_lengths, label_lengths, blank_id,
            normalized=normalized, fused_head=fused_head,
        )
    else:
        alpha, _ = ctc_forward_alphas(
            log_probs, labels, input_lengths, blank_id,
            normalized=normalized, fused_head=fused_head,
        )
        last_label = 2 * label_lengths - 1  # final label state
        last_blank = 2 * label_lengths  # final blank state
        a_label = jnp.take_along_axis(alpha, last_label[:, None].clip(0), axis=1)[:, 0]
        a_label = jnp.where(label_lengths > 0, a_label, NEG_INF)
        a_blank = jnp.take_along_axis(alpha, last_blank[:, None], axis=1)[:, 0]
        nll = -jnp.logaddexp(a_label, a_blank)
    if zero_infinity:
        bad = (nll > -NEG_INF / 2) | ~jnp.isfinite(nll)
        # feasibility: need input_lengths >= label path length
        bad = bad | (input_lengths < label_lengths)
        nll = jnp.where(bad, 0.0, nll)
    # dummy rows (batch padded to a multiple for the mesh) have zero frames
    nll = jnp.where(input_lengths > 0, nll, 0.0)
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(label_lengths, 1))
    return nll


def imputer_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    force_emits: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    reduction: str = "sum",
    zero_infinity: bool = True,
) -> jnp.ndarray:
    """CTC loss over a lattice constrained to ``force_emits`` states where >= 0.

    Equivalent of torch_imputer's ``imputer_loss`` (reference:
    fairseq/torch_imputer/imputer.py:120-210, imputer.cu:88-903), used by the
    CTC criterion's ground-truth PAE path (reference: criterions/ctc.py:456).
    """
    alpha, _ = ctc_forward_alphas(
        log_probs, labels, input_lengths, blank_id, force_emits=force_emits
    )
    last_label = 2 * label_lengths - 1
    last_blank = 2 * label_lengths
    a_label = jnp.take_along_axis(alpha, last_label[:, None].clip(0), axis=1)[:, 0]
    a_label = jnp.where(label_lengths > 0, a_label, NEG_INF)
    a_blank = jnp.take_along_axis(alpha, last_blank[:, None], axis=1)[:, 0]
    nll = -jnp.logaddexp(a_label, a_blank)
    if zero_infinity:
        bad = (nll > -NEG_INF / 2) | ~jnp.isfinite(nll)
        bad = bad | (input_lengths < label_lengths)
        nll = jnp.where(bad, 0.0, nll)
    # mesh-padded dummy rows (zero frames) contribute nothing — without
    # this the unconditional frame-0 alpha init yields phantom loss
    nll = jnp.where(input_lengths > 0, nll, 0.0)
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(label_lengths, 1))
    return nll


def ctc_best_alignment(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Viterbi best CTC alignment.

    Returns:
      aligned_tokens: (B, T) int32 — the emitted token per frame on the best
        path (blank_id at blank frames), valid where t < input_lengths.
      state_idx: (B, T) int32 — lattice state index per frame (imputer
        ``best_alignment`` output, usable as ``force_emits``).

    Replaces torch_imputer ``best_alignment`` (reference:
    fairseq/torch_imputer/best_alignment.cu:338, used at criterions/ctc.py:283-330
    to build the PAE ground-truth oracle).
    """
    log_probs = log_probs.astype(jnp.float32)
    B, T, V = log_probs.shape
    ext = _extend_labels(labels, blank_id)
    S = ext.shape[1]
    emit = _lattice_logp(log_probs, ext)
    skip_ok = _transition_mask(ext, blank_id)

    init = jnp.full((B, S), NEG_INF, dtype=jnp.float32)
    init = init.at[:, 0].set(emit[:, 0, 0])
    init = init.at[:, 1].set(jnp.where(S > 1, emit[:, 0, 1], NEG_INF))

    t_idx = jnp.arange(1, T)
    emits_t = jnp.moveaxis(emit[:, 1:], 1, 0)

    def fwd(alpha, xs):
        t, e_t = xs
        stay = alpha
        step1 = _shift_right(alpha, 1)
        step2 = jnp.where(skip_ok, _shift_right(alpha, 2), NEG_INF)
        stacked = jnp.stack([stay, step1, step2], axis=0)  # (3, B, S)
        back = jnp.argmax(stacked, axis=0).astype(jnp.int32)  # (B, S) in {0,1,2}
        best = jnp.max(stacked, axis=0) + e_t
        active = (t < input_lengths)[:, None]
        new = jnp.where(active, best, alpha)
        back = jnp.where(active, back, 0)
        return new, back

    alpha, backs = jax.lax.scan(
        fwd, init, (t_idx, emits_t), unroll=8
    )  # backs: (T-1, B, S)

    # choose final state between last blank / last label
    last_label = (2 * label_lengths - 1).clip(0)
    last_blank = 2 * label_lengths
    a_label = jnp.take_along_axis(alpha, last_label[:, None], axis=1)[:, 0]
    a_label = jnp.where(label_lengths > 0, a_label, NEG_INF)
    a_blank = jnp.take_along_axis(alpha, last_blank[:, None], axis=1)[:, 0]
    final_state = jnp.where(a_label > a_blank, last_label, last_blank)  # (B,)

    # backtrace from t = input_length-1 down to 0.  We scan in reverse over the
    # (T-1) transition steps; frames at/after input_length hold final_state.
    def bwd(state, xs):
        t, back_t = xs  # back_t: (B, S); transition into frame t (1..T-1)
        # if frame t is within length, stepping from t to t-1 moves the state
        delta = jnp.take_along_axis(back_t, state[:, None], axis=1)[:, 0]
        prev_state = jnp.where(t < input_lengths, state - delta, state)
        return prev_state, state

    # reverse scan yields the state occupied at each frame 1..T-1 and the
    # final carry is the state at frame 0
    state0, states_rev = jax.lax.scan(
        bwd, final_state, (t_idx, backs), reverse=True, unroll=8
    )
    states = jnp.concatenate([state0[:, None], jnp.moveaxis(states_rev, 0, 1)], axis=1)
    states = jnp.minimum(states, 2 * label_lengths[:, None])

    aligned = jnp.take_along_axis(ext, states, axis=1)  # (B, T)
    return aligned.astype(jnp.int32), states.astype(jnp.int32)


def ctc_greedy_decode(
    log_probs_or_logits: jnp.ndarray,
    input_lengths: jnp.ndarray,
    blank_id: int = 0,
    pad_id: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy CTC decode fully on device, static shapes.

    argmax per frame -> collapse repeats -> drop blanks, emitted left-packed
    into a (B, T) buffer padded with ``pad_id``; returns (tokens, out_lengths).
    (reference: models/speech_to_text/s2t_ctc.py:312-346 unique_consecutive path)
    """
    B, T = log_probs_or_logits.shape[:2]
    pred = jnp.argmax(log_probs_or_logits, axis=-1).astype(jnp.int32)  # (B, T)
    valid = jnp.arange(T)[None, :] < input_lengths[:, None]
    prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), pred[:, :-1]], axis=1)
    keep = (pred != blank_id) & (pred != prev) & valid
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # target slot per frame
    out = jnp.full((B, T), pad_id, dtype=jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    write_pos = jnp.where(keep, pos, T)  # out-of-range -> dropped
    out = out.at[rows, write_pos].set(pred, mode="drop")
    out_lengths = jnp.sum(keep.astype(jnp.int32), axis=1)
    return out, out_lengths

"""CTC op parity tests vs torch.nn.functional.ctc_loss (CPU reference).

Mirrors the role of the reference's reliance on cuDNN CTC correctness
(reference: fairseq/criterions/ctc.py:435-476) — here we check our lax.scan
lattice against torch's independent implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from s2t_tpu.ops.ctc import (
    ctc_best_alignment,
    ctc_greedy_decode,
    ctc_loss,
    imputer_loss,
)


def make_case(rng, B=3, T=20, V=11, U=6, blank=0):
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    input_lengths = rng.integers(T - 5, T + 1, size=(B,)).astype(np.int32)
    label_lengths = rng.integers(1, U + 1, size=(B,)).astype(np.int32)
    return np.asarray(log_probs), labels, input_lengths, label_lengths


def torch_ctc(log_probs, labels, input_lengths, label_lengths, blank=0, reduction="sum"):
    lp = torch.tensor(log_probs).permute(1, 0, 2)  # (T, B, V)
    tgt = torch.tensor(labels.astype(np.int64))
    return F.ctc_loss(
        lp,
        tgt,
        torch.tensor(input_lengths.astype(np.int64)),
        torch.tensor(label_lengths.astype(np.int64)),
        blank=blank,
        reduction=reduction,
        zero_infinity=True,
    ).item()


class TestCTCLoss:
    def test_matches_torch_sum(self, rng):
        lp, labels, il, ll = make_case(rng)
        ours = float(ctc_loss(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)))
        ref = torch_ctc(lp, labels, il, ll)
        assert abs(ours - ref) < 1e-3 * max(1.0, abs(ref))

    def test_matches_torch_various_shapes(self, rng):
        for B, T, V, U in [(1, 8, 5, 3), (4, 30, 20, 10), (2, 15, 7, 1)]:
            lp, labels, il, ll = make_case(rng, B=B, T=T, V=V, U=U)
            ours = float(
                ctc_loss(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
            )
            ref = torch_ctc(lp, labels, il, ll)
            assert abs(ours - ref) < 1e-3 * max(1.0, abs(ref)), (B, T, V, U)

    def test_repeated_labels(self, rng):
        # repeats exercise the blocked skip transition
        lp, _, il, ll = make_case(rng, B=2, T=25, V=6, U=8)
        labels = np.array([[2, 2, 3, 3, 2, 1, 1, 4], [5, 5, 5, 5, 1, 2, 3, 4]], dtype=np.int32)
        ll = np.array([8, 8], dtype=np.int32)
        ours = float(ctc_loss(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)))
        ref = torch_ctc(lp, labels, il, ll)
        assert abs(ours - ref) < 1e-3 * max(1.0, abs(ref))

    def test_infeasible_zeroed(self, rng):
        # label path longer than input frames -> zero_infinity zeroes the loss
        lp, labels, il, ll = make_case(rng, B=2, T=6, V=8, U=5)
        labels = np.array([[2, 2, 2, 2, 2], [3, 4, 5, 6, 7]], dtype=np.int32)
        il = np.array([4, 6], dtype=np.int32)
        ll = np.array([5, 5], dtype=np.int32)
        ours = float(ctc_loss(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)))
        ref = torch_ctc(lp, labels, il, ll)
        assert abs(ours - ref) < 1e-3 * max(1.0, abs(ref))

    def test_gradients_match_torch(self, rng):
        lp, labels, il, ll = make_case(rng, B=2, T=12, V=6, U=4)

        def loss_fn(x):
            return ctc_loss(
                jax.nn.log_softmax(x, axis=-1),
                jnp.asarray(labels),
                jnp.asarray(il),
                jnp.asarray(ll),
            )

        # recover raw logits from log-probs for fair grad comparison
        logits = jnp.asarray(lp)
        g_ours = jax.grad(loss_fn)(logits)

        t_logits = torch.tensor(np.asarray(lp), requires_grad=True)
        t_lp = F.log_softmax(t_logits, dim=-1).permute(1, 0, 2)
        t_loss = F.ctc_loss(
            t_lp,
            torch.tensor(labels.astype(np.int64)),
            torch.tensor(il.astype(np.int64)),
            torch.tensor(ll.astype(np.int64)),
            blank=0,
            reduction="sum",
            zero_infinity=True,
        )
        t_loss.backward()
        g_ref = t_logits.grad.numpy()
        np.testing.assert_allclose(np.asarray(g_ours), g_ref, atol=2e-3, rtol=1e-2)

    def test_raw_logits_path_matches_log_softmax(self, rng):
        """normalized=False on raw logits == normalized=True on log_softmax,
        for values AND gradients (incl. bf16 logits as produced in training)."""
        logits_np = rng.normal(scale=3.0, size=(3, 20, 11)).astype(np.float32)
        _, labels, il, ll = make_case(rng)

        def loss_norm(x):
            return ctc_loss(
                jax.nn.log_softmax(x, axis=-1), jnp.asarray(labels),
                jnp.asarray(il), jnp.asarray(ll),
            )

        def loss_raw(x):
            return ctc_loss(
                x, jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
                normalized=False,
            )

        for dtype in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(logits_np, dtype)
            v1, g1 = jax.value_and_grad(lambda a: loss_norm(a.astype(jnp.float32)))(x)
            v2, g2 = jax.value_and_grad(lambda a: loss_raw(a))(x)
            np.testing.assert_allclose(float(v1), float(v2), rtol=2e-5)
            np.testing.assert_allclose(
                np.asarray(g1, np.float32), np.asarray(g2, np.float32),
                atol=2e-2 if dtype == jnp.bfloat16 else 2e-5,
            )

    def test_fused_head_matches_logits_path(self, rng):
        """Emissions gathered from the head input (hidden @ W[:, ext] + b[ext])
        must match gathering from logits = hidden @ W + b, for loss and
        gradients w.r.t. hidden and W."""
        B, T, D, V, U = 3, 18, 16, 13, 5
        h = rng.normal(size=(B, T, D)).astype(np.float32)
        W = rng.normal(size=(D, V)).astype(np.float32)
        b = rng.normal(size=(V,)).astype(np.float32)
        labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
        il = np.full((B,), T, np.int32)
        ll = rng.integers(1, U + 1, size=(B,)).astype(np.int32)

        def loss_plain(h, W):
            logits = jnp.einsum("btd,dv->btv", h, W) + b
            return ctc_loss(
                logits, jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
                normalized=False,
            )

        def loss_fused(h, W):
            logits = jnp.einsum("btd,dv->btv", h, W) + b
            return ctc_loss(
                logits, jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
                fused_head={"hidden": h, "kernel": W, "bias": jnp.asarray(b)},
            )

        v1, (gh1, gw1) = jax.value_and_grad(loss_plain, argnums=(0, 1))(
            jnp.asarray(h), jnp.asarray(W))
        v2, (gh2, gw2) = jax.value_and_grad(loss_fused, argnums=(0, 1))(
            jnp.asarray(h), jnp.asarray(W))
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-4)

    def test_jit_and_none_reduction(self, rng):
        lp, labels, il, ll = make_case(rng)
        f = jax.jit(lambda a, b, c, d: ctc_loss(a, b, c, d, reduction="none"))
        per = f(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll))
        assert per.shape == (lp.shape[0],)
        total = float(ctc_loss(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)))
        assert abs(float(jnp.sum(per)) - total) < 1e-4 * max(1.0, abs(total))


class TestBestAlignment:
    def test_alignment_is_valid_path(self, rng):
        lp, labels, il, ll = make_case(rng, B=4, T=24, V=9, U=6)
        aligned, states = ctc_best_alignment(
            jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)
        )
        aligned = np.asarray(aligned)
        states = np.asarray(states)
        for b in range(4):
            L, U_b = il[b], ll[b]
            path = states[b, :L]
            # monotone with steps in {0,1,2}
            deltas = np.diff(path)
            assert np.all((deltas >= 0) & (deltas <= 2)), path
            # starts at state 0 or 1, ends at last label or last blank
            assert path[0] in (0, 1)
            assert path[-1] in (2 * U_b - 1, 2 * U_b)
            # collapsing the aligned frames reproduces the label sequence
            toks = aligned[b, :L]
            collapsed = []
            prev = -1
            for s, tk in zip(path, toks):
                if s % 2 == 1 and s != prev:
                    collapsed.append(tk)
                prev = s
            np.testing.assert_array_equal(np.array(collapsed), labels[b, :U_b])

    def test_alignment_score_matches_viterbi_brute_force(self, rng):
        # tiny case: enumerate all paths
        import itertools

        lp, _, _, _ = make_case(rng, B=1, T=5, V=4, U=2)
        labels = np.array([[2, 3]], dtype=np.int32)
        il = np.array([5], dtype=np.int32)
        ll = np.array([2], dtype=np.int32)
        aligned, states = ctc_best_alignment(
            jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)
        )
        # brute force: all frame label seqs collapsing to [2,3]
        best, best_seq = -1e9, None
        for seq in itertools.product([0, 2, 3], repeat=5):
            # collapse
            out, prev = [], -1
            for s in seq:
                if s != 0 and s != prev:
                    out.append(s)
                prev = s
            if out == [2, 3]:
                score = sum(lp[0, t, s] for t, s in enumerate(seq))
                if score > best:
                    best, best_seq = score, seq
        got_score = sum(lp[0, t, int(np.asarray(aligned)[0, t])] for t in range(5))
        assert abs(got_score - best) < 1e-4

    def test_imputer_loss_with_forced_alignment(self, rng):
        # forcing the Viterbi path should give exactly the Viterbi path score
        lp, labels, il, ll = make_case(rng, B=2, T=16, V=7, U=4)
        _, states = ctc_best_alignment(
            jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll)
        )
        forced = imputer_loss(
            jnp.asarray(lp),
            jnp.asarray(labels),
            states,
            jnp.asarray(il),
            jnp.asarray(ll),
            reduction="none",
        )
        free = ctc_loss(
            jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(il), jnp.asarray(ll),
            reduction="none",
        )
        # forced-path NLL >= full-marginal NLL... actually <=: marginal ll >= path ll
        assert np.all(np.asarray(forced) >= np.asarray(free) - 1e-4)
        # unforced imputer (-1 everywhere) == plain ctc
        none_forced = imputer_loss(
            jnp.asarray(lp),
            jnp.asarray(labels),
            jnp.full((2, 16), -1, dtype=np.int32),
            jnp.asarray(il),
            jnp.asarray(ll),
            reduction="none",
        )
        np.testing.assert_allclose(np.asarray(none_forced), np.asarray(free), atol=1e-4)


class TestGreedyDecode:
    def test_collapse(self):
        # hand-crafted frame argmaxes: blank=0
        V = 5
        frames = np.array([[1, 1, 0, 2, 2, 0, 0, 3], [4, 0, 4, 4, 0, 1, 0, 0]])
        B, T = frames.shape
        logits = np.full((B, T, V), -10.0, dtype=np.float32)
        for b in range(B):
            for t in range(T):
                logits[b, t, frames[b, t]] = 10.0
        toks, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([8, 6]))
        toks, lens = np.asarray(toks), np.asarray(lens)
        assert lens.tolist() == [3, 3]
        assert toks[0, :3].tolist() == [1, 2, 3]
        assert toks[1, :3].tolist() == [4, 4, 1]  # separated by blank -> both kept

    def test_respects_lengths(self):
        logits = np.zeros((1, 6, 3), dtype=np.float32)
        logits[0, :, 2] = 5.0  # all frames argmax 2
        toks, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([3]))
        assert int(lens[0]) == 1
        assert int(toks[0, 0]) == 2

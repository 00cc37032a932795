"""Latency metrics + latency-augmented criterion tests.

(reference: examples/simultaneous_translation/utils/latency.py — each metric
re-derived in numpy below with the reference's exact loops, asserted equal to
the closed-form jax implementations.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.criterions import build_criterion
from s2t_tpu.criterions.latency import (
    LatencyTrainingConfig,
    average_lagging,
    average_proportion,
    differentiable_average_lagging,
    expected_delays_from_attention,
    latency_training_loss,
    variance_delay,
)


def _rand_case(seed, B=3, U=7, S=11):
    rng = np.random.default_rng(seed)
    delays = rng.uniform(1.0, S, size=(B, U)).astype(np.float32)
    src_lens = np.full((B,), float(S), np.float32)
    src_lens[1] = 8.0
    tgt_lens = np.array([U, U - 2, U - 4])
    tgt_mask = np.arange(U)[None] < tgt_lens[:, None]
    delays = delays * tgt_mask
    return delays, src_lens, tgt_mask, tgt_lens


class TestMetricsVsReferenceLoops:
    def test_average_proportion(self):
        delays, src_lens, tgt_mask, tgt_lens = _rand_case(0)
        got = np.asarray(average_proportion(
            jnp.asarray(delays), jnp.asarray(src_lens), jnp.asarray(tgt_mask)))
        want = delays.sum(-1) / (src_lens * tgt_lens)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_differentiable_average_lagging_matches_loop(self):
        """cummax closed form == reference recurrence latency.py:163-181."""
        delays, src_lens, tgt_mask, tgt_lens = _rand_case(1)
        B, U = delays.shape
        gamma = tgt_lens / src_lens
        new_delays = np.zeros_like(delays)
        for i in range(U):
            if i == 0:
                new_delays[:, i] = delays[:, i]
            else:
                new_delays[:, i] = np.maximum(
                    new_delays[:, i - 1] + 1.0 / gamma, delays[:, i]
                )
        dal = new_delays - np.arange(U)[None] / gamma[:, None]
        dal = dal * tgt_mask
        want = dal.sum(-1) / tgt_lens
        got = np.asarray(differentiable_average_lagging(
            jnp.asarray(delays), jnp.asarray(src_lens), jnp.asarray(tgt_mask)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_average_lagging_matches_loop(self):
        delays, src_lens, tgt_mask, tgt_lens = _rand_case(2)
        # force one row to actually reach the source end mid-sentence
        delays[0, 4:] = src_lens[0] + 1.0
        delays = delays * tgt_mask
        B, U = delays.shape
        gamma = tgt_lens / src_lens
        want = np.zeros(B)
        for b in range(B):
            lag, tau = 0.0, 0
            for i in range(int(tgt_lens[b])):
                lag += delays[b, i] - i / gamma[b]
                tau += 1
                if delays[b, i] >= src_lens[b]:
                    break
            want[b] = lag / tau
        got = np.asarray(average_lagging(
            jnp.asarray(delays), jnp.asarray(src_lens), jnp.asarray(tgt_mask)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_average_lagging_nonmonotone_delays(self):
        """Expected delays can dip back below |x| after reaching it; the
        reference loop still stops at the FIRST reach (code-review r3)."""
        delays = np.asarray([[3.0, 10.0, 2.0, 2.0, 2.0]], np.float32)
        src_lens = np.asarray([10.0], np.float32)
        tgt_mask = np.ones((1, 5), bool)
        gamma = 5.0 / 10.0
        want = ((3.0 - 0 / gamma) + (10.0 - 1 / gamma)) / 2  # stops at i=1
        got = float(average_lagging(
            jnp.asarray(delays), jnp.asarray(src_lens), jnp.asarray(tgt_mask))[0])
        assert got == pytest.approx(want)

    def test_variance_delay(self):
        rng = np.random.default_rng(3)
        d = rng.uniform(1, 10, size=(2, 4, 6)).astype(np.float32)
        mask = np.ones((2, 6), bool)
        mask[1, 4:] = False
        d = d * mask[:, None]
        got = np.asarray(variance_delay(
            jnp.asarray(d), jnp.asarray([6.0, 6.0]), jnp.asarray(mask)))
        var = d.var(axis=1, ddof=1) * mask
        want = var.sum(-1) / mask.sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestExpectedDelays:
    def test_uniform_attention_mid_delay(self):
        B, HL, U, S = 1, 2, 3, 10
        attn = jnp.full((B, HL, U, S), 1.0 / S)
        delays, src_lens = expected_delays_from_attention(attn)
        # E[steps 1..10] = 5.5
        np.testing.assert_allclose(np.asarray(delays), 5.5, rtol=1e-6)
        assert float(src_lens[0]) == S

    def test_residual_mass_moves_to_last(self):
        attn = jnp.zeros((1, 1, 1, 4)).at[0, 0, 0, 0].set(0.5)
        d_keep, _ = expected_delays_from_attention(attn, stay_on_last_token=True)
        d_push, _ = expected_delays_from_attention(attn, stay_on_last_token=False)
        assert float(d_keep[0, 0, 0]) == pytest.approx(0.5)
        # half the mass lands on step 4
        assert float(d_push[0, 0, 0]) == pytest.approx(0.5 + 0.5 * 4)


class TestTrainingLoss:
    def test_penalty_orders_early_vs_late_attention(self):
        """Attention on late source steps must cost more latency."""
        B, HL, U, S = 2, 2, 4, 8
        early = np.zeros((B, HL, U, S), np.float32)
        early[..., 0] = 1.0
        late = np.zeros((B, HL, U, S), np.float32)
        late[..., -1] = 1.0
        mask = jnp.ones((B, U), bool)
        cfg = LatencyTrainingConfig(latency_weight_avg=1.0)
        l_early = float(latency_training_loss(jnp.asarray(early), None, mask, cfg))
        l_late = float(latency_training_loss(jnp.asarray(late), None, mask, cfg))
        assert l_late > l_early

    def test_penalty_is_differentiable(self):
        cfg = LatencyTrainingConfig(latency_weight_avg=0.5, latency_weight_var=0.3)
        mask = jnp.ones((1, 3), bool)

        def f(logits):
            attn = jax.nn.softmax(logits, -1)
            return latency_training_loss(attn, None, mask, cfg)

        g = jax.grad(f)(jnp.zeros((1, 2, 3, 5)))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_criterion_end_to_end(self):
        crit = build_criterion(
            "latency_augmented_label_smoothed_cross_entropy",
            {"latency_weight_avg": 0.1, "latency_weight_var": 0.1},
        )
        rng = np.random.default_rng(0)
        B, U, V, S = 2, 5, 11, 7
        out = {
            "decoder_logits": jnp.asarray(rng.normal(size=(B, U, V)), jnp.float32),
            "cross_attn": jax.nn.softmax(
                jnp.asarray(rng.normal(size=(B, 3, U, S)), jnp.float32), -1
            ),
            "encoder_lengths": jnp.asarray([7, 5]),
        }
        tgt = rng.integers(2, V, size=(B, U)).astype(np.int32)
        tgt[1, 3:] = 1  # pad
        loss, n, logs = crit(out, {"target": jnp.asarray(tgt)})
        assert np.isfinite(float(loss))
        assert "latency_loss" in logs and float(logs["latency_loss"]) > 0
        # without attention the loss falls back to plain CE
        out2 = dict(out)
        out2.pop("cross_attn")
        loss2, _, logs2 = crit(out2, {"target": jnp.asarray(tgt)})
        assert "latency_loss" not in logs2
        assert float(loss2) < float(loss)


class TestTaskIntegration:
    def test_speech_task_trains_with_latency_criterion(self, tmp_path):
        """CLI train with the latency-augmented criterion: the task applies
        the model with mutable intermediates, stacks the sown cross-attention,
        and the criterion reports a positive latency_loss."""
        from s2t_tpu.cli.train import main as train_main
        from tests.test_binaries import make_tiny_corpus, tiny_train_cfg

        data = make_tiny_corpus(tmp_path / "data", n=6, T=16)
        cfg = tiny_train_cfg(data, tmp_path / "ckpt", max_epoch=1)
        cfg.criterion = "latency_augmented_label_smoothed_cross_entropy"
        cfg.criterion_cfg = {"latency_weight_avg": 0.2, "label_smoothing": 0.0}
        out = train_main(cfg)
        last = out["history"][-1]
        assert np.isfinite(last["loss"])
        # with label_smoothing=0 CE == NLL, so any loss-over-nll gap is the
        # latency penalty flowing through the captured cross-attention
        assert last["loss"] > last["nll_loss"] + 1e-4
        # and validation history carries the criterion's own log for it
        assert float(last["latency_loss"]) > 0.0


class TestCompositeCriterions:
    def test_model_criterion_weighted_sum(self):
        from s2t_tpu.criterions import build_criterion

        crit = build_criterion(
            "model", {"loss_weights": {"a": 2.0, "b": 0.5, "c": 0.0},
                      "log_keys": ["extra"]},
        )
        out = {"losses": {"a": jnp.asarray(1.0), "b": jnp.asarray(4.0),
                          "c": jnp.asarray(100.0)},
               "sample_size": 7.0, "extra": jnp.asarray(3.0)}
        loss, n, logs = crit(out, {"ntokens": 7.0})
        assert float(loss) == pytest.approx(2.0 * 1.0 + 0.5 * 4.0)
        assert float(n) == 7.0
        assert float(logs["extra"]) == 3.0
        assert "loss_c" not in logs  # zero-weighted terms dropped

    def test_composite_loss_averages_pairs(self):
        from s2t_tpu.criterions import build_criterion

        crit = build_criterion(
            "composite_loss",
            {"underlying_criterion": "label_smoothed_cross_entropy",
             "underlying_cfg": {"label_smoothing": 0.0}},
        )
        rng = np.random.default_rng(0)
        B, U, V = 2, 4, 9
        mk = lambda s: {"decoder_logits": jnp.asarray(
            np.random.default_rng(s).normal(size=(B, U, V)), jnp.float32)}
        tgt = jnp.asarray(rng.integers(2, V, size=(2, B, U)), jnp.int32)
        out = {"outputs": (mk(1), mk(2))}
        loss, n, logs = crit(out, {"targets": tgt})
        l1, n1, _ = crit.underlying(mk(1), {"target": tgt[0]})
        l2, n2, _ = crit.underlying(mk(2), {"target": tgt[1]})
        assert float(loss) == pytest.approx((float(l1) + float(l2)) / 2, rel=1e-6)

"""Trainer integration: data-parallel training on the 8-device CPU mesh.

The TPU-native analogue of the reference's distributed trainer tests
(reference: tests/distributed/test_bmuf.py style convergence checks) — here
the mesh provides real data parallelism in one process.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import OptimizationConfig
from s2t_tpu.criterions.build import build_criterion
from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel
from s2t_tpu.parallel.mesh import make_mesh
from s2t_tpu.trainer import Trainer

V = 20


def tiny_model():
    return S2TTransformerModel(
        S2TTransformerConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
            decoder_layers=1, decoder_attention_heads=2, vocab_size=V,
            subsampling_filter=64, dropout=0.1, max_target_positions=32,
        )
    )


def make_batch(rng, B=8, T=32, U=6):
    feats = rng.normal(size=(B, T, 80)).astype(np.float32)
    targets = rng.integers(4, V, size=(B, U)).astype(np.int32)
    targets[:, -1] = 2  # eos
    prev = np.roll(targets, 1, axis=1)
    prev[:, 0] = 2  # eos-shifted prev_output_tokens (fairseq convention)
    return {
        "features": jnp.asarray(feats),
        "feat_lengths": jnp.full((B,), T, jnp.int32),
        "prev_tokens": jnp.asarray(prev),
        "target": jnp.asarray(targets),
        "transcript": jnp.asarray(targets[:, :-1]),
        "transcript_lengths": jnp.full((B,), U - 1, jnp.int32),
        "ntokens": jnp.asarray(B * U, jnp.float32),
    }


class TestTrainer:
    def test_loss_decreases(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        model = tiny_model()
        criterion = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"ctc": {"ctc_weight": 0.3}},
        )
        trainer = Trainer(
            model, criterion,
            OptimizationConfig(lr=1e-3, warmup_updates=5, clip_norm=1.0),
            mesh=mesh,
        )
        rng = np.random.default_rng(0)
        batch = make_batch(rng)
        state = trainer.init_state(batch)
        first = None
        for i in range(12):
            state, metrics = trainer.train_step(state, batch)
            loss = float(metrics["loss"])
            if first is None:
                first = loss
        assert int(state.step) == 12
        assert loss < first, (first, loss)
        assert np.isfinite(float(metrics["gnorm"]))
        assert float(metrics["lr"]) > 0

    def test_valid_step(self):
        mesh = make_mesh()
        model = tiny_model()
        criterion = build_criterion("label_smoothed_cross_entropy")
        trainer = Trainer(model, criterion, OptimizationConfig(), mesh=mesh)
        batch = make_batch(np.random.default_rng(1))
        state = trainer.init_state(batch)
        logs = trainer.valid_step(state, batch)
        assert np.isfinite(float(logs["loss"]))

    def test_grad_accumulation(self):
        mesh = make_mesh()
        model = tiny_model()
        criterion = build_criterion("label_smoothed_cross_entropy")
        trainer = Trainer(
            model, criterion, OptimizationConfig(update_freq=2, lr=1e-3), mesh=mesh
        )
        rng = np.random.default_rng(2)
        single = make_batch(rng)
        state = trainer.init_state(single)
        stacked = jax.tree.map(
            lambda a, b: jnp.stack([a, b]), single, make_batch(rng)
        )
        state, metrics = trainer.train_step(state, stacked)
        assert int(state.step) == 1
        assert np.isfinite(float(metrics["loss"]))

    def test_lr_schedule_inverse_sqrt(self):
        from s2t_tpu.optim import build_lr_schedule

        cfg = OptimizationConfig(lr=2e-3, warmup_updates=100, warmup_init_lr=1e-7)
        sched = build_lr_schedule(cfg)
        lrs = [float(sched(jnp.asarray(s))) for s in [1, 50, 100, 400]]
        assert lrs[0] < lrs[1] < lrs[2]
        assert abs(lrs[2] - 2e-3) < 1e-4
        assert abs(lrs[3] - 2e-3 * (100 / 400) ** 0.5) < 1e-5


class TestFusedAdamSkip:
    def test_matches_generic_wrapper(self):
        """fused_adamw_skip_nonfinite == skip_nonfinite(chain(clip, adamw))
        through a mixed finite/NaN gradient sequence."""
        import optax

        from s2t_tpu.config import OptimizationConfig
        from s2t_tpu.optim.builders import (
            fused_adamw_skip_nonfinite,
            skip_nonfinite,
        )

        cfg = OptimizationConfig(
            lr=1e-2, clip_norm=0.5, weight_decay=0.01,
            adam_betas=(0.9, 0.98), adam_eps=1e-8,
        )
        sched = lambda step: 1e-2 * (0.9 ** step)
        fused = fused_adamw_skip_nonfinite(cfg, sched, max_consecutive_errors=3)
        ref = skip_nonfinite(
            optax.chain(
                optax.clip_by_global_norm(0.5),
                optax.adamw(sched, b1=0.9, b2=0.98, eps=1e-8, weight_decay=0.01),
            ),
            max_consecutive_errors=3,
        )
        rng = np.random.default_rng(0)
        params = {"a": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
                  "b": jnp.asarray(rng.normal(size=(3, 4)), jnp.float32)}
        p_f, p_r = params, params
        s_f, s_r = fused.init(params), ref.init(params)
        for i in range(8):
            if i in (2, 5):
                g = {"a": jnp.full((8,), jnp.nan), "b": jnp.ones((3, 4))}
            else:
                g = {"a": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
                     "b": jnp.asarray(rng.normal(size=(3, 4)), jnp.float32)}
            u_f, s_f = fused.update(g, s_f, p_f)
            u_r, s_r = ref.update(g, s_r, p_r)
            p_f = optax.apply_updates(p_f, u_f)
            p_r = optax.apply_updates(p_r, u_r)
            for k in params:
                np.testing.assert_allclose(
                    np.asarray(p_f[k]), np.asarray(p_r[k]), rtol=1e-6,
                    err_msg=f"step {i} param {k}",
                )
        assert int(s_f.notfinite_count) == int(s_r.notfinite_count)

    def test_gives_up_after_max_consecutive(self):
        from s2t_tpu.config import OptimizationConfig
        from s2t_tpu.optim.builders import fused_adamw_skip_nonfinite

        cfg = OptimizationConfig(lr=1e-2, clip_norm=0.0, weight_decay=0.0)
        tx = fused_adamw_skip_nonfinite(
            cfg, lambda s: 1e-2, max_consecutive_errors=2
        )
        params = {"w": jnp.ones((2,))}
        state = tx.init(params)
        bad = {"w": jnp.full((2,), jnp.nan)}
        for i in range(3):
            up, state = tx.update(bad, state, params)
            if i < 2:
                assert np.all(np.asarray(up["w"]) == 0.0), i
        # past the cap the bad update is applied so the NaN surfaces loudly
        assert not np.any(np.isfinite(np.asarray(up["w"])))


class TestSkipNonFinite:
    def test_nonfinite_grads_skip_update(self):
        """A NaN gradient leaves params and adam state untouched and bumps
        the consecutive counter; a finite one resets it (reference:
        DynamicLossScaler overflow-skip, trainer.py:777-781)."""
        import optax

        from s2t_tpu.optim.builders import skip_nonfinite

        tx = skip_nonfinite(optax.adam(1e-2), max_consecutive_errors=3)
        params = {"w": jnp.ones((4,))}
        state = tx.init(params)
        bad = {"w": jnp.full((4,), jnp.nan)}
        good = {"w": jnp.ones((4,))}

        up, state = tx.update(bad, state, params)
        assert np.all(np.asarray(up["w"]) == 0.0)
        assert int(state.notfinite_count) == 1
        up, state = tx.update(good, state, params)
        assert np.all(np.isfinite(np.asarray(up["w"])))
        assert np.any(np.asarray(up["w"]) != 0.0)
        assert int(state.notfinite_count) == 0

    def test_gives_up_after_max_consecutive(self):
        import optax

        from s2t_tpu.optim.builders import skip_nonfinite

        tx = skip_nonfinite(optax.sgd(1.0), max_consecutive_errors=2)
        params = {"w": jnp.ones((2,))}
        state = tx.init(params)
        bad = {"w": jnp.full((2,), jnp.nan)}
        for _ in range(3):
            up, state = tx.update(bad, state, params)
            assert np.all(np.asarray(up["w"]) == 0.0) or np.isnan(
                np.asarray(up["w"])
            ).any()
        # counter exceeded: the NaN now propagates (loud failure)
        up, _ = tx.update(bad, state, params)
        assert np.isnan(np.asarray(up["w"])).any()

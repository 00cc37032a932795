"""Emformer streaming encoder tests.

(reference behaviours: models/speech_to_text/modules/emformer.py —
bounded-latency block attention with memory bank; offline forward must equal
segment-by-segment streaming.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.models.streaming import EmformerConfig, EmformerModel


def tiny_cfg(**kw):
    return EmformerConfig(
        encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
        encoder_attention_heads=2, subsampling_filter=32, segment_size=4,
        left_context=4, right_context=2, max_memory_size=3,
        vocab_size=16, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0,
    ).replace(**kw)


class TestEmformer:
    def test_offline_forward(self):
        cfg = tiny_cfg()
        model = EmformerModel(cfg)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(2, 96, 80)), jnp.float32)
        lens = jnp.asarray([96, 64], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, lens)
        out = model.apply(params, feats, lens)
        T = out["encoder_out"].shape[1]
        assert out["ctc_logits"].shape == (2, T, 16)
        assert np.isfinite(np.asarray(out["encoder_out"])).all()

    def test_streaming_matches_offline(self):
        """Segment-by-segment streaming_step reproduces the offline forward —
        the bounded-context structure makes them exactly equal."""
        cfg = tiny_cfg()
        model = EmformerModel(cfg)
        rng = np.random.default_rng(1)
        # choose raw T so post-subsample frames = n_seg * S exactly
        # subsample: T'=(T-1)//2+1 twice; T=93 -> 47 -> 24 = 6 segments of 4
        feats = jnp.asarray(rng.normal(size=(1, 93, 80)), jnp.float32)
        lens = jnp.asarray([93], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, lens)
        off = model.apply(params, feats, lens)
        off_logits = np.asarray(off["ctc_logits"])

        # offline forward consumed subsampled frames; streaming gets the SAME
        # subsampled frames via a pass-through: emulate by running subsample
        # once and feeding segments through _process_segment like
        # streaming_step does internally
        S, R = cfg.segment_size, cfg.right_context
        sub, out_lens = model.apply(
            params, feats.astype(jnp.float32), lens,
            method=lambda m, f, l: m.subsample(f, l),
        )
        sub = sub * jnp.sqrt(cfg.encoder_embed_dim)
        T = int(out_lens[0])
        subp = jnp.pad(sub, ((0, 0), (0, S + R), (0, 0)))
        states = model.apply(params, 1, method=EmformerModel.init_stream_state)
        outs = []
        n_seg = T // S
        for i in range(n_seg):
            seg = subp[:, i * S : i * S + S + R]
            seg_valid = (jnp.arange(S + R)[None, :] + i * S) < T
            y, states = model.apply(
                params, seg, seg_valid, states, True,
                method=lambda m, s, v, st, d: m._process_segment(s, v, st, d),
            )
            outs.append(y[:, :S])
        stream = jnp.concatenate(outs, axis=1)
        stream = model.apply(params, stream,
                             method=lambda m, x: m.ctc_head(m.final_norm(x), True))
        np.testing.assert_allclose(
            np.asarray(stream), off_logits[:, : n_seg * S], atol=2e-4
        )

    def test_latency_bounded_no_future_leak(self):
        """Changing audio far in the future must not change early outputs
        beyond the declared lookahead."""
        cfg = tiny_cfg()
        model = EmformerModel(cfg)
        rng = np.random.default_rng(2)
        feats = np.asarray(rng.normal(size=(1, 96, 80)), np.float32)
        lens = jnp.asarray([96], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), lens)
        out1 = np.asarray(model.apply(params, jnp.asarray(feats), lens)["encoder_out"])
        feats2 = feats.copy()
        feats2[:, 80:] += 100.0  # perturb the far future
        out2 = np.asarray(model.apply(params, jnp.asarray(feats2), lens)["encoder_out"])
        # early frames (first segment, well before the perturbation window
        # minus lookahead) identical
        np.testing.assert_allclose(out1[:, :4], out2[:, :4], atol=1e-5)


class TestAugmentedMemoryKnobs:
    """memory_tanh + attention_std_scale (reference:
    augmented_memory_attention.py tanh_on_mem / std_scale suppression)."""

    def test_memory_tanh_bounds_bank(self):
        from s2t_tpu.models.streaming import EmformerLayer

        state = {
            "memory": jnp.zeros((1, 2, 4)), "memory_valid": jnp.zeros((1, 2), bool),
            "left": jnp.zeros((1, 2, 4)), "left_valid": jnp.zeros((1, 2), bool),
        }
        big = jnp.full((1, 3, 4), 50.0)
        valid = jnp.ones((1, 3), bool)
        st = EmformerLayer.update_state(state, big, big, valid, 3, tanh=True)
        assert float(jnp.max(jnp.abs(st["memory"]))) <= 1.0
        st2 = EmformerLayer.update_state(state, big, big, valid, 3, tanh=False)
        assert float(jnp.max(jnp.abs(st2["memory"]))) > 1.0

    def test_attention_suppression_masks_weak_keys(self):
        from s2t_tpu.modules.attention import attention_suppression

        # one dominant key, several weak.  probs ~ [1, 4x~0]: mean 0.2,
        # std ~0.447 -> with scale=0.3 the threshold 0.2 - 0.134 = 0.066
        # sits above the weak probs, which must be -inf'd
        scores = jnp.asarray([[10.0, 0.0, 0.0, 0.0, 0.0]])
        out = np.asarray(attention_suppression(scores, scale=0.3))
        assert out[0, 0] == pytest.approx(10.0)
        assert (out[0, 1:] < -1e8).all()
        # uniform scores: std 0, nothing falls below the threshold
        flat = jnp.zeros((1, 5))
        out2 = np.asarray(attention_suppression(flat, scale=0.3))
        np.testing.assert_allclose(out2, 0.0, atol=1e-6)

    def test_streaming_with_knobs_runs(self):
        import jax
        from s2t_tpu.models.streaming import EmformerConfig, EmformerModel

        cfg = EmformerConfig(
            encoder_embed_dim=16, encoder_ffn_embed_dim=32,
            encoder_attention_heads=2, encoder_layers=1, segment_size=4,
            left_context=4, max_memory_size=2, vocab_size=8,
            memory_tanh=True, attention_std_scale=0.5,
        )
        model = EmformerModel(cfg)
        feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 40, 80)),
                            jnp.float32)
        lens = jnp.asarray([40, 28])
        params = model.init(jax.random.PRNGKey(0), feats, lens)["params"]
        out = model.apply({"params": params}, feats, lens)
        assert np.isfinite(np.asarray(out["ctc_logits"], np.float32)).all()

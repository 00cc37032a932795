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

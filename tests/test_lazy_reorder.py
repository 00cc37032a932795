"""Lazy beam reorder (ancestry KV cache) == eager cache reorder, exactly.

(no reference equivalent — a serving optimization: the beam loop never
physically reorders the (B*K, L, H, Dh) caches; a (B, K, L) ancestry map
rides in the cache pytree and attention one-hot-selects ancestor slots,
modules/attention.py cache_ancestry + inference/generator.py lazy path.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.inference.generator import SequenceGenerator
from s2t_tpu.registry import ARCHS
from s2t_tpu.models.s2t_transformer import S2TTransformerModel


def tiny_model(vocab=48):
    _, preset = ARCHS.get("s2t_transformer_xs")
    cfg = preset(
        vocab_size=vocab, encoder_layers=2, decoder_layers=3,
        encoder_embed_dim=32, decoder_embed_dim=32,
        encoder_ffn_embed_dim=64, decoder_ffn_embed_dim=64,
        encoder_attention_heads=2, decoder_attention_heads=2,
        subsampling_filter=32, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, max_target_positions=32,
    )
    return S2TTransformerModel(cfg)


class TestLazyReorder:
    def _setup(self, B=4, T=80):
        model = tiny_model()
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
        lengths = jnp.asarray([T, T - 16, T - 30, 50][:B])
        prev = jnp.asarray(rng.integers(4, 48, size=(B, 5)), jnp.int32)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            feats, lengths, prev,
        )["params"]
        return model, params, feats, lengths

    def _gen(self, model, lazy, beam=4, **kw):
        return SequenceGenerator(
            model, beam_size=beam, max_len_b=14, eos_id=2, pad_id=1,
            max_target_positions=16, lazy_beam_reorder=lazy, **kw,
        )

    def test_tokens_and_scores_identical(self):
        model, params, feats, lengths = self._setup()
        batch = {"features": feats, "feat_lengths": lengths}
        t_eager, s_eager, _ = self._gen(model, False).generate(params, batch)
        t_lazy, s_lazy, _ = self._gen(model, True).generate(params, batch)
        np.testing.assert_array_equal(np.asarray(t_eager), np.asarray(t_lazy))
        np.testing.assert_allclose(
            np.asarray(s_eager), np.asarray(s_lazy), rtol=1e-5, atol=1e-6
        )

    def test_identical_with_ctc_joint_and_lenpen(self):
        model, params, feats, lengths = self._setup()
        batch = {"features": feats, "feat_lengths": lengths}
        kw = dict(infer_ctc_weight=0.3, lenpen=0.7)
        t_eager, s_eager, _ = self._gen(model, False, **kw).generate(params, batch)
        t_lazy, s_lazy, _ = self._gen(model, True, **kw).generate(params, batch)
        np.testing.assert_array_equal(np.asarray(t_eager), np.asarray(t_lazy))
        np.testing.assert_allclose(
            np.asarray(s_eager), np.asarray(s_lazy), rtol=1e-5, atol=1e-6
        )

    def test_tiered_prefix_cache_identical_long_maxlen(self):
        # max_len >= 3*CHUNK exercises the eager path's tiered KV-cache
        # prefix (beam_search.py run_tiers: sliced cache per tier); the lazy
        # path never slices, so agreement proves the tiers are exact
        model, params, feats, lengths = self._setup()
        batch = {"features": feats, "feat_lengths": lengths}
        kw = dict(max_len_b=52, max_target_positions=64)
        t_eager, s_eager, _ = SequenceGenerator(
            model, beam_size=4, eos_id=2, pad_id=1,
            lazy_beam_reorder=False, **kw,
        ).generate(params, batch)
        t_lazy, s_lazy, _ = SequenceGenerator(
            model, beam_size=4, eos_id=2, pad_id=1,
            lazy_beam_reorder=True, **kw,
        ).generate(params, batch)
        np.testing.assert_array_equal(np.asarray(t_eager), np.asarray(t_lazy))
        np.testing.assert_allclose(
            np.asarray(s_eager), np.asarray(s_lazy), rtol=1e-5, atol=1e-6
        )

    def test_identical_beam_2_and_8(self):
        model, params, feats, lengths = self._setup(B=2)
        batch = {"features": feats, "feat_lengths": lengths}
        for beam in (2, 8):
            t_eager, _, _ = self._gen(model, False, beam=beam).generate(
                params, batch
            )
            t_lazy, _, _ = self._gen(model, True, beam=beam).generate(
                params, batch
            )
            np.testing.assert_array_equal(
                np.asarray(t_eager), np.asarray(t_lazy), err_msg=f"beam={beam}"
            )

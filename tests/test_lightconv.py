"""LightConv / DynamicConv model tests.

(reference behaviours: fairseq/models/lightconv.py + the CUDA kernels in
modules/{lightconv,dynamicconv}_layer — here banded-gather einsums.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.models.lightconv import LightConvConfig, LightConvModel
from s2t_tpu.modules.lightconv import LightweightConv, unfold_windows

V = 20


def tiny_cfg(**kw):
    return LightConvConfig(
        encoder_kernel_sizes=(3, 7), decoder_kernel_sizes=(3, 7),
        encoder_embed_dim=32, encoder_conv_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=2, decoder_embed_dim=32, decoder_conv_dim=32,
        decoder_ffn_embed_dim=64, decoder_attention_heads=2,
        dropout=0.0, attention_dropout=0.0, weight_dropout=0.0,
        vocab_size=V, max_target_positions=32,
    ).replace(**kw)


class TestConvOps:
    def test_unfold_causal(self):
        x = jnp.arange(5, dtype=jnp.float32).reshape(1, 5, 1)
        w = unfold_windows(x, 3, causal=True)
        # window at t: [x[t-2], x[t-1], x[t]]
        np.testing.assert_allclose(np.asarray(w[0, 0, :, 0]), [0, 0, 0])
        np.testing.assert_allclose(np.asarray(w[0, 2, :, 0]), [0, 1, 2])
        np.testing.assert_allclose(np.asarray(w[0, 4, :, 0]), [2, 3, 4])

    def test_unfold_centered(self):
        x = jnp.arange(5, dtype=jnp.float32).reshape(1, 5, 1)
        w = unfold_windows(x, 3, causal=False)
        np.testing.assert_allclose(np.asarray(w[0, 2, :, 0]), [1, 2, 3])

    def test_lightweight_conv_incremental_matches_full(self):
        conv = LightweightConv(dim=8, kernel_size=3, num_heads=2, causal=True)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 6, 8)), jnp.float32)
        params = conv.init(jax.random.PRNGKey(0), x)
        full, _ = conv.apply(params, x)
        cache = jnp.zeros((2, 2, 8))
        steps = []
        for t in range(6):
            out, cache = conv.apply(params, x[:, t : t + 1], True, cache)
            steps.append(out[:, 0])
        inc = jnp.stack(steps, axis=1)
        np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-5)


@pytest.mark.parametrize("conv_type", ["lightweight", "dynamic"])
class TestLightConvModel:
    def test_forward_and_generate(self, conv_type):
        cfg = tiny_cfg(conv_type=conv_type)
        model = LightConvModel(cfg)
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.integers(4, V, size=(2, 7)), jnp.int32)
        lens = jnp.full((2,), 7, jnp.int32)
        prev = jnp.asarray([[2, 5, 6], [2, 7, 8]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), src, lens, prev)["params"]
        out = model.apply({"params": params}, src, lens, prev)
        assert out["decoder_logits"].shape == (2, 3, V)

        # teacher-forced vs incremental consistency
        tf_logits = np.asarray(out["decoder_logits"])
        cache = model.apply({"params": params}, 2, 8,
                            method=LightConvModel.init_cache)
        enc = model.apply({"params": params}, src, lens,
                          method=LightConvModel.encode)
        from s2t_tpu.utils.masking import lengths_to_mask

        em = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        for t in range(3):
            logit, cache = model.apply(
                {"params": params}, prev[:, t : t + 1], cache, jnp.asarray(t),
                enc["encoder_out"], em, method=LightConvModel.decode_step,
            )
            np.testing.assert_allclose(
                np.asarray(logit), tf_logits[:, t], atol=1e-4,
                err_msg=f"{conv_type} step {t}",
            )

        from s2t_tpu.inference.generator import SequenceGenerator

        gen = SequenceGenerator(model, beam_size=2, max_len_b=6, eos_id=2,
                                pad_id=1, max_target_positions=16,
                                input_keys=("src_tokens", "src_lengths"))
        tokens, scores, _ = gen.generate(
            params, {"src_tokens": src, "src_lengths": lens}
        )
        assert np.isfinite(np.asarray(scores)).all()

"""ConvS2S (fconv) model tests.

(reference behaviours: fairseq/models/fconv.py:29-756 and the fconv rows of
tests/test_binaries.py — forward, incremental-vs-teacher-forced parity,
beam decode, tiny-data convergence.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from s2t_tpu.models.build import build_model
from s2t_tpu.models.fconv import FConvConfig, FConvModel
from s2t_tpu.utils.masking import lengths_to_mask

V = 22


def tiny_cfg(**kw):
    return FConvConfig(
        encoder_embed_dim=16, encoder_convs=((16, 3), (24, 3)),
        decoder_embed_dim=16, decoder_convs=((16, 3), (24, 3)),
        decoder_out_embed_dim=16, vocab_size=V, dropout=0.0,
        max_source_positions=64, max_target_positions=64, **kw,
    )


def data(B=2, T=6, U=3, seed=0):
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.integers(4, V, size=(B, T)), jnp.int32)
    lens = jnp.asarray([T, T - 2], jnp.int32)
    src = src.at[1, T - 2 :].set(1)
    prev = jnp.asarray(rng.integers(4, V, size=(B, U)), jnp.int32)
    prev = prev.at[:, 0].set(2)
    return src, lens, prev


class TestFConv:
    def test_forward_shapes(self):
        model = FConvModel(tiny_cfg())
        src, lens, prev = data()
        params = model.init(jax.random.PRNGKey(0), src, lens, prev)["params"]
        out = model.apply({"params": params}, src, lens, prev)
        assert out["decoder_logits"].shape == (2, 3, V)
        assert np.isfinite(np.asarray(out["decoder_logits"])).all()

    def test_incremental_matches_teacher_forced(self):
        model = FConvModel(tiny_cfg())
        src, lens, prev = data()
        params = model.init(jax.random.PRNGKey(0), src, lens, prev)["params"]
        tf = np.asarray(
            model.apply({"params": params}, src, lens, prev)["decoder_logits"]
        )
        enc = model.apply({"params": params}, src, lens, method=FConvModel.encode)
        em = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        cache = model.apply({"params": params}, 2, 8, method=FConvModel.init_cache)
        for t in range(prev.shape[1]):
            logit, cache = model.apply(
                {"params": params}, prev[:, t : t + 1], cache, jnp.asarray(t),
                enc["encoder_out"], em, method=FConvModel.decode_step,
            )
            np.testing.assert_allclose(np.asarray(logit), tf[:, t], atol=2e-4)

    def test_generate(self):
        from s2t_tpu.inference.generator import SequenceGenerator

        model = FConvModel(tiny_cfg())
        src, lens, prev = data()
        params = model.init(jax.random.PRNGKey(0), src, lens, prev)["params"]
        gen = SequenceGenerator(
            model, beam_size=2, max_len_b=8, eos_id=2, pad_id=1,
            max_target_positions=32, input_keys=("src_tokens", "src_lengths"),
        )
        tokens, scores, _ = gen.generate(
            params, {"src_tokens": src, "src_lengths": lens}
        )
        assert tokens.shape[:2] == (2, 2)
        assert np.isfinite(np.asarray(scores)).all()

    def test_registry_presets(self):
        m = build_model(
            "fconv_iwslt_de_en",
            {"encoder_convs": ((16, 3),) * 2, "decoder_convs": ((16, 3),) * 2,
             "encoder_embed_dim": 16, "decoder_embed_dim": 16,
             "decoder_out_embed_dim": 16, "dropout": 0.0},
            vocab_size=V,
        )
        src, lens, prev = data()
        p = m.init(jax.random.PRNGKey(0), src, lens, prev)
        out = m.apply(p, src, lens, prev)
        assert out["decoder_logits"].shape[-1] == V

    @pytest.mark.slow
    def test_tiny_convergence(self):
        """A 2-layer fconv memorises an 8-pair copy task (the reference's
        test_binaries-style convergence check)."""
        model = FConvModel(tiny_cfg())
        rng = np.random.default_rng(1)
        src = jnp.asarray(rng.integers(4, V, size=(8, 5)), jnp.int32)
        lens = jnp.full((8,), 5, jnp.int32)
        tgt = jnp.concatenate([src[:, :4], jnp.full((8, 1), 2, jnp.int32)], 1)
        prev = jnp.concatenate([jnp.full((8, 1), 2, jnp.int32), tgt[:, :-1]], 1)
        params = model.init(jax.random.PRNGKey(0), src, lens, prev)["params"]
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                logits = model.apply({"params": p}, src, lens, prev)[
                    "decoder_logits"
                ]
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
                return nll.mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        first = None
        for i in range(150):
            params, opt_state, loss = step(params, opt_state)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.2, (first, float(loss))

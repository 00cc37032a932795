"""VGGBlock / LocationAttention / CharacterTokenEmbedder tests.

(reference: fairseq/modules/{vggblock,location_attention,
character_token_embedder}.py — behavioural properties asserted here mirror
the torch originals: pooled output dims, masked softmax alignments that
respond to attention history, char-composed embeddings with special-symbol
overrides.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.modules.legacy import (
    CharacterTokenEmbedder,
    Highway,
    LocationAttention,
    VGGBlock,
)


class TestVGGBlock:
    def test_shapes_and_ceil_pooling(self):
        blk = VGGBlock(in_channels=1, out_channels=32, input_dim=80)
        x = jnp.zeros((2, 25, 80, 1))  # T=25 odd -> ceil(25/2)=13
        params = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(params, x)
        assert y.shape == (2, 13, 40, 32)
        assert blk.output_freq_dim == 40
        assert blk.total_output_dim == 40 * 32

    def test_stacked_front_end(self):
        b1 = VGGBlock(1, 64, input_dim=80, layer_norm=True)
        b2 = VGGBlock(64, 128, input_dim=b1.output_freq_dim)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 20, 80, 1)),
                        jnp.float32)
        p1 = b1.init(jax.random.PRNGKey(0), x)
        h = b1.apply(p1, x)
        p2 = b2.init(jax.random.PRNGKey(1), h)
        y = b2.apply(p2, h)
        assert y.shape == (2, 5, 20, 128)
        assert np.isfinite(np.asarray(y)).all()


class TestLocationAttention:
    def _mk(self):
        return LocationAttention(
            attn_dim=16, encoder_dim=24, decoder_dim=12,
            attn_state_kernel_size=1, conv_dim=4, conv_kernel_size=3,
        )

    def test_masked_softmax_and_context(self):
        att = self._mk()
        rng = np.random.default_rng(0)
        enc = jnp.asarray(rng.normal(size=(2, 9, 24)), jnp.float32)
        valid = jnp.asarray(np.arange(9)[None] < np.array([[9], [5]]))
        h = jnp.asarray(rng.normal(size=(2, 12)), jnp.float32)
        state = jnp.zeros((2, 1, 9))
        params = att.init(jax.random.PRNGKey(0), enc, valid, h, state)
        c, w = att.apply(params, enc, valid, h, state)
        w = np.asarray(w)
        np.testing.assert_allclose(w.sum(1), 1.0, rtol=1e-5)
        assert (w[1, 5:] < 1e-6).all()  # masked keys get no mass
        assert c.shape == (2, 24)

    def test_history_shifts_alignment(self):
        """Feeding a peaked attention history must move the score profile —
        the location convolution is live (reference's core property)."""
        att = self._mk()
        rng = np.random.default_rng(1)
        enc = jnp.asarray(rng.normal(size=(1, 9, 24)), jnp.float32)
        valid = jnp.ones((1, 9), bool)
        h = jnp.asarray(rng.normal(size=(1, 12)), jnp.float32)
        s0 = jnp.zeros((1, 1, 9))
        s1 = jnp.zeros((1, 1, 9)).at[0, 0, 3].set(1.0)
        params = att.init(jax.random.PRNGKey(0), enc, valid, h, s0)
        _, w0 = att.apply(params, enc, valid, h, s0)
        _, w1 = att.apply(params, enc, valid, h, s1)
        assert np.abs(np.asarray(w0) - np.asarray(w1)).max() > 1e-6

    def test_precomputed_encoder_projection_matches(self):
        att = self._mk()
        rng = np.random.default_rng(2)
        enc = jnp.asarray(rng.normal(size=(1, 6, 24)), jnp.float32)
        valid = jnp.ones((1, 6), bool)
        h = jnp.asarray(rng.normal(size=(1, 12)), jnp.float32)
        state = jnp.zeros((1, 1, 6))
        params = att.init(jax.random.PRNGKey(0), enc, valid, h, state)
        pe = att.apply(params, enc, method=LocationAttention.project_encoder)
        c1, w1 = att.apply(params, enc, valid, h, state)
        c2, w2 = att.apply(params, enc, valid, h, state, proj_enc_out=pe)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6)


class TestCharacterTokenEmbedder:
    def test_shapes_and_symbols(self):
        emb = CharacterTokenEmbedder(word_embed_dim=32, char_embed_dim=8,
                                     filters=((1, 8), (2, 16)))
        chars = np.zeros((2, 4, 6), np.int32)
        chars[0, 0, :3] = [10, 20, 30]   # normal word
        chars[0, 1, 0] = 1               # eos
        chars[0, 2, 0] = 2               # unk
        chars[1, 0, :2] = [10, 20]
        x = jnp.asarray(chars)
        params = emb.init(jax.random.PRNGKey(0), x)
        out = emb.apply(params, x)
        assert out.shape == (2, 4, 32)
        sym = params["params"]["symbol_embeddings"]
        np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(sym[0]),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(sym[1]),
                                   rtol=1e-5)
        # different character content -> different embeddings
        assert np.abs(np.asarray(out[0, 0]) - np.asarray(out[1, 0])).max() > 1e-5

    def test_highway_identity_gate_limit(self):
        hw = Highway(dim=8, num_layers=1)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 8)),
                        jnp.float32)
        params = hw.init(jax.random.PRNGKey(0), x)
        # force the gate fully open (sigmoid(+inf) -> 1): output == input
        p = jax.tree.map(lambda a: a, params)
        kernel = p["params"]["layer0"]["kernel"]
        bias = p["params"]["layer0"]["bias"]
        bias = bias.at[8:].set(100.0)
        p = {"params": {"layer0": {"kernel": kernel, "bias": bias}}}
        y = hw.apply(p, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

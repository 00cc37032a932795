"""HF GPT-2 wrapper: numerical parity against a transformers GPT-2.

(reference: fairseq/models/huggingface/hf_gpt2.py — here the check is
stronger: a randomly-initialised tiny torch GPT2LMHeadModel is converted to
the flax pytree and its logits must match.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_gpt2():
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    cfg = GPT2Config(
        vocab_size=40, n_positions=32, n_embd=16, n_layer=2, n_head=2,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    return GPT2LMHeadModel(cfg).eval()


class TestGPT2Import:
    def test_logit_parity(self, tiny_gpt2):
        from s2t_tpu.interop.hf_import import convert_gpt2_state
        from s2t_tpu.models.hf_gpt2 import HFGPT2Config, HFGPT2Model

        c = tiny_gpt2.config
        cfg = HFGPT2Config(
            decoder_embed_dim=c.n_embd, decoder_ffn_embed_dim=4 * c.n_embd,
            decoder_layers=c.n_layer, decoder_attention_heads=c.n_head,
            vocab_size=c.vocab_size, max_target_positions=c.n_positions,
            dropout=0.0, attention_dropout=0.0,
        )
        model = HFGPT2Model(cfg)
        params = convert_gpt2_state(tiny_gpt2.state_dict(), c.n_layer)

        tokens = np.asarray([[5, 9, 12, 3, 7, 21]], np.int64)
        with torch.no_grad():
            ref = tiny_gpt2(torch.tensor(tokens)).logits.numpy()
        out = model.apply(
            {"params": params}, jnp.asarray(tokens, jnp.int32)
        )["decoder_logits"]
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-3)

    def test_incremental_matches_full(self, tiny_gpt2):
        from s2t_tpu.interop.hf_import import convert_gpt2_state
        from s2t_tpu.models.hf_gpt2 import HFGPT2Config, HFGPT2Model

        c = tiny_gpt2.config
        cfg = HFGPT2Config(
            decoder_embed_dim=c.n_embd, decoder_ffn_embed_dim=4 * c.n_embd,
            decoder_layers=c.n_layer, decoder_attention_heads=c.n_head,
            vocab_size=c.vocab_size, max_target_positions=c.n_positions,
            dropout=0.0, attention_dropout=0.0,
        )
        model = HFGPT2Model(cfg)
        params = convert_gpt2_state(tiny_gpt2.state_dict(), c.n_layer)
        tokens = jnp.asarray([[5, 9, 12, 3]], jnp.int32)
        full = np.asarray(
            model.apply({"params": params}, tokens)["decoder_logits"]
        )
        cache = model.apply({"params": params}, 1, 8,
                            method=HFGPT2Model.init_cache)
        for t in range(tokens.shape[1]):
            step, cache = model.apply(
                {"params": params}, tokens[:, t : t + 1], cache,
                jnp.asarray(t), method=HFGPT2Model.decode_step,
            )
            np.testing.assert_allclose(np.asarray(step), full[:, t], atol=1e-4)

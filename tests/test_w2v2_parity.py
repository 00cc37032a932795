"""wav2vec 2.0 checkpoint-import parity against the reference.

Covers the reference-pretrained-checkpoint workflows VERDICT r3 flagged:
importing a pretraining checkpoint (feeding Wav2Vec2Model /
s2t_w2v2_transformer front-ends, reference: s2t_w2v2_transformer.py:98-108)
and a fine-tuned Wav2VecCtc layout (reference: wav2vec2_asr.py:133).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools/refshim")

try:
    from build_reference import build_w2v2_model, save_fairseq_checkpoint

    _torch_ok = True
    _skip_reason = ""
except Exception as e:  # pragma: no cover
    _torch_ok = False
    _skip_reason = f"reference unavailable: {e}"

pytestmark = pytest.mark.skipif(not _torch_ok, reason=_skip_reason)

TINY = dict(
    conv_feature_layers="[(32,10,5),(32,8,4),(32,4,2)]",
    encoder_embed_dim=48, encoder_ffn_embed_dim=96, encoder_layers=2,
    encoder_attention_heads=2, final_dim=32, latent_vars=20, latent_groups=2,
    conv_pos=16, conv_pos_groups=4, quantize_targets=True,
    dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    dropout_input=0.0, dropout_features=0.0, encoder_layerdrop=0.0,
)


def _wave_batch(B=2, n=1600, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(B, n)).astype(np.float32) * 0.5
    return src


class TestW2V2Parity:
    def _roundtrip(self, tmp_path, **overrides):
        import torch

        from s2t_tpu.interop.fairseq_import import import_fairseq_w2v2
        from s2t_tpu.models.wav2vec2 import Wav2Vec2Model

        kw = dict(TINY)
        kw.update(overrides)
        model, rcfg = build_w2v2_model(**kw)
        ckpt = tmp_path / "w2v.pt"
        save_fairseq_checkpoint(model, rcfg, str(ckpt))
        params, cfg = import_fairseq_w2v2(str(ckpt))

        src = _wave_batch()
        with torch.no_grad():
            r_x, _ = model.extract_features(
                torch.tensor(src), padding_mask=None, mask=False
            )
            r_x = r_x.numpy()

        import jax.numpy as jnp

        my = Wav2Vec2Model(cfg)
        j_x, j_lens = my.apply(
            {"params": params}, jnp.asarray(src),
            jnp.full((src.shape[0],), src.shape[1], jnp.int32),
            deterministic=True, method=my.extract_features,
        )
        j_x = np.asarray(j_x, np.float32)
        assert j_x.shape == r_x.shape
        np.testing.assert_allclose(j_x, r_x, atol=5e-4, rtol=1e-4)
        return params, cfg, model

    def test_extract_features_default_mode(self, tmp_path):
        """Group-norm extractor (base config family)."""
        _, cfg, _ = self._roundtrip(tmp_path)
        assert cfg.extractor_mode == "default"
        assert cfg.quantize_targets

    def test_extract_features_layer_norm_mode(self, tmp_path):
        """Layer-norm extractor + pre-norm encoder (large config family)."""
        _, cfg, _ = self._roundtrip(
            tmp_path, extractor_mode="layer_norm", layer_norm_first=True,
            conv_bias=True,
        )
        assert cfg.extractor_mode == "layer_norm"
        assert cfg.layer_norm_first and cfg.conv_bias

    def test_w2v2_ctc_finetune_layout(self, tmp_path):
        """Fine-tuned Wav2VecCtc layout: w2v_encoder.w2v_model.* + proj
        (reference: wav2vec2_asr.py Wav2VecEncoder forward = extract_features
        → final_dropout → proj)."""
        import torch

        from s2t_tpu.interop.fairseq_import import import_fairseq_w2v2_ctc
        from s2t_tpu.models.wav2vec2 import Wav2VecCtc

        model, rcfg = build_w2v2_model(**TINY)
        vocab = 11
        torch.manual_seed(1)
        proj = torch.nn.Linear(TINY["encoder_embed_dim"], vocab)
        sd = {f"w2v_encoder.w2v_model.{k}": v
              for k, v in model.state_dict().items()}
        sd["w2v_encoder.proj.weight"] = proj.weight.detach()
        sd["w2v_encoder.proj.bias"] = proj.bias.detach()
        ckpt = tmp_path / "w2v_ctc.pt"
        torch.save({"model": sd, "args": rcfg}, str(ckpt))

        params, cfg = import_fairseq_w2v2_ctc(str(ckpt))
        assert cfg.vocab_size == vocab

        src = _wave_batch()
        with torch.no_grad():
            r_x, _ = model.extract_features(
                torch.tensor(src), padding_mask=None, mask=False
            )
            r_logits = proj(r_x).numpy()

        import jax.numpy as jnp

        my = Wav2VecCtc(cfg)
        out = my.apply(
            {"params": params}, jnp.asarray(src),
            jnp.full((src.shape[0],), src.shape[1], jnp.int32),
            deterministic=True,
        )
        np.testing.assert_allclose(
            np.asarray(out["ctc_logits"], np.float32), r_logits,
            atol=5e-4, rtol=1e-4,
        )

    def test_transplant_into_s2t_w2v2_transformer(self, tmp_path):
        """The SATE-style workflow: init the s2t_w2v2_transformer front-end
        from an imported reference pretraining checkpoint (reference:
        s2t_w2v2_transformer.py:98-108 load_pretrained_component), then check
        the front-end features equal the reference's extract_features."""
        import torch

        from s2t_tpu.interop.fairseq_import import import_fairseq_w2v2
        from s2t_tpu.models.s2t_w2v2_transformer import (
            S2TW2V2TransformerModel, s2t_w2v2_transformer_base,
        )

        model, rcfg = build_w2v2_model(**TINY)
        ckpt = tmp_path / "w2v_pre.pt"
        save_fairseq_checkpoint(model, rcfg, str(ckpt))
        w2v_params, w2v_cfg = import_fairseq_w2v2(str(ckpt))

        cfg = s2t_w2v2_transformer_base(
            vocab_size=16, encoder_layers=1, decoder_layers=1,
            encoder_embed_dim=48, encoder_ffn_embed_dim=96,
            decoder_embed_dim=48, decoder_ffn_embed_dim=96,
            encoder_attention_heads=2, decoder_attention_heads=2,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            w2v=w2v_cfg,
        )
        my = S2TW2V2TransformerModel(cfg)

        import jax
        import jax.numpy as jnp

        src = _wave_batch()
        lens = jnp.full((src.shape[0],), src.shape[1], jnp.int32)
        prev = jnp.full((src.shape[0], 3), 2, jnp.int32)
        variables = my.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(src), lens, prev,
        )
        params = dict(variables["params"])
        # component transplant: the imported w2v subtree replaces the random
        # one (same mechanism as utils.checkpoint.transplant_component).
        # The fine-tune graph never calls the quantizer/contrastive heads, so
        # those imported subtrees have no slot here — exactly like the
        # reference's strict=False component load (s2t_w2v2_transformer.py:104)
        live = set(params["encoder"]["w2v"])
        assert live <= set(w2v_params), sorted(live - set(w2v_params))
        params["encoder"] = dict(params["encoder"])
        params["encoder"]["w2v"] = {k: w2v_params[k] for k in live}

        feats, out_lens = my.apply(
            {"params": params}, jnp.asarray(src), lens, deterministic=True,
            method=my.extract_w2v_features,
        )
        with torch.no_grad():
            r_x, _ = model.extract_features(
                torch.tensor(src), padding_mask=None, mask=False
            )
        np.testing.assert_allclose(
            np.asarray(feats, np.float32), r_x.numpy(), atol=5e-4, rtol=1e-4,
        )

"""Checkpoint-import parity against the ACTUAL reference implementation.

Builds the reference torch s2t_transformer in-process (via tools/refshim),
saves a real fairseq-layout checkpoint, imports it with
s2t_tpu.interop.fairseq_import, and asserts encoder outputs and decoder
logits match torch to float32 tolerance.  This is the falsifiable version of
BASELINE.md's "matching BLEU & WER on reference checkpoints" north star.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools/refshim")

try:
    from build_reference import build_s2t_model, save_fairseq_checkpoint

    _torch_ok = True
    _skip_reason = ""
except Exception as e:  # pragma: no cover - environment without reference
    _torch_ok = False
    _skip_reason = f"reference unavailable: {e}"

pytestmark = pytest.mark.skipif(not _torch_ok, reason=_skip_reason)


def _rand_batch(B=3, T=50, D=80, U=7, vocab=8, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, T, D)).astype(np.float32)
    lens = np.array([T, T - 7, T - 16], np.int32)[:B]
    for b in range(B):  # zero the padded tail like the collater does
        feats[b, lens[b]:] = 0.0
    prev = rng.integers(4, vocab, size=(B, U)).astype(np.int64)
    prev[:, 0] = 2  # EOS-shifted prev_output_tokens start
    return feats, lens, prev


def _torch_forward(model, feats, lens, prev):
    import torch

    with torch.no_grad():
        enc = model.encoder(torch.tensor(feats), torch.tensor(lens))
        x = enc["encoder_out"][0].transpose(0, 1).numpy()  # T,B,D -> B,T,D
        enc_lens = (~enc["encoder_padding_mask"][0]).sum(-1).numpy()
        dec_out = model.decoder(
            prev_output_tokens=torch.tensor(prev), encoder_out=enc
        )
        logits = dec_out[0].numpy()
        ctc = None
        if len(enc["ctc_logit"]) > 0:
            ctc = enc["ctc_logit"][0].transpose(0, 1).numpy()
    return x, enc_lens, logits, ctc


def _jax_forward(params, cfg, feats, lens, prev):
    import jax

    from s2t_tpu.models.s2t_transformer import S2TTransformerModel

    model = S2TTransformerModel(cfg)
    out = model.apply(
        {"params": params}, feats, lens, prev.astype(np.int32),
        deterministic=True,
    )
    return (
        np.asarray(out["encoder_out"], np.float32),
        np.asarray(out["encoder_lengths"]),
        np.asarray(out["decoder_logits"], np.float32),
        None if out["ctc_logits"] is None else np.asarray(out["ctc_logits"], np.float32),
    )


def _assert_close(ref, mine, lens, name, atol=2e-4):
    """Compare per-sequence valid prefixes."""
    for b in range(ref.shape[0] if ref.ndim == 3 else 1):
        L = int(lens[b])
        np.testing.assert_allclose(
            mine[b, :L], ref[b, :L], atol=atol, rtol=1e-4,
            err_msg=f"{name} mismatch at b={b}",
        )


class TestS2TTransformerParity:
    def _roundtrip(self, tmp_path, arch="s2t_transformer_s", **overrides):
        from s2t_tpu.interop.fairseq_import import import_fairseq_s2t

        model, args, d = build_s2t_model(arch=arch, **overrides)
        ckpt = tmp_path / "ref.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_s2t(str(ckpt))

        feats, lens, prev = _rand_batch(vocab=len(d))
        r_enc, r_lens, r_logits, r_ctc = _torch_forward(model, feats, lens, prev)
        j_enc, j_lens, j_logits, j_ctc = _jax_forward(params, cfg, feats, lens, prev)

        np.testing.assert_array_equal(j_lens, r_lens)
        _assert_close(r_enc, j_enc, j_lens, "encoder_out")
        # decoder logits over all positions (no target padding here)
        np.testing.assert_allclose(j_logits, r_logits, atol=3e-4, rtol=1e-4)
        if r_ctc is not None:
            _assert_close(r_ctc, j_ctc, j_lens, "ctc_logits")
        return cfg

    def test_s2t_transformer_s(self, tmp_path):
        """Tiny-layer variant of the flagship arch (fast on CPU)."""
        cfg = self._roundtrip(
            tmp_path, encoder_layers=3, decoder_layers=2,
            encoder_ffn_embed_dim=512, decoder_ffn_embed_dim=512,
        )
        assert cfg.encoder_embed_dim == 256
        assert not cfg.share_decoder_input_output_embed

    def test_with_ctc_head(self, tmp_path):
        self._roundtrip(
            tmp_path, encoder_layers=2, decoder_layers=1,
            encoder_ffn_embed_dim=256, decoder_ffn_embed_dim=256,
            ctc_weight=0.3,
        )

    def test_shared_decoder_embed(self, tmp_path):
        cfg = self._roundtrip(
            tmp_path, encoder_layers=2, decoder_layers=1,
            encoder_ffn_embed_dim=256, decoder_ffn_embed_dim=256,
            share_decoder_input_output_embed=True,
        )
        assert cfg.share_decoder_input_output_embed

    def test_conformer_rel_pos(self, tmp_path):
        """Conformer layers: macaron FFN + conv module (frozen BatchNorm
        fold) + ESPnet rel_pos attention (reference:
        modules/s2t_transformer_layer.py:103-126, espnet_multihead_attention.py
        RelPositionMultiHeadedAttention, conf: egs/mustc/st/conf/conformer.yaml)."""
        cfg = self._roundtrip(
            tmp_path, encoder_layers=2, decoder_layers=1,
            encoder_ffn_embed_dim=256, decoder_ffn_embed_dim=256,
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=15,
            encoder_attention_type="rel_pos", encoder_activation_fn="swish",
            ctc_weight=0.3,
        )
        assert cfg.macaron_style and cfg.use_cnn_module
        assert cfg.cnn_module_norm == "batch_norm"
        assert not cfg.conv_module_bias

    def test_conformer_abs_attention(self, tmp_path):
        """ESPnet absolute-attention conformer (encoder_attention_type=abs →
        linear_{q,k,v,out} naming; reference espnet_multihead_attention.py:23)."""
        self._roundtrip(
            tmp_path, encoder_layers=2, decoder_layers=1,
            encoder_ffn_embed_dim=256, decoder_ffn_embed_dim=256,
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=7,
            encoder_attention_type="abs", encoder_activation_fn="swish",
        )


class TestPDSParity:
    """PDS encoder checkpoint-import parity against the reference
    (reference: fairseq/models/speech_to_text/pdss2t_transformer.py:147-1232)."""

    def _roundtrip(self, tmp_path, arch="pdss2t_transformer_s_8", T=48,
                   check_inter=False, **overrides):
        import torch

        from build_reference import build_pds_model, save_fairseq_checkpoint
        from s2t_tpu.interop.fairseq_import import import_fairseq_pds

        model, args, d = build_pds_model(arch=arch, **overrides)
        ckpt = tmp_path / "ref_pds.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_pds(str(ckpt))

        feats, lens, prev = _rand_batch(T=T, vocab=len(d))
        with torch.no_grad():
            enc = model.encoder(torch.tensor(feats), torch.tensor(lens))
            r_enc = enc["encoder_out"][0].transpose(0, 1).numpy()
            r_lens = (~enc["encoder_padding_mask"][0]).sum(-1).numpy()
            r_logits = model.decoder(
                prev_output_tokens=torch.tensor(prev), encoder_out=enc
            )[0].numpy()
            r_ctc = None
            if len(enc["ctc_logit"]) > 0:
                r_ctc = enc["ctc_logit"][0].transpose(0, 1).numpy()
            r_inter = [
                (lg.transpose(0, 1).numpy(), (~pm).sum(-1).numpy())
                for lg, pm in enc["inter_ctc_logits"]
            ]

        from s2t_tpu.models.pds import PDSS2TTransformerModel

        m = PDSS2TTransformerModel(cfg)
        out = m.apply(
            {"params": params}, feats, lens, prev.astype(np.int32),
            deterministic=True,
        )
        j_lens = np.asarray(out["encoder_lengths"])
        np.testing.assert_array_equal(j_lens, r_lens)
        _assert_close(r_enc, np.asarray(out["encoder_out"], np.float32),
                      j_lens, "encoder_out", atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(out["decoder_logits"], np.float32), r_logits,
            atol=5e-4, rtol=1e-4,
        )
        if r_ctc is not None:
            _assert_close(r_ctc, np.asarray(out["ctc_logits"], np.float32),
                          j_lens, "ctc_logits", atol=5e-4)
        if check_inter:
            j_inter = out["inter_ctc_logits"]
            assert len(j_inter) == len(r_inter), (
                f"{len(j_inter)} inter taps vs reference {len(r_inter)}"
            )
            for (ref_lg, ref_ln), entry in zip(r_inter, j_inter):
                tap_lens = np.asarray(entry[2])
                np.testing.assert_array_equal(tap_lens, ref_ln)
                _assert_close(ref_lg, np.asarray(entry[1], np.float32),
                              tap_lens, "inter_ctc", atol=5e-4)
        return cfg

    def _small(self):
        return dict(
            pds_embed_dims="48_48_48_48", pds_attn_heads="2_2_2_2",
            pds_ffn_ratios="2_2_2_2", pds_layers="1_1_1_1",
            encoder_embed_dim=48, decoder_embed_dim=48,
            decoder_ffn_embed_dim=96, decoder_layers=1,
            decoder_attention_heads=2, dropout=0.0,
            attention_dropout=0.0, activation_dropout=0.0,
        )

    def test_pds_base_8(self, tmp_path):
        """Vanilla pds_base_8 stage plan with a top CTC head
        (conf: egs/librispeech/asr/conf/pds_base_8.yaml)."""
        cfg = self._roundtrip(tmp_path, ctc_weight=0.3, **self._small())
        assert cfg.pds_ratios == (2, 2, 1, 2)

    def test_pds_inter_ctc_pae(self, tmp_path):
        """Per-stage CTC taps + inter_league PAE re-injection with a shared
        head (reference :645-680, :1160-1172)."""
        cfg = self._roundtrip(
            tmp_path, T=56, check_inter=True,
            ctc_weight=0.3, pds_ctc="0_1_1_0", ctc_pae="inter_league",
            share_inter_ctc=True, inter_ctc_weight=0.2, **self._small(),
        )
        assert cfg.pds_ctc == (0, 1, 1, 0)
        assert cfg.share_inter_ctc

    def test_pds_growth_fusion(self, tmp_path):
        """Stage-growth dims + multi-scale all_conv fusion
        (conf: pds_base_8_growth_fusion256.yaml shape; fusion semantics
        reference :585-622, :1186-1232 with pds_fusion_mask)."""
        kw = self._small()
        kw.update(
            pds_embed_dims="32_48_48_64", encoder_embed_dim=64,
            decoder_embed_dim=64, pds_fusion=True,
            pds_fusion_method="all_conv", pds_fusion_mask=True,
            ctc_weight=0.3,
        )
        cfg = self._roundtrip(tmp_path, **kw)
        assert cfg.pds_fusion and cfg.fusion_stages == (0, 1, 2, 3)

    def test_pds_conv_strides_conformer(self, tmp_path):
        """EffecientConformer-style in-stage strided conv modules with dim
        growth + rel_pos conformer layers
        (conf: egs/librispeech/asr/conf/EffecientConformerCTCSmall.yaml;
        reference pds_layer.py conv_stride/expand_embed_dim)."""
        kw = self._small()
        kw.update(
            pds_stages=3, pds_ratios="2_0_0", pds_layers="1_1_1",
            pds_kernel_sizes="3_3_3", pds_embed_dims="24_32_48",
            pds_attn_heads="2_2_2", pds_ffn_ratios="2_2_2",
            pds_position_embed="1_1_1", pds_conv_strides="2_2_1",
            encoder_embed_dim=48, decoder_embed_dim=48,
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=7,
            encoder_attention_type="rel_pos", encoder_activation_fn="swish",
            ctc_weight=0.3,
        )
        cfg = self._roundtrip(tmp_path, T=48, **kw)
        assert cfg.pds_conv_strides == (2, 2, 1)
        assert cfg.cnn_module_norm == "batch_norm"


class TestSATEParity:
    """SATE checkpoint-import parity against the reference
    (reference: fairseq/models/speech_to_text/s2t_sate.py:38-1100)."""

    def _roundtrip(self, tmp_path, T=50, check_xctc=False, **overrides):
        import torch

        from build_reference import build_sate_model, save_fairseq_checkpoint
        from s2t_tpu.interop.fairseq_import import import_fairseq_sate

        kw = dict(
            encoder_layers=2, text_encoder_layers=2, decoder_layers=1,
            encoder_embed_dim=48, encoder_ffn_embed_dim=96,
            decoder_embed_dim=48, decoder_ffn_embed_dim=96,
            encoder_attention_heads=2, decoder_attention_heads=2,
            subsampling_filter=48,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            ctc_weight=0.3,
        )
        kw.update(overrides)
        model, args, d = build_sate_model(**kw)
        ckpt = tmp_path / "ref_sate.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_sate(str(ckpt))

        feats, lens, prev = _rand_batch(T=T, vocab=len(d))
        with torch.no_grad():
            enc = model.encoder(torch.tensor(feats), torch.tensor(lens))
            r_enc = enc["encoder_out"][0].transpose(0, 1).numpy()
            r_lens = (~enc["encoder_padding_mask"][0]).sum(-1).numpy()
            r_logits = model.decoder(
                prev_output_tokens=torch.tensor(prev), encoder_out=enc
            )[0].numpy()
            r_ctc = None
            if len(enc["ctc_logit"]) > 0:
                r_ctc = enc["ctc_logit"][0].transpose(0, 1).numpy()
            r_xctc = None
            if check_xctc and len(enc["xctc_logit"]) > 0:
                r_xctc = enc["xctc_logit"][0].transpose(0, 1).numpy()

        from s2t_tpu.models.sate import S2TSATEModel

        m = S2TSATEModel(cfg)
        out = m.apply(
            {"params": params}, feats, lens, prev.astype(np.int32),
            deterministic=True,
        )
        j_lens = np.asarray(out["encoder_lengths"])
        np.testing.assert_array_equal(j_lens, r_lens)
        _assert_close(r_enc, np.asarray(out["encoder_out"], np.float32),
                      j_lens, "encoder_out", atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(out["decoder_logits"], np.float32), r_logits,
            atol=5e-4, rtol=1e-4,
        )
        if r_ctc is not None:
            # the acoustic CTC tap lives at the acoustic time scale, which
            # equals the final scale for non-shrink adapters
            _assert_close(r_ctc, np.asarray(out["ctc_logits"], np.float32),
                          j_lens, "ctc_logits", atol=5e-4)
        if r_xctc is not None:
            _assert_close(r_xctc, np.asarray(out["xctc_logits"], np.float32),
                          j_lens, "xctc_logits", atol=5e-4)
        return cfg

    def test_sate_inter_league(self, tmp_path):
        """Default SATE recipe shape: acoustic transformer + inter_league
        adapter + embed norms (conf: egs/mustc/st/conf/sate.yaml)."""
        cfg = self._roundtrip(
            tmp_path,
            adapter="inter_league",
            encoder_embed_norm=True, encoder_no_scale_embedding=True,
            textual_encoder_embed_norm=True,
            textual_encoder_no_scale_embedding=True,
        )
        assert cfg.adapter_type == "inter_league"
        assert cfg.textual_encoder_embed_norm

    def test_sate_league_scaled_embed(self, tmp_path):
        """League adapter (linear MLP + context) with the reference's
        default scaled textual embedding."""
        cfg = self._roundtrip(tmp_path, adapter="league")
        assert cfg.adapter_type == "league"
        assert not cfg.textual_encoder_no_scale_embedding

    def test_sate_xctc(self, tmp_path):
        """Textual-encoder XCTC head (reference s2t_sate.py:394-417)."""
        cfg = self._roundtrip(
            tmp_path, check_xctc=True,
            adapter="inter_league", xctc_weight=0.3,
        )
        assert cfg.text_use_xctc

    def test_sate_pds_acoustic(self, tmp_path):
        """PDS acoustic encoder under the textual stack
        (conf: egs/mustc/st/conf/sate_pds_8.yaml; reference :845-854)."""
        cfg = self._roundtrip(
            tmp_path, T=48,
            adapter="inter_league", acoustic_encoder="pds",
            pds_stages=4, pds_ratios="2_2_1_2", pds_layers="1_1_1_1",
            pds_kernel_sizes="5_5_5_5", pds_embed_dims="48_48_48_48",
            pds_attn_heads="2_2_2_2", pds_ffn_ratios="2_2_2_2",
            pds_position_embed="1_1_1_1", pds_embed_norm=True,
        )
        assert cfg.acoustic_encoder == "pds"
        assert cfg.pds is not None


class TestSATETransplantParity:
    """The SATE pretraining WORKFLOW: assemble SATE from an imported ASR
    encoder + an imported MT encoder and match the reference model built with
    --load-pretrained-{acoustic,text}-encoder-from (reference:
    s2t_sate.py:268-296 via checkpoint_utils.load_pretrained_component:676)."""

    def test_assembled_equals_reference(self, tmp_path):
        import torch

        from build_reference import (
            build_mt_model, build_s2t_model, build_sate_model,
            save_fairseq_checkpoint,
        )
        from s2t_tpu.interop.fairseq_import import (
            import_fairseq_mt, import_fairseq_s2t, import_fairseq_sate,
        )
        from s2t_tpu.utils.checkpoint import transplant_component

        small = dict(
            encoder_layers=2, decoder_layers=1,
            encoder_embed_dim=48, encoder_ffn_embed_dim=96,
            decoder_embed_dim=48, decoder_ffn_embed_dim=96,
            encoder_attention_heads=2, decoder_attention_heads=2,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        )
        # pretrained part A: ASR s2t encoder (with CTC, as SATE requires)
        asr, asr_args, d = build_s2t_model(
            subsampling_filter=48, ctc_weight=0.3, **small
        )
        asr_ckpt = str(tmp_path / "asr.pt")
        save_fairseq_checkpoint(asr, asr_args, asr_ckpt)
        # pretrained part B: MT encoder at the same width
        mt, mt_args, _ = build_mt_model(
            "transformer_iwslt_de_en", dictionary=d,
            encoder_normalize_before=True, decoder_normalize_before=True,
            **small,
        )
        mt_ckpt = str(tmp_path / "mt.pt")
        save_fairseq_checkpoint(mt, mt_args, mt_ckpt)

        sate_kw = dict(
            adapter="inter_league", text_encoder_layers=2,
            subsampling_filter=48, ctc_weight=0.3, **small,
        )
        # reference SATE assembled from the pretrained parts (the arg-driven
        # load happens inside build_model) — and a plain twin for the
        # non-transplanted random parts (same torch seed → identical init)
        loaded, loaded_args, _ = build_sate_model(
            dictionary=d,
            load_pretrained_acoustic_encoder_from=asr_ckpt,
            load_pretrained_text_encoder_from=mt_ckpt,
            **sate_kw,
        )
        plain, plain_args, _ = build_sate_model(dictionary=d, **sate_kw)

        plain_ckpt = str(tmp_path / "sate_plain.pt")
        save_fairseq_checkpoint(plain, plain_args, plain_ckpt)
        base_params, cfg = import_fairseq_sate(plain_ckpt)

        # my workflow: import both parts, transplant the subtrees
        asr_params, _ = import_fairseq_s2t(asr_ckpt)
        mt_params, _ = import_fairseq_mt(mt_ckpt)
        params = transplant_component(
            base_params, asr_params, "encoder/acoustic",
            source_component="encoder",
        )
        params = transplant_component(
            params, mt_params, "encoder/textual",
            source_component="encoder", strict=False,
        )

        # forward parity against the reference-assembled model
        feats, lens, prev = _rand_batch(T=50, vocab=len(d))
        with torch.no_grad():
            enc = loaded.encoder(torch.tensor(feats), torch.tensor(lens))
            r_enc = enc["encoder_out"][0].transpose(0, 1).numpy()
            r_lens = (~enc["encoder_padding_mask"][0]).sum(-1).numpy()
            r_logits = loaded.decoder(
                prev_output_tokens=torch.tensor(prev), encoder_out=enc
            )[0].numpy()

        from s2t_tpu.models.sate import S2TSATEModel

        m = S2TSATEModel(cfg)
        out = m.apply(
            {"params": params}, feats, lens, prev.astype(np.int32),
            deterministic=True,
        )
        j_lens = np.asarray(out["encoder_lengths"])
        np.testing.assert_array_equal(j_lens, r_lens)
        _assert_close(r_enc, np.asarray(out["encoder_out"], np.float32),
                      j_lens, "assembled encoder_out", atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(out["decoder_logits"], np.float32), r_logits,
            atol=5e-4, rtol=1e-4,
        )


class TestMTTransformerParity:
    """MT transformer checkpoint import parity (reference:
    fairseq/models/transformer.py state-dict layout)."""

    def _roundtrip(self, tmp_path, arch="transformer_iwslt_de_en", **overrides):
        import torch

        from build_reference import build_mt_model, save_fairseq_checkpoint
        from s2t_tpu.interop.fairseq_import import import_fairseq_mt

        kw = dict(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=2,
            decoder_attention_heads=2, dropout=0.0,
            attention_dropout=0.0, activation_dropout=0.0,
        )
        kw.update(overrides)
        model, args, d = build_mt_model(arch, **kw)
        ckpt = str(tmp_path / "ref_mt.pt")
        save_fairseq_checkpoint(model, args, ckpt)
        params, cfg = import_fairseq_mt(ckpt)

        rng = np.random.default_rng(0)
        V = len(d)
        src = rng.integers(4, V, size=(2, 6)).astype(np.int64)
        src[1, 4:] = 1  # pad tail
        lens = np.asarray([6, 4], np.int32)
        prev = rng.integers(4, V, size=(2, 3)).astype(np.int64)
        prev[:, 0] = 2

        with torch.no_grad():
            enc = model.encoder(torch.tensor(src), torch.tensor(lens))
            ref_enc = enc["encoder_out"][0].transpose(0, 1).numpy()
            ref_logits = model.decoder(
                prev_output_tokens=torch.tensor(prev), encoder_out=enc
            )[0].numpy()

        import jax
        import jax.numpy as jnp

        from s2t_tpu.models.transformer import TransformerModel

        m = TransformerModel(cfg)
        out = m.apply(
            {"params": params}, jnp.asarray(src, jnp.int32),
            jnp.asarray(lens), jnp.asarray(prev, jnp.int32),
        )
        my_enc = np.asarray(out["encoder_out"], np.float32)
        my_logits = np.asarray(out["decoder_logits"], np.float32)
        for b in range(2):
            L = lens[b]
            np.testing.assert_allclose(
                my_enc[b, :L], ref_enc[b, :L], atol=3e-4,
                err_msg=f"encoder mismatch row {b}",
            )
        np.testing.assert_allclose(ref_logits, my_logits, atol=3e-4)
        return cfg

    def test_postnorm_iwslt(self, tmp_path):
        cfg = self._roundtrip(tmp_path)
        assert not cfg.encoder_normalize_before

    def test_prenorm_shared_embed(self, tmp_path):
        cfg = self._roundtrip(
            tmp_path,
            encoder_normalize_before=True, decoder_normalize_before=True,
            share_decoder_input_output_embed=True,
        )
        assert cfg.encoder_normalize_before
        assert cfg.share_decoder_input_output_embed

    def test_learned_pos_and_layernorm_embedding(self, tmp_path):
        cfg = self._roundtrip(
            tmp_path,
            encoder_learned_pos=True, decoder_learned_pos=True,
            layernorm_embedding=True, no_scale_embedding=True,
        )
        assert cfg.encoder_learned_pos and cfg.decoder_learned_pos
        assert cfg.layernorm_embedding


class TestConvTransformerParity:
    """(reference: convtransformer.py:25 — ESPnet-ST 2-D-conv front-end +
    fairseq transformer layers; repo side is the convtransformer arch preset
    of s2t_transformer with subsampling_padding='same')."""

    def _roundtrip(self, tmp_path, **overrides):
        from build_reference import build_convtransformer_model
        from s2t_tpu.interop.fairseq_import import import_fairseq_convtransformer

        small = dict(
            encoder_layers=2, decoder_layers=2,
            encoder_embed_dim=48, encoder_ffn_embed_dim=96,
            decoder_embed_dim=48, decoder_ffn_embed_dim=96,
            encoder_attention_heads=2, decoder_attention_heads=2,
            conv_out_channels=16,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        )
        small.update(overrides)
        model, args, d = build_convtransformer_model(**small)
        ckpt = tmp_path / "convt.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_convtransformer(str(ckpt))
        assert cfg.subsampling_padding == "same"

        feats, lens, prev = _rand_batch(T=52, vocab=len(d))
        import torch

        with torch.no_grad():
            enc = model.encoder(torch.tensor(feats), torch.tensor(lens))
            r_enc = enc["encoder_out"][0].transpose(0, 1).numpy()
            if enc["encoder_padding_mask"]:
                r_lens = (~enc["encoder_padding_mask"][0]).sum(-1).numpy()
            else:
                r_lens = np.full(feats.shape[0], r_enc.shape[1])
            r_logits = model.decoder(
                prev_output_tokens=torch.tensor(prev), encoder_out=enc
            )[0].numpy()

        j_enc, j_lens, j_logits, _ = _jax_forward(params, cfg, feats, lens, prev)
        np.testing.assert_array_equal(j_lens, r_lens)
        _assert_close(r_enc, j_enc, j_lens, "encoder_out")
        np.testing.assert_allclose(
            j_logits, r_logits, atol=3e-4, rtol=1e-4,
            err_msg="decoder logits mismatch",
        )
        return cfg

    def test_postnorm_default(self, tmp_path):
        cfg = self._roundtrip(tmp_path)
        assert not cfg.encoder_normalize_before
        assert cfg.subsampling_activation == "relu"

    def test_prenorm(self, tmp_path):
        cfg = self._roundtrip(
            tmp_path, encoder_normalize_before=True,
            decoder_normalize_before=True,
        )
        assert cfg.encoder_normalize_before and cfg.decoder_normalize_before


class TestBerardParity:
    """(reference: berard.py:20 — linear+tanh input stack, conv2d, stacked
    BiLSTM w/ packed semantics, MLP attention, LSTM decoder with the
    reference's layer-state wiring)."""

    def _roundtrip(self, tmp_path, arch="berard_256_3_3", **overrides):
        from build_reference import build_berard_model
        from s2t_tpu.interop.fairseq_import import import_fairseq_berard

        small = dict(
            input_layers="[32, 24]", conv_layers="[(4, 3, 2), (4, 3, 2)]",
            num_blstm_layers=2, lstm_size=16, decoder_embed_dim=12,
            decoder_num_layers=2, decoder_hidden_dim=32, attention_dim=18,
            output_layer_dim=14, dropout=0.0,
        )
        small.update(overrides)
        model, args, d = build_berard_model(arch=arch, **small)
        ckpt = tmp_path / "berard.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_berard(str(ckpt))
        assert cfg.encoder_layers == small["num_blstm_layers"]

        feats, lens, prev = _rand_batch(T=41, vocab=len(d))
        import torch

        with torch.no_grad():
            enc = model.encoder(torch.tensor(feats), torch.tensor(lens))
            r_enc = enc["encoder_out"].transpose(0, 1).numpy()  # (B,T,C)
            r_lens = (~enc["encoder_padding_mask"].t()).sum(-1).numpy()
            r_logits = model.decoder(
                prev_output_tokens=torch.tensor(prev), encoder_out=enc
            )[0].numpy()

        import jax

        from s2t_tpu.models.berard import BerardModel

        jmodel = BerardModel(cfg)
        out = jmodel.apply(
            {"params": params}, feats, lens, prev.astype(np.int32),
            deterministic=True,
        )
        j_enc = np.asarray(out["encoder_out"], np.float32)
        j_lens = np.asarray(out["encoder_lengths"])
        j_logits = np.asarray(out["decoder_logits"], np.float32)

        np.testing.assert_array_equal(j_lens, r_lens)
        # torch pad_packed trims to the longest VALID length; compare there
        Tv = r_enc.shape[1]
        _assert_close(r_enc, j_enc[:, :Tv], j_lens, "encoder_out")
        np.testing.assert_allclose(
            j_logits, r_logits, atol=3e-4, rtol=1e-4,
            err_msg="decoder logits mismatch",
        )
        return cfg

    def test_covost_arch(self, tmp_path):
        cfg = self._roundtrip(tmp_path)
        assert cfg.decoder_layers == 2

    def test_three_decoder_layers(self, tmp_path):
        cfg = self._roundtrip(tmp_path, decoder_num_layers=3)
        assert cfg.decoder_layers == 3


class TestDualParity:
    """(reference: s2t_dual.py:36).  Two pinned facts: the upstream forward
    is bit-rotted and crashes (s2t_dual.py:334 binds the speech tensor to
    return_all_hiddens), and this repo's model numerically matches the
    evidently-intended set_s2 wiring (transformer_s2.py:70) of the SAME
    reference modules — asr encoder, league MT encoder, decoder."""

    def _build(self, tmp_path, **overrides):
        from build_reference import build_dual_model

        kw = dict(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64,
            encoder_attention_heads=2, decoder_embed_dim=32,
            decoder_ffn_embed_dim=64, decoder_layers=2,
            decoder_attention_heads=2, mt_encoder_layers=2,
            subsampling_filter=32, ctc_weight=0.3,
            encoder_collaboration_mode="parallel",
            decoder_collaboration_mode="parallel",
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        )
        kw.update(overrides)
        return build_dual_model(**kw)

    def test_upstream_forward_is_broken(self, tmp_path):
        import torch

        model, args, d = self._build(tmp_path)
        sp = torch.randn(2, 40, 80)
        spl = torch.tensor([40, 33])
        txt = torch.tensor([[4, 5, 6, 2], [5, 6, 2, 1]])
        txtl = torch.tensor([4, 3])
        prev = torch.tensor([[2, 4, 5], [2, 5, 6]])
        with pytest.raises(RuntimeError):
            with torch.no_grad():
                model(sp, spl, txt, txtl, prev)

    def test_repaired_reference_parity(self, tmp_path):
        import torch

        from build_reference import dual_repaired_encoder_forward
        from s2t_tpu.interop.fairseq_import import import_fairseq_dual
        from s2t_tpu.models.s2t_dual import S2TDualModel

        model, args, d = self._build(tmp_path)
        ckpt = tmp_path / "dual.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_dual(str(ckpt))
        assert cfg.encoder_collaboration_mode == "parallel"
        assert cfg.speech.encoder_layers == 12  # hard-set upstream (:299)

        rng = np.random.default_rng(0)
        feats = rng.normal(size=(2, 40, 80)).astype(np.float32)
        lens = np.array([40, 33], np.int32)
        feats[1, 33:] = 0.0
        txt = np.array([[4, 5, 6, 2], [5, 6, 2, 1]], np.int64)
        txtl = np.array([4, 3], np.int64)
        prev = np.array([[2, 4, 5], [2, 5, 6]], np.int64)

        with torch.no_grad():
            enc = dual_repaired_encoder_forward(
                model.encoder, torch.tensor(feats), torch.tensor(lens),
                torch.tensor(txt), torch.tensor(txtl),
            )
            r_text = enc["encoder_out"][0].transpose(0, 1).numpy()
            r_logits = model.decoder(
                prev_output_tokens=torch.tensor(prev), encoder_out=enc
            )[0].numpy()

        jmodel = S2TDualModel(cfg)
        out = jmodel.apply(
            {"params": params}, feats, lens, prev.astype(np.int32),
            deterministic=True, transcript=txt.astype(np.int32),
            transcript_lengths=txtl.astype(np.int32),
        )
        j_text = np.asarray(out["text_encoder_out"], np.float32)
        j_logits = np.asarray(out["decoder_logits"], np.float32)
        for b, L in enumerate([4, 3]):
            np.testing.assert_allclose(
                j_text[b, :L], r_text[b, :L], atol=3e-4, rtol=1e-4,
                err_msg=f"text-stream encoder mismatch b={b}",
            )
        np.testing.assert_allclose(
            j_logits, r_logits, atol=3e-4, rtol=1e-4,
            err_msg="decoder logits mismatch",
        )


class TestMultiBranchParity:
    """(reference: s2t_multibranch.py:43 — works upstream; direct parity on
    both encoder streams and the dual-stream league decoder)."""

    def _roundtrip(self, tmp_path, **overrides):
        import torch

        from build_reference import build_multibranch_model
        from s2t_tpu.interop.fairseq_import import import_fairseq_multibranch

        kw = dict(
            encoder_embed_dim=32, encoder_ffn_embed_dim=64,
            encoder_attention_heads=2, encoder_layers=2,
            decoder_embed_dim=32, decoder_ffn_embed_dim=64, decoder_layers=2,
            decoder_attention_heads=2, subsampling_filter=32,
            senior_acoustic_encoder_layers=2, textual_encoder_layers=2,
            collaboration_direction="both",
            encoder_collaboration_mode="parallel",
            decoder_collaboration_mode="parallel",
            ctc_weight=0.3, encoder_embed_norm=True,
            encoder_no_scale_embedding=True,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        )
        kw.update(overrides)
        model, args, d = build_multibranch_model(**kw)
        ckpt = tmp_path / "mb.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_multibranch(str(ckpt))
        assert cfg.senior_layers == kw["senior_acoustic_encoder_layers"]

        rng = np.random.default_rng(0)
        feats = rng.normal(size=(2, 40, 80)).astype(np.float32)
        lens = np.array([40, 33], np.int32)
        feats[1, 33:] = 0.0
        prev = np.array([[2, 4, 5, 6], [2, 5, 6, 7]], np.int64)

        with torch.no_grad():
            enc = model.encoder(torch.tensor(feats), torch.tensor(lens))
            r_senior = enc["encoder_out"][0].transpose(0, 1).numpy()
            r_textual = enc["s2_encoder_out"][0].transpose(0, 1).numpy()
            r_lens = (~enc["encoder_padding_mask"][0]).sum(-1).numpy()
            r_logits = model.decoder(
                prev_output_tokens=torch.tensor(prev), encoder_out=enc
            )[0].numpy()

        import jax

        from s2t_tpu.models.s2t_multibranch import S2TMultiBranchModel

        jmodel = S2TMultiBranchModel(cfg)
        out = jmodel.apply(
            {"params": params}, feats, lens, prev.astype(np.int32),
            deterministic=True,
        )
        j_lens = np.asarray(out["encoder_lengths"])
        np.testing.assert_array_equal(j_lens, r_lens)
        _assert_close(r_senior, np.asarray(out["encoder_out"], np.float32),
                      j_lens, "senior stream")
        _assert_close(r_textual, np.asarray(out["s2_encoder_out"], np.float32),
                      j_lens, "textual stream")
        np.testing.assert_allclose(
            np.asarray(out["decoder_logits"], np.float32), r_logits,
            atol=3e-4, rtol=1e-4, err_msg="decoder logits mismatch",
        )
        return cfg

    def test_parallel_both(self, tmp_path):
        cfg = self._roundtrip(tmp_path)
        assert cfg.collaboration_direction == "both"

    def test_serial_textual(self, tmp_path):
        cfg = self._roundtrip(
            tmp_path, collaboration_direction="textual",
            encoder_collaboration_mode="serial",
            decoder_collaboration_mode="serial",
        )
        assert cfg.encoder_collaboration_mode == "serial"

    def test_no_encoder_collaboration(self, tmp_path):
        # decoder stays parallel: the reference decoder layer with
        # collaboration_mode "none" but an s2 stream present (multibranch
        # always emits s2_encoder_out) SKIPS the cross-attn residual add
        # entirely (transformer_s2_layer.py:660-663 falls through both
        # branches) — an upstream dead-mode quirk no recipe uses, so it is
        # not reproduced here
        self._roundtrip(
            tmp_path, collaboration_direction="none",
            encoder_collaboration_mode="none",
            decoder_collaboration_mode="parallel",
        )

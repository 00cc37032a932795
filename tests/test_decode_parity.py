"""Decode parity against the ACTUAL reference beam search.

Builds the reference torch s2t_transformer in-process, imports its weights,
then runs the reference's own ``SequenceGenerator`` (torch, CPU) and ours
(jitted lax.scan beam) on the same inputs and asserts the same hypothesis
tokens come out.  This extends the forward-parity test
(test_fairseq_parity.py) to the full inference engine — the strongest
checkable form of BASELINE.md's "identical hypothesis tokens" north star
without shipping reference corpora.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools/refshim")

try:
    from build_reference import build_s2t_model, save_fairseq_checkpoint, setup_paths

    _torch_ok = True
    _skip_reason = ""
except Exception as e:  # pragma: no cover
    _torch_ok = False
    _skip_reason = f"reference unavailable: {e}"

pytestmark = pytest.mark.skipif(not _torch_ok, reason=_skip_reason)

B, T, D = 3, 50, 80
BEAM, MAX_LEN = 5, 20


def _train_decisive(model, d, steps=150, seed=0):
    """Overfit the torch reference model on a tiny deterministic mapping so
    its decode decisions are confident.  A random-weight model is
    near-uniform, where the two engines legitimately diverge: fairseq
    freezes a sentence at its first ``beam_size`` finished hypotheses
    (sequence_generator.py finalize/is_finished) while ours keeps the best
    K over the whole horizon — on flat distributions the latter finds
    longer same-average-score hypotheses the reference never visits.  On a
    trained model the first K finished ARE the best K, and hypotheses must
    match token-for-token."""
    import torch

    rng = np.random.default_rng(seed)
    n = 4
    feats = np.zeros((n, T, D), np.float32)
    tgts = []
    for i in range(n):
        toks = [4 + (i + j) % (len(d) - 4) for j in range(3)]
        tgts.append(toks + [d.eos()])
        for j, tk in enumerate(toks):
            feats[i, j * (T // 3):(j + 1) * (T // 3), (tk - 4) * 7:(tk - 3) * 7] += 2.0
    feats += rng.normal(scale=0.05, size=feats.shape).astype(np.float32)
    U = 4
    target = torch.tensor([t for t in tgts], dtype=torch.long)
    prev = torch.roll(target, 1, 1)
    prev[:, 0] = d.eos()
    lens = torch.full((n,), T, dtype=torch.long)

    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=3e-3)
    for _ in range(steps):
        opt.zero_grad()
        out = model(torch.tensor(feats), lens, prev)
        logits = out[0] if isinstance(out, tuple) else out
        loss = torch.nn.functional.cross_entropy(
            logits.reshape(-1, logits.size(-1)), target.reshape(-1)
        )
        loss.backward()
        opt.step()
    model.eval()
    return feats, np.asarray(lens), tgts, float(loss)


def _ref_generate(model, d, feats, lens):
    import torch

    setup_paths()
    from fairseq.sequence_generator import SequenceGenerator

    gen = SequenceGenerator(
        [model], d, beam_size=BEAM, max_len_a=0, max_len_b=MAX_LEN,
        len_penalty=1.0,
    )
    sample = {
        "net_input": {
            "src_tokens": torch.tensor(feats),
            "src_lengths": torch.tensor(lens),
        }
    }
    with torch.no_grad():
        hypos = gen.forward(sample)
    return hypos


class TestBeamDecodeParity:
    def test_same_hypothesis_tokens(self, tmp_path):
        from s2t_tpu.inference.generator import SequenceGenerator as MyGen
        from s2t_tpu.interop.fairseq_import import import_fairseq_s2t
        from s2t_tpu.models.s2t_transformer import S2TTransformerModel

        model, args, d = build_s2t_model(
            arch="s2t_transformer_s",
            encoder_layers=2, decoder_layers=2, encoder_embed_dim=64,
            decoder_embed_dim=64, encoder_ffn_embed_dim=128,
            decoder_ffn_embed_dim=128, encoder_attention_heads=2,
            decoder_attention_heads=2, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0,
        )
        feats, lens, tgts, tr_loss = _train_decisive(model, d)
        assert tr_loss < 0.2, f"toy training did not converge: {tr_loss}"
        feats, lens = feats[:B], lens[:B].astype(np.int32)
        ckpt = tmp_path / "ref.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_s2t(str(ckpt))

        ref = _ref_generate(model, d, feats, lens)

        import jax.numpy as jnp

        my_model = S2TTransformerModel(cfg)
        gen = MyGen(
            my_model, beam_size=BEAM, max_len_a=0.0, max_len_b=MAX_LEN,
            lenpen=1.0, max_target_positions=64,
        )
        tokens, scores, _ = gen.generate(
            params,
            {"features": jnp.asarray(feats), "feat_lengths": jnp.asarray(lens)},
        )
        tokens = np.asarray(tokens)
        scores = np.asarray(scores)

        for b in range(B):
            ref_best = ref[b][0]
            ref_toks = ref_best["tokens"].numpy()  # includes trailing EOS
            mine = [int(t) for t in tokens[b, 0]]
            # ours pads after EOS; strip to the EOS-inclusive prefix
            assert 2 in mine, f"b={b}: no EOS in {mine}"
            mine = mine[: mine.index(2) + 1]
            np.testing.assert_array_equal(
                mine, ref_toks,
                err_msg=f"hypothesis tokens differ at b={b}",
            )
            np.testing.assert_allclose(
                scores[b, 0], float(ref_best["score"]), atol=5e-3,
                err_msg=f"hypothesis score differs at b={b}",
            )


class TestEnsembleDecodeParity:
    def test_two_model_ensemble_tokens(self, tmp_path):
        """Ensemble decoding vs the reference EnsembleModel: both engines
        average member probabilities per step (reference:
        sequence_generator.py:860-900 avg_probs), so two independently
        trained members must yield identical hypothesis tokens."""
        from s2t_tpu.inference.generator import SequenceGenerator as MyGen
        from s2t_tpu.interop.fairseq_import import import_fairseq_s2t
        from s2t_tpu.models.s2t_transformer import S2TTransformerModel

        kw = dict(
            arch="s2t_transformer_s",
            encoder_layers=2, decoder_layers=2, encoder_embed_dim=64,
            decoder_embed_dim=64, encoder_ffn_embed_dim=128,
            decoder_ffn_embed_dim=128, encoder_attention_heads=2,
            decoder_attention_heads=2, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0,
        )
        m1, args1, d = build_s2t_model(seed=0, **kw)
        m2, args2, _ = build_s2t_model(seed=1, **kw)
        feats, lens, tgts, l1 = _train_decisive(m1, d, seed=0)
        _, _, _, l2 = _train_decisive(m2, d, seed=0)  # same mapping
        assert l1 < 0.2 and l2 < 0.2, (l1, l2)
        feats, lens = feats[:B], lens[:B].astype(np.int32)

        import torch

        setup_paths()
        from fairseq.sequence_generator import SequenceGenerator

        gen = SequenceGenerator(
            [m1, m2], d, beam_size=BEAM, max_len_a=0, max_len_b=MAX_LEN,
            len_penalty=1.0,
        )
        with torch.no_grad():
            ref = gen.forward({
                "net_input": {
                    "src_tokens": torch.tensor(feats),
                    "src_lengths": torch.tensor(lens),
                }
            })

        save_fairseq_checkpoint(m1, args1, str(tmp_path / "m1.pt"))
        save_fairseq_checkpoint(m2, args2, str(tmp_path / "m2.pt"))
        p1, cfg1 = import_fairseq_s2t(str(tmp_path / "m1.pt"))
        p2, cfg2 = import_fairseq_s2t(str(tmp_path / "m2.pt"))

        import jax.numpy as jnp

        my1 = S2TTransformerModel(cfg1)
        my2 = S2TTransformerModel(cfg2)
        mygen = MyGen(
            my1, beam_size=BEAM, max_len_a=0.0, max_len_b=MAX_LEN,
            lenpen=1.0, max_target_positions=64, extra_models=[my2],
        )
        tokens, scores, _ = mygen.generate(
            p1,
            {"features": jnp.asarray(feats), "feat_lengths": jnp.asarray(lens)},
            extra_params=[p2],
        )
        tokens = np.asarray(tokens)
        for b in range(B):
            ref_toks = ref[b][0]["tokens"].numpy()
            mine = [int(t) for t in tokens[b, 0]]
            assert 2 in mine, f"b={b}: no EOS in {mine}"
            mine = mine[: mine.index(2) + 1]
            np.testing.assert_array_equal(
                mine, ref_toks,
                err_msg=f"ensemble hypothesis differs at b={b}",
            )
            np.testing.assert_allclose(
                np.asarray(scores)[b, 0], float(ref[b][0]["score"]),
                atol=5e-3,
            )


class TestCTCJointRescoringParity:
    """Beam decode with joint CTC prefix rescoring (--infer-ctc-weight):
    reference SequenceGenerator blends espnet CTCPrefixScore deltas into the
    decoder lprobs per step (reference: sequence_generator.py:255-269,
    355-386).  The reference path is bsz=1-only and hard-codes CUDA in the
    blend; the harness runs it through refshim's device-patched loader with
    a faithful espnet CTCPrefixScore implementation."""

    def test_joint_ctc_hypothesis_parity(self, tmp_path):
        import torch

        from build_reference import load_cpu_sequence_generator
        from s2t_tpu.inference.generator import SequenceGenerator as MyGen
        from s2t_tpu.interop.fairseq_import import import_fairseq_s2t
        from s2t_tpu.models.s2t_transformer import S2TTransformerModel

        model, args, d = build_s2t_model(
            arch="s2t_transformer_s",
            encoder_layers=2, decoder_layers=2, encoder_embed_dim=64,
            decoder_embed_dim=64, encoder_ffn_embed_dim=128,
            decoder_ffn_embed_dim=128, encoder_attention_heads=2,
            decoder_attention_heads=2, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, ctc_weight=0.3,
        )
        feats, lens, tgts, tr_loss = _train_decisive(model, d)
        assert tr_loss < 0.2, f"toy training did not converge: {tr_loss}"
        ckpt = tmp_path / "ref_ctc.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_s2t(str(ckpt))

        RefGen = load_cpu_sequence_generator()
        w = 0.3
        beam = 4
        gen = RefGen([model], d, beam_size=beam, max_len_a=0,
                     max_len_b=MAX_LEN, len_penalty=1.0, ctc_weight=w)

        import jax.numpy as jnp

        my_model = S2TTransformerModel(cfg)
        mygen = MyGen(
            my_model, beam_size=beam, max_len_a=0.0, max_len_b=MAX_LEN,
            lenpen=1.0, max_target_positions=64, infer_ctc_weight=w,
            ctc_prune_k=8,
        )
        # the reference joint-CTC path only supports bsz=1 (its prefix-score
        # cache is built from batch row 0) — drive one utterance at a time
        for b in range(3):
            fb, lb = feats[b:b + 1], lens[b:b + 1].astype(np.int32)
            sample = {"net_input": {
                "src_tokens": torch.tensor(fb),
                "src_lengths": torch.tensor(lb),
            }}
            with torch.no_grad():
                ref = gen.forward(sample)
            toks, scores, _ = mygen.generate(
                params,
                {"features": jnp.asarray(fb), "feat_lengths": jnp.asarray(lb)},
            )
            toks = np.asarray(toks)
            ref_toks = ref[0][0]["tokens"].numpy()
            mine = [int(t) for t in toks[0, 0]]
            assert 2 in mine, f"b={b}: no EOS in {mine}"
            mine = mine[: mine.index(2) + 1]
            np.testing.assert_array_equal(
                mine, ref_toks,
                err_msg=f"joint-CTC hypothesis differs at b={b}",
            )


class TestNASTDecodeParity:
    """Encoder-only (s2t_ctc / NAST) parity: forward CTC logits AND decoded
    tokens against the reference CTCDecoder (reference: s2t_ctc.py:174-346 —
    greedy collapse via unique_consecutive + blank strip, intermediate-logit
    decode, xctc-preferred decoding for NAST ST)."""

    def _ref_ctc_decode(self, model, d, feats, lens, beam=0,
                        ctc_inter_logit=0):
        import argparse

        import torch

        setup_paths()
        from fairseq.models.speech_to_text.s2t_ctc import CTCDecoder

        args = argparse.Namespace(
            beam=beam, ctc_self_ensemble=False,
            ctc_inter_logit=ctc_inter_logit, kenlm_model=None, lm_weight=0,
            cal_flops=False,
        )
        dec = CTCDecoder([model], args, d, blank_idx=0)
        sample = {"net_input": {
            "src_tokens": torch.tensor(feats),
            "src_lengths": torch.tensor(lens),
        }}
        with torch.no_grad():
            return dec.generate([model], sample)

    def _train_ctc_decisive(self, model, d, steps=120, use_xctc=False):
        """Overfit with torch CTC loss so greedy argmax is decisive (random
        weights leave near-ties where float noise legitimately flips
        tokens)."""
        import torch

        rng = np.random.default_rng(0)
        n = 4
        feats = np.zeros((n, T, D), np.float32)
        tgts = []
        for i in range(n):
            toks = [4 + (i + j) % (len(d) - 4) for j in range(3)]
            tgts.append(toks)
            for j, tk in enumerate(toks):
                feats[i, j * (T // 3):(j + 1) * (T // 3),
                      (tk - 4) * 7:(tk - 3) * 7] += 2.0
        feats += rng.normal(scale=0.05, size=feats.shape).astype(np.float32)
        lens = torch.full((n,), T, dtype=torch.long)
        targets = torch.tensor(tgts, dtype=torch.long)
        tgt_lens = torch.full((n,), 3, dtype=torch.long)

        model.train()
        opt = torch.optim.Adam(model.parameters(), lr=3e-3)
        for _ in range(steps):
            opt.zero_grad()
            out = model.encoder(torch.tensor(feats), lens)
            key = "xctc_logit" if use_xctc and len(out.get("xctc_logit", [])) \
                else "ctc_logit"
            logit = out[key][0]  # (T', B, V)
            lp = torch.nn.functional.log_softmax(logit.float(), dim=-1)
            out_lens = (~out["encoder_padding_mask"][0]).sum(-1)
            loss = torch.nn.functional.ctc_loss(
                lp, targets, out_lens, tgt_lens, blank=0, zero_infinity=True
            )
            loss.backward()
            opt.step()
        model.eval()
        return feats, np.asarray(lens), tgts, float(loss)

    def test_greedy_and_inter_logit_decode(self, tmp_path):
        import torch

        from build_reference import build_s2t_ctc_model, save_fairseq_checkpoint
        from s2t_tpu.inference.ctc_decoder import CTCDecoder as MyCTC
        from s2t_tpu.interop.fairseq_import import import_fairseq_s2t_ctc
        from s2t_tpu.models.s2t_ctc import S2TCTCModel

        model, args, d = build_s2t_ctc_model(
            encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
            encoder_attention_heads=2, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, ctc_weight=1.0,
            inter_ctc_weight=0.2, inter_ctc_layers="1",
        )
        feats, lens, tgts, loss = self._train_ctc_decisive(model, d)
        assert loss < 0.3, f"toy CTC training did not converge: {loss}"
        ckpt = tmp_path / "nast.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_s2t_ctc(str(ckpt))
        assert cfg.inter_ctc_layers == (1,)

        import jax.numpy as jnp

        my = S2TCTCModel(cfg)
        enc = my.apply({"params": params}, jnp.asarray(feats),
                       jnp.asarray(lens.astype(np.int32)),
                       method=my.encode)

        # forward CTC-logit parity
        with torch.no_grad():
            r_out = model.encoder(torch.tensor(feats), torch.tensor(lens))
            r_ctc = r_out["ctc_logit"][0].transpose(0, 1).numpy()
            r_lens = (~r_out["encoder_padding_mask"][0]).sum(-1).numpy()
        j_lens = np.asarray(enc["encoder_lengths"])
        np.testing.assert_array_equal(j_lens, r_lens)
        j_ctc = np.asarray(enc["ctc_logits"], np.float32)
        for b in range(len(j_lens)):
            L = int(j_lens[b])
            np.testing.assert_allclose(j_ctc[b, :L], r_ctc[b, :L], atol=5e-4,
                                       rtol=1e-4)

        # greedy decode token parity (reference: unique_consecutive + strip)
        ref_hypos = self._ref_ctc_decode(model, d, feats, lens)
        toks, out_lens = MyCTC().decode_greedy(enc)
        toks, out_lens = np.asarray(toks), np.asarray(out_lens)
        for b in range(len(j_lens)):
            mine = [int(t) for t in toks[b, :out_lens[b]]]
            ref = [int(t) for t in ref_hypos[b][0]["tokens"]]
            assert mine == ref, f"greedy tokens differ at b={b}: {mine} {ref}"
            assert mine == tgts[b], f"decode missed the target at b={b}"

        # intermediate-logit decode (reference: s2t_ctc.py:276-286).  The
        # reference CTCDecoder's own selector is dead code on CTC-only
        # models (its inter_logits chain at :269-275 only populates when
        # inter_XCTC logits exist, so --ctc-inter-logit silently decodes the
        # final logit); verify against the documented semantics instead:
        # greedy-collapse the reference's OWN tap logits.
        with torch.no_grad():
            item = r_out["inter_ctc_logits"][0]
            tap = (item[0] if isinstance(item, list) else item)
            tap = tap.transpose(0, 1).float()  # (B, T', V)
        toks, out_lens = MyCTC(intermediate_logit=1).decode_greedy(enc)
        toks, out_lens = np.asarray(toks), np.asarray(out_lens)
        for b in range(len(j_lens)):
            L = int(j_lens[b])
            ids = tap[b, :L].argmax(-1).numpy()
            ref = [int(t) for t, _ in __import__("itertools").groupby(ids)
                   if t != 0]
            mine = [int(t) for t in toks[b, :out_lens[b]]]
            assert mine == ref, f"inter-logit tokens differ at b={b}"

    def test_pds_purectc_forward_parity(self, tmp_path):
        """purectc_pds_* shape: encoder-type pds + top CTC
        (conf: egs/librispeech/asr/conf/purectc_pds_base_8.yaml)."""
        import torch

        from build_reference import build_s2t_ctc_model, save_fairseq_checkpoint
        from s2t_tpu.interop.fairseq_import import import_fairseq_s2t_ctc
        from s2t_tpu.models.s2t_ctc import S2TCTCModel

        model, args, d = build_s2t_ctc_model(
            encoder_type="pds", ctc_weight=1.0,
            encoder_embed_dim=48, pds_stages=4, pds_ratios="2_2_1_2",
            pds_layers="1_1_1_1", pds_kernel_sizes="5_5_5_5",
            pds_embed_dims="48_48_48_48", pds_attn_heads="2_2_2_2",
            pds_ffn_ratios="2_2_2_2", pds_position_embed="1_1_1_1",
            pds_embed_norm=True, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0,
        )
        ckpt = tmp_path / "pds_ctc.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_s2t_ctc(str(ckpt))
        from s2t_tpu.models.pds import PDSConfig

        assert isinstance(cfg, PDSConfig)

        rng = np.random.default_rng(1)
        feats = rng.normal(size=(2, 48, 80)).astype(np.float32)
        lens = np.array([48, 41], np.int32)
        feats[1, 41:] = 0.0

        import jax.numpy as jnp

        my = S2TCTCModel(cfg)
        enc = my.apply({"params": params}, jnp.asarray(feats),
                       jnp.asarray(lens), method=my.encode)
        with torch.no_grad():
            r_out = model.encoder(torch.tensor(feats), torch.tensor(lens))
            r_ctc = r_out["ctc_logit"][0].transpose(0, 1).numpy()
            r_lens = (~r_out["encoder_padding_mask"][0]).sum(-1).numpy()
        j_lens = np.asarray(enc["encoder_lengths"])
        np.testing.assert_array_equal(j_lens, r_lens)
        j_ctc = np.asarray(enc["ctc_logits"], np.float32)
        for b in range(2):
            L = int(j_lens[b])
            np.testing.assert_allclose(j_ctc[b, :L], r_ctc[b, :L], atol=5e-4,
                                       rtol=1e-4)


class TestMTBeamDecodeParity:
    def test_same_hypothesis_tokens(self, tmp_path):
        """Same contract for the MT transformer: the reference torch beam and
        ours agree token-for-token on a decisive (overfit) model."""
        import torch

        from build_reference import build_mt_model
        from s2t_tpu.inference.generator import SequenceGenerator as MyGen
        from s2t_tpu.interop.fairseq_import import import_fairseq_mt
        from s2t_tpu.models.transformer import TransformerModel

        model, args, d = build_mt_model(
            arch="transformer_iwslt_de_en",
            encoder_layers=2, decoder_layers=2, encoder_embed_dim=64,
            decoder_embed_dim=64, encoder_ffn_embed_dim=128,
            decoder_ffn_embed_dim=128, encoder_attention_heads=2,
            decoder_attention_heads=2, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0,
        )
        # tiny copy task: source tokens -> same tokens
        n, S = 4, 5
        rng = np.random.default_rng(0)
        src = rng.integers(4, len(d), size=(n, S)).astype(np.int64)
        src[:, -1] = d.eos()
        tgt = src.copy()
        prev = np.roll(tgt, 1, 1)
        prev[:, 0] = d.eos()
        src_t = torch.tensor(src)
        lens_t = torch.full((n,), S, dtype=torch.long)
        model.train()
        opt = torch.optim.Adam(model.parameters(), lr=3e-3)
        for _ in range(200):
            opt.zero_grad()
            out = model(src_t, lens_t, torch.tensor(prev))
            logits = out[0]
            loss = torch.nn.functional.cross_entropy(
                logits.reshape(-1, logits.size(-1)),
                torch.tensor(tgt).reshape(-1),
            )
            loss.backward()
            opt.step()
        model.eval()
        assert float(loss) < 0.2, float(loss)

        from build_reference import save_fairseq_checkpoint

        ckpt = tmp_path / "mt.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_mt(str(ckpt))

        setup_paths()
        from fairseq.sequence_generator import SequenceGenerator as RefGen

        gen = RefGen([model], d, beam_size=BEAM, max_len_a=0, max_len_b=10,
                     len_penalty=1.0)
        sample = {"net_input": {"src_tokens": src_t, "src_lengths": lens_t}}
        with torch.no_grad():
            ref = gen.forward(sample)

        import jax.numpy as jnp

        my = TransformerModel(cfg)
        g = MyGen(my, beam_size=BEAM, max_len_a=0.0, max_len_b=10,
                  lenpen=1.0, max_target_positions=64,
                  input_keys=("src_tokens", "src_lengths"))
        toks, scores, _ = g.generate(
            params,
            {"src_tokens": jnp.asarray(src.astype(np.int32)),
             "src_lengths": jnp.full((n,), S, jnp.int32)},
        )
        toks, scores = np.asarray(toks), np.asarray(scores)
        for b in range(n):
            ref_toks = ref[b][0]["tokens"].numpy()
            mine = [int(t) for t in toks[b, 0]]
            assert 2 in mine
            mine = mine[: mine.index(2) + 1]
            np.testing.assert_array_equal(
                mine, ref_toks, err_msg=f"MT hypothesis differs at b={b}"
            )
            np.testing.assert_allclose(
                scores[b, 0], float(ref[b][0]["score"]), atol=5e-3
            )


class TestLMFusionDecodeParity:
    """Shallow LM fusion (reference: sequence_generator.py:390-397 —
    lprobs += lm_weight * log_softmax(lm(tokens)) at every step) must
    produce the same hypotheses as the reference generator running the
    same torch LM."""

    def test_shallow_fusion_hypothesis_parity(self, tmp_path):
        import torch

        from build_reference import (
            build_lm_model, build_mt_model, save_fairseq_checkpoint,
        )
        from s2t_tpu.inference.generator import SequenceGenerator as MyGen
        from s2t_tpu.interop.fairseq_import import (
            import_fairseq_lm, import_fairseq_mt,
        )
        from s2t_tpu.models.transformer import TransformerModel
        from s2t_tpu.models.transformer_lm import TransformerLM

        mt, args, d = build_mt_model(
            arch="transformer_iwslt_de_en",
            encoder_layers=2, decoder_layers=2, encoder_embed_dim=64,
            decoder_embed_dim=64, encoder_ffn_embed_dim=128,
            decoder_ffn_embed_dim=128, encoder_attention_heads=2,
            decoder_attention_heads=2, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0,
        )
        n, S = 4, 5
        rng = np.random.default_rng(0)
        src = rng.integers(4, len(d), size=(n, S)).astype(np.int64)
        src[:, -1] = d.eos()
        tgt = src.copy()
        prev = np.roll(tgt, 1, 1)
        prev[:, 0] = d.eos()
        src_t = torch.tensor(src)
        lens_t = torch.full((n,), S, dtype=torch.long)
        mt.train()
        opt = torch.optim.Adam(mt.parameters(), lr=3e-3)
        for _ in range(200):
            opt.zero_grad()
            out = mt(src_t, lens_t, torch.tensor(prev))
            logits = out[0]
            loss = torch.nn.functional.cross_entropy(
                logits.reshape(-1, logits.size(-1)),
                torch.tensor(tgt).reshape(-1),
            )
            loss.backward()
            opt.step()
        mt.eval()
        assert float(loss) < 0.2, float(loss)

        lm, lm_args, _ = build_lm_model(
            dictionary=d, decoder_layers=2, decoder_embed_dim=64,
            decoder_ffn_embed_dim=128, decoder_attention_heads=2,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            share_decoder_input_output_embed=True,
        )
        lm_ckpt = tmp_path / "lm.pt"
        save_fairseq_checkpoint(lm, lm_args, str(lm_ckpt))
        lm_params, lm_cfg = import_fairseq_lm(str(lm_ckpt))
        assert lm_cfg.decoder_layers == 2
        assert lm_cfg.share_decoder_input_output_embed

        import jax.numpy as jnp

        # the fork BROKE upstream's decoder-only forward: its
        # TransformerDecoder.extract_features unconditionally subscripts
        # encoder_out (transformer.py:1285 bak_encoder_out = ...[0]), so a
        # plain lm(tokens) call — what the reference generator does at
        # sequence_generator.py:391 — crashes.  Pin the regression, then
        # drive the reference's real layers through a minimal shim that
        # feeds the null encoder_out the decoder's own per-layer guards
        # expect (``[None]`` entries, skipped by no_encoder_attn layers).
        with torch.no_grad(), pytest.raises(TypeError):
            lm(torch.tensor(prev))

        class _LMShim(torch.nn.Module):
            def __init__(self, lm):
                super().__init__()
                self.lm = lm

            def forward(self, tokens):
                return self.lm.decoder(
                    tokens,
                    encoder_out={"encoder_out": [None],
                                 "encoder_padding_mask": [None]},
                )

            def get_normalized_probs(self, out, log_probs, sample=None):
                return self.lm.get_normalized_probs(out, log_probs, sample)

        shim = _LMShim(lm)

        # forward parity of the imported LM itself
        my_lm = TransformerLM(lm_cfg)
        with torch.no_grad():
            ref_logits = shim(torch.tensor(prev))[0].float().numpy()
        my_logits = np.asarray(
            my_lm.apply(
                {"params": lm_params}, jnp.asarray(prev.astype(np.int32))
            )["decoder_logits"],
            np.float32,
        )
        np.testing.assert_allclose(my_logits, ref_logits, atol=5e-4, rtol=1e-4)

        setup_paths()
        from fairseq.sequence_generator import SequenceGenerator as RefGen

        LM_W = 0.35
        gen = RefGen([mt], d, beam_size=BEAM, max_len_a=0, max_len_b=10,
                     len_penalty=1.0, lm_model=shim, lm_weight=LM_W)
        sample = {"net_input": {"src_tokens": src_t, "src_lengths": lens_t}}
        with torch.no_grad():
            ref = gen.forward(sample)

        ckpt = tmp_path / "mt.pt"
        save_fairseq_checkpoint(mt, args, str(ckpt))
        params, cfg = import_fairseq_mt(str(ckpt))
        my = TransformerModel(cfg)
        g = MyGen(my, beam_size=BEAM, max_len_a=0.0, max_len_b=10,
                  lenpen=1.0, max_target_positions=64,
                  input_keys=("src_tokens", "src_lengths"),
                  lm_model=my_lm, lm_params=lm_params, lm_weight=LM_W)
        toks, scores, _ = g.generate(
            params,
            {"src_tokens": jnp.asarray(src.astype(np.int32)),
             "src_lengths": jnp.full((n,), S, jnp.int32)},
        )
        toks = np.asarray(toks)
        for b in range(n):
            ref_toks = ref[b][0]["tokens"].numpy()
            mine = [int(t) for t in toks[b, 0]]
            assert 2 in mine
            mine = mine[: mine.index(2) + 1]
            np.testing.assert_array_equal(
                mine, ref_toks,
                err_msg=f"LM-fused hypothesis differs at b={b}",
            )


class TestCTCSelfEnsembleParity:
    """--ctc-self-ensemble (reference: s2t_ctc.py:176-192,313-320).

    Measured reference behaviour, pinned here:
      * pure-CTC models: generate() first binds inter_logits from the
        (empty) inter_XCTC list, so the self-ensemble loop never runs —
        --ctc-self-ensemble is a silent NO-OP (s2t_ctc.py:266-275,313).
      * models where both inter-XCTC and inter-CTC taps exist: the loop
        body reads an undefined name (``logits`` for ``logit``,
        s2t_ctc.py:320) and generate() raises — the flag has never worked.
    This framework implements the evidently-intended semantics (sum of
    log-softmaxes of final + every same-scale inter tap, then greedy
    collapse), verified below against that formula computed from the
    reference encoder's own tensors."""

    def test_pure_ctc_reference_noop_and_intended_semantics(self, tmp_path):
        import argparse
        import itertools

        import torch

        from build_reference import build_s2t_ctc_model, save_fairseq_checkpoint
        from s2t_tpu.inference.ctc_decoder import CTCDecoder as MyCTC
        from s2t_tpu.interop.fairseq_import import import_fairseq_s2t_ctc
        from s2t_tpu.models.s2t_ctc import S2TCTCModel

        setup_paths()
        from fairseq.models.speech_to_text.s2t_ctc import CTCDecoder as RefCTC

        model, args, d = build_s2t_ctc_model(
            encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
            encoder_attention_heads=2, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, ctc_weight=1.0,
            inter_ctc_weight=0.2, inter_ctc_layers="1",
        )
        parity = TestNASTDecodeParity()
        feats, lens, tgts, loss = parity._train_ctc_decisive(model, d)
        assert loss < 0.3, loss

        def ref_decode(self_ensemble):
            a = argparse.Namespace(
                beam=0, ctc_self_ensemble=self_ensemble, ctc_inter_logit=0,
                kenlm_model=None, lm_weight=0, cal_flops=False,
            )
            dec = RefCTC([model], a, d, blank_idx=0)
            sample = {"net_input": {
                "src_tokens": torch.tensor(feats),
                "src_lengths": torch.tensor(lens),
            }}
            with torch.no_grad():
                return dec.generate([model], sample)

        # 1. the reference flag is a no-op on pure-CTC models
        ref_on = ref_decode(True)
        ref_off = ref_decode(False)
        for b in range(len(feats)):
            np.testing.assert_array_equal(
                ref_on[b][0]["tokens"].numpy(), ref_off[b][0]["tokens"].numpy()
            )

        # 2. our self_ensemble implements the intended formula: argmax of
        #    log_softmax(final) + sum_i log_softmax(inter_i), collapsed
        ckpt = tmp_path / "nast.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_s2t_ctc(str(ckpt))

        import jax.numpy as jnp

        my = S2TCTCModel(cfg)
        enc = my.apply({"params": params}, jnp.asarray(feats),
                       jnp.asarray(lens.astype(np.int32)), method=my.encode)
        toks, out_lens = MyCTC(self_ensemble=True).decode_greedy(enc)
        toks, out_lens = np.asarray(toks), np.asarray(out_lens)

        with torch.no_grad():
            r_out = model.encoder(torch.tensor(feats), torch.tensor(lens))
        final = r_out["ctc_logit"][0].transpose(0, 1).float()
        item = r_out["inter_ctc_logits"][0]
        tap = (item[0] if isinstance(item, list) else item).transpose(0, 1).float()
        summed = torch.log_softmax(final, -1) + torch.log_softmax(tap, -1)
        r_lens = (~r_out["encoder_padding_mask"][0]).sum(-1).numpy()
        for b in range(len(feats)):
            L = int(r_lens[b])
            ids = summed[b, :L].argmax(-1).numpy()
            want = [int(t) for t, _ in itertools.groupby(ids) if t != 0]
            mine = [int(t) for t in toks[b, :out_lens[b]]]
            assert mine == want, f"self-ensemble tokens differ at b={b}"
            assert mine == tgts[b]

    def test_xctc_chain_reference_raises(self, tmp_path):
        import argparse

        import torch

        from build_reference import build_s2t_ctc_model

        setup_paths()
        from fairseq.models.speech_to_text.s2t_ctc import CTCDecoder as RefCTC

        model, args, d = build_s2t_ctc_model(
            encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
            encoder_attention_heads=2, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, ctc_weight=0.5,
            inter_ctc_weight=0.2, inter_ctc_layers="1",
            xctc_weight=1.0, inter_xctc_weight=0.2, inter_xctc_layers="1",
        )
        a = argparse.Namespace(
            beam=0, ctc_self_ensemble=True, ctc_inter_logit=0,
            kenlm_model=None, lm_weight=0, cal_flops=False,
        )
        dec = RefCTC([model], a, d, blank_idx=0)
        feats = np.random.default_rng(0).normal(size=(2, T, D)).astype(np.float32)
        sample = {"net_input": {
            "src_tokens": torch.tensor(feats),
            "src_lengths": torch.full((2,), T, dtype=torch.long),
        }}
        with torch.no_grad(), pytest.raises((NameError, UnboundLocalError)):
            dec.generate([model], sample)


class TestSearchStrategyParity:
    """Diverse beam / diverse siblings / sampling vs the reference search
    strategies (reference: search.py:552-815).  Diverse variants are
    deterministic; sampling is pinned under a FIXED noise source: the
    reference's torch.multinomial is replaced (in-test) by an explicit
    inverse-CDF over the supplied uniforms, and our sampler consumes the
    SAME uniforms through its noise_uniforms path — everything except the
    physical RNG (pruning, renormalisation, candidate order, min-len/EOS
    handling, score bookkeeping) must then agree token-for-token."""

    def _model(self, tmp_path):
        from build_reference import make_dictionary
        from s2t_tpu.interop.fairseq_import import import_fairseq_s2t

        # vocab > 2*beam: the reference DiverseSiblingsSearch takes
        # per-beam top-(2*beam) (search.py:777-795) and crashes on the
        # default 8-symbol test dictionary
        d12 = make_dictionary(tuple(f"s{i}" for i in range(12)))
        model, args, d = build_s2t_model(
            arch="s2t_transformer_s", dictionary=d12,
            encoder_layers=2, decoder_layers=2, encoder_embed_dim=64,
            decoder_embed_dim=64, encoder_ffn_embed_dim=128,
            decoder_ffn_embed_dim=128, encoder_attention_heads=2,
            decoder_attention_heads=2, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0,
        )
        feats, lens, tgts, tr_loss = _train_decisive(model, d)
        assert tr_loss < 0.2, tr_loss
        feats, lens = feats[:B], lens[:B].astype(np.int32)
        ckpt = tmp_path / "ref.pt"
        save_fairseq_checkpoint(model, args, str(ckpt))
        params, cfg = import_fairseq_s2t(str(ckpt))
        return model, d, feats, lens, params, cfg

    def _ref_gen_with_strategy(self, model, d, feats, lens, strategy, beam):
        import torch

        setup_paths()
        from fairseq.sequence_generator import SequenceGenerator

        gen = SequenceGenerator(
            [model], d, beam_size=beam, max_len_a=0, max_len_b=MAX_LEN,
            len_penalty=1.0, search_strategy=strategy,
        )
        sample = {"net_input": {
            "src_tokens": torch.tensor(feats),
            "src_lengths": torch.tensor(lens),
        }}
        with torch.no_grad():
            return gen.forward(sample)

    @staticmethod
    def _hypo_set(ref_hypos, b):
        return {tuple(int(t) for t in h["tokens"].numpy()) for h in ref_hypos[b]}

    @staticmethod
    def _my_hypo_set(tokens, b):
        out = set()
        for k in range(tokens.shape[1]):
            mine = [int(t) for t in tokens[b, k]]
            if 2 in mine:
                out.add(tuple(mine[: mine.index(2) + 1]))
        return out

    def test_diverse_beam_search(self, tmp_path):
        from s2t_tpu.inference.generator import SequenceGenerator as MyGen
        from s2t_tpu.models.s2t_transformer import S2TTransformerModel

        model, d, feats, lens, params, cfg = self._model(tmp_path)
        setup_paths()
        from fairseq import search as ref_search

        G, STRENGTH = 2, 0.5
        ref = self._ref_gen_with_strategy(
            model, d, feats, lens,
            ref_search.DiverseBeamSearch(d, G, STRENGTH), BEAM + 1,
        )

        import jax.numpy as jnp

        gen = MyGen(
            S2TTransformerModel(cfg), beam_size=BEAM + 1, max_len_a=0.0,
            max_len_b=MAX_LEN, lenpen=1.0, max_target_positions=64,
            diverse_beam_groups=G, diverse_beam_strength=STRENGTH,
        )
        tokens, scores, _ = gen.generate(
            params,
            {"features": jnp.asarray(feats), "feat_lengths": jnp.asarray(lens)},
        )
        tokens = np.asarray(tokens)
        for b in range(B):
            ref_top = tuple(int(t) for t in ref[b][0]["tokens"].numpy())
            mine = [int(t) for t in tokens[b, 0]]
            assert 2 in mine
            assert tuple(mine[: mine.index(2) + 1]) == ref_top, b
            # beyond the top hypothesis the engines legitimately diverge:
            # fairseq freezes a sentence at its first beam_size finished
            # hypotheses while ours keeps the best K over the horizon (see
            # _train_decisive), and the diversity penalty un-orders the
            # tail — same standard as TestBeamDecodeParity: top-1 exact

    def test_diverse_siblings_search(self, tmp_path):
        from s2t_tpu.inference.generator import SequenceGenerator as MyGen
        from s2t_tpu.models.s2t_transformer import S2TTransformerModel

        model, d, feats, lens, params, cfg = self._model(tmp_path)
        setup_paths()
        from fairseq import search as ref_search

        GAMMA = 0.8
        ref = self._ref_gen_with_strategy(
            model, d, feats, lens,
            ref_search.DiverseSiblingsSearch(d, GAMMA), BEAM,
        )

        import jax.numpy as jnp

        gen = MyGen(
            S2TTransformerModel(cfg), beam_size=BEAM, max_len_a=0.0,
            max_len_b=MAX_LEN, lenpen=1.0, max_target_positions=64,
            diversity_rate=GAMMA,
        )
        tokens, scores, _ = gen.generate(
            params,
            {"features": jnp.asarray(feats), "feat_lengths": jnp.asarray(lens)},
        )
        tokens = np.asarray(tokens)
        for b in range(B):
            ref_top = tuple(int(t) for t in ref[b][0]["tokens"].numpy())
            mine = [int(t) for t in tokens[b, 0]]
            assert 2 in mine
            assert tuple(mine[: mine.index(2) + 1]) == ref_top, b

    def test_sampling_topk_fixed_noise(self, tmp_path):
        import torch

        from s2t_tpu.inference.generator import SequenceGenerator as MyGen
        from s2t_tpu.models.s2t_transformer import S2TTransformerModel

        model, d, feats, lens, params, cfg = self._model(tmp_path)
        setup_paths()
        from fairseq import search as ref_search

        K, TOPK = 3, 8
        n = feats.shape[0]
        rng = np.random.default_rng(42)
        # uniforms consumed step-by-step; both sides read the same layout
        uniforms = rng.random((MAX_LEN + 4, n * K)).astype(np.float64)

        calls = {"i": 0}
        real_multinomial = torch.multinomial

        def fake_multinomial(probs, num_samples, replacement=False, **kw):
            # deterministic inverse-CDF over the given (R, M) probs rows,
            # consuming uniforms row-major — the contract our sampler's
            # noise_uniforms path implements on its candidate lists
            R, M = probs.shape
            u = torch.tensor(
                uniforms[calls["i"]][: R * num_samples]
                .reshape(R, num_samples)
            )
            calls["i"] += 1
            cdf = probs.double().cumsum(-1)
            total = cdf[:, -1:]
            idx = (cdf.unsqueeze(1) <= (u * total).unsqueeze(-1)).sum(-1)
            return idx.clamp(max=M - 1).long()

        torch.multinomial = fake_multinomial
        try:
            ref = self._ref_gen_with_strategy(
                model, d, feats, lens,
                ref_search.Sampling(d, sampling_topk=TOPK), K,
            )
        finally:
            torch.multinomial = real_multinomial

        import jax.numpy as jnp

        gen = MyGen(
            S2TTransformerModel(cfg), beam_size=K, max_len_a=0.0,
            max_len_b=MAX_LEN, lenpen=1.0, max_target_positions=64,
            sampling=True, sampling_topk=TOPK,
        )
        max_len = gen._max_len_for(0)  # max_len_a == 0 -> MAX_LEN
        gen.sampling_noise = uniforms[:max_len, :]
        tokens, scores, _ = gen.generate(
            params,
            {"features": jnp.asarray(feats), "feat_lengths": jnp.asarray(lens)},
        )
        tokens = np.asarray(tokens)
        for b in range(n):
            ref_seqs = {
                tuple(int(t) for t in h["tokens"].numpy()) for h in ref[b]
            }
            mine = self._my_hypo_set(tokens, b)
            assert mine == ref_seqs, (
                f"sampled sequences differ at b={b}: {mine} vs {ref_seqs}"
            )

"""wav2vec v1 (CPC) and wav2vec2 seq2seq fine-tune tests.

(reference behaviours: fairseq/models/wav2vec/wav2vec.py:163-630,
criterions/wav2vec_criterion.py:37-139 (non-infonce BCE path),
models/wav2vec/wav2vec2_asr.py:226 Wav2Vec2Seq2SeqModel.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.criterions import build_criterion
from s2t_tpu.models.wav2vec import Wav2VecConfig, Wav2VecModel
from s2t_tpu.models.wav2vec2 import Wav2VecSeq2Seq, Wav2VecSeq2SeqConfig


def tiny_v1_cfg(**kw):
    return Wav2VecConfig(
        conv_feature_layers=((24, 10, 5), (24, 8, 4), (24, 4, 2)),
        conv_aggregator_layers=((24, 2, 1), (24, 3, 1)),
        prediction_steps=3,
        num_negatives=4,
    ).replace(**kw)


class TestWav2VecV1:
    def test_offset_auto_matches_receptive_field(self):
        # reference wav2vec.py:226-238 for the default extractor: rin/jin
        cfg = Wav2VecConfig()
        # rin evolves 10 -> 45 -> 105 -> 225 -> 465 (jin 5,20,40,80,160);
        # ceil(465/160) = 3
        assert cfg.effective_offset == 3

    def test_forward_shapes_and_validity(self):
        cfg = tiny_v1_cfg()
        model = Wav2VecModel(cfg)
        B, T = 2, 2000
        src = jnp.asarray(np.random.default_rng(0).normal(size=(B, T)), jnp.float32)
        lengths = jnp.asarray([2000, 1200])
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lengths, False,
        )["params"]
        out = model.apply(
            {"params": params}, src, lengths, False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        Bq, Tq, S, K = out["cpc_logits"].shape
        assert (Bq, S, K) == (B, cfg.prediction_steps, 1 + cfg.num_negatives)
        assert out["cpc_valid"].shape == (B, Tq, S)
        # rows past the frame count must be invalid
        frames = model.apply({"params": params}, lengths,
                             method=Wav2VecModel._frame_lengths)
        v = np.asarray(out["cpc_valid"])
        f = np.asarray(frames)
        off = cfg.effective_offset
        for b in range(B):
            for i in range(S):
                lim = f[b] - (off + i)
                assert v[b, : max(lim, 0), i].all()
                assert not v[b, max(lim, 0):, i].any()

    def test_cpc_scores_match_naive(self):
        """Dense rolled-target scores == direct dot products (the reference's
        flat-buffer einsum semantics, wav2vec.py:585-596)."""
        cfg = tiny_v1_cfg(num_negatives=0, dropout=0.0)
        model = Wav2VecModel(cfg)
        B, T = 1, 1500
        src = jnp.asarray(np.random.default_rng(1).normal(size=(B, T)), jnp.float32)
        lengths = jnp.asarray([T])
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lengths, True,
        )
        params = variables["params"]
        out = model.apply({"params": params}, src, lengths, True)
        # recompute features/aggregator by hand through module methods
        feats = model.apply(
            {"params": params}, src, True,
            method=lambda m, s, d: m.feature_extractor(s, d),
        )
        agg = model.apply(
            {"params": params}, feats, True,
            method=lambda m, f, d: m.feature_aggregator(f, d),
        )
        W = params["step_proj"]
        bb = params["step_bias"]
        preds = jnp.einsum("btc,csd->btsd", agg, W) + bb[None, None]
        off = cfg.effective_offset
        Tq = feats.shape[1]
        got = np.asarray(out["cpc_logits"])
        for i in range(cfg.prediction_steps):
            for t in range(0, Tq - off - i, 7):
                want = float(jnp.dot(preds[0, t, i], feats[0, t + off + i]))
                assert abs(got[0, t, i, 0] - want) < 5e-4 * max(1, abs(want))

    def test_bce_loss_trains(self):
        import optax

        cfg = tiny_v1_cfg()
        model = Wav2VecModel(cfg)
        criterion = build_criterion("wav2vec", {"infonce": False})
        B, T = 2, 1800
        rng = np.random.default_rng(2)
        src = jnp.asarray(rng.normal(size=(B, T)), jnp.float32)
        lengths = jnp.asarray([1800, 1500])
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lengths, False,
        )["params"]
        tx = optax.adam(3e-4)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, key):
            def loss_fn(p):
                out = model.apply(
                    {"params": p}, src, lengths, False, rngs={"dropout": key}
                )
                loss, n, _ = criterion(out, {})
                return loss / jnp.maximum(n, 1.0)

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt2 = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt2, loss

        losses = []
        key = jax.random.PRNGKey(3)
        for i in range(12):
            params, opt, l = step(params, opt, jax.random.fold_in(key, i))
            losses.append(float(l))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_infonce_loss_path(self):
        cfg = tiny_v1_cfg(infonce=True)
        model = Wav2VecModel(cfg)
        criterion = build_criterion("wav2vec", {"infonce": True})
        src = jnp.asarray(np.random.default_rng(3).normal(size=(1, 1500)), jnp.float32)
        lengths = jnp.asarray([1500])
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lengths, False,
        )["params"]
        out = model.apply(
            {"params": params}, src, lengths, False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        loss, n, logs = criterion(out, {})
        assert np.isfinite(float(loss))
        # infonce nll of K classes should start near log(K)
        K = out["cpc_logits"].shape[-1]
        assert abs(float(loss) / float(n) - np.log(K)) < 1.0


class TestWav2VecSeq2Seq:
    def test_train_and_generate(self):
        cfg = Wav2VecSeq2SeqConfig(
            conv_feature_layers=((24, 10, 5), (24, 8, 4), (24, 4, 2)),
            encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=1,
            encoder_attention_heads=2, final_dim=16, latent_vars=8,
            mask_prob=0.2, mask_length=2, conv_pos=16, conv_pos_groups=4,
            vocab_size=40, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
            decoder_layers=1, decoder_attention_heads=2,
        )
        model = Wav2VecSeq2Seq(cfg)
        B, T, U = 2, 1600, 6
        rng = np.random.default_rng(4)
        src = jnp.asarray(rng.normal(size=(B, T)), jnp.float32)
        lengths = jnp.asarray([1600, 1100])
        prev = jnp.asarray(rng.integers(4, 40, size=(B, U)), jnp.int32)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lengths, prev, False,
        )["params"]
        out = model.apply(
            {"params": params}, src, lengths, prev, False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert out["decoder_logits"].shape == (B, U, 40)
        assert np.isfinite(np.asarray(out["decoder_logits"], np.float32)).all()

        # incremental decode step == full decode (the beam-search contract)
        enc = model.apply({"params": params}, src, lengths,
                          method=Wav2VecSeq2Seq.encode)
        from s2t_tpu.utils.masking import lengths_to_mask

        mask = lengths_to_mask(enc["encoder_lengths"], enc["encoder_out"].shape[1])
        full = model.apply(
            {"params": params}, prev, enc["encoder_out"], mask,
            method=Wav2VecSeq2Seq.decode,
        )
        cache = model.apply({"params": params}, B, U,
                            method=Wav2VecSeq2Seq.init_cache)
        for t in range(U):
            logits, cache = model.apply(
                {"params": params}, prev[:, t : t + 1], cache,
                jnp.asarray(t, jnp.int32), enc["encoder_out"], mask,
                method=Wav2VecSeq2Seq.decode_step,
            )
        np.testing.assert_allclose(
            np.asarray(logits, np.float32),
            np.asarray(full[:, -1], np.float32),
            rtol=2e-2, atol=2e-2,
        )


class TestWav2VecV1VQ:
    def test_kmeans_vq_module(self):
        from s2t_tpu.modules.vq import KmeansVectorQuantizer

        vq = KmeansVectorQuantizer(input_dim=16, num_vars=8, groups=2,
                                   vq_dim=16)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 16)),
                        jnp.float32)
        params = vq.init(jax.random.PRNGKey(0), x)
        out = vq.apply(params, x)
        assert out["x"].shape == (2, 10, 16)
        assert out["targets"].shape == (2, 10, 2)
        assert float(out["kmeans_loss"]) > 0
        # straight-through: gradient flows to the input
        g = jax.grad(lambda x: jnp.sum(vq.apply(params, x)["x"]))(x)
        assert np.abs(np.asarray(g)).sum() > 0
        # quantized rows are actual codewords (per group)
        emb = np.asarray(params["params"]["embedding"], np.float32)
        got = np.asarray(out["x"], np.float32).reshape(2, 10, 2, 8)
        idx = np.asarray(out["targets"])
        for b in range(2):
            for t in range(0, 10, 3):
                for gr in range(2):
                    np.testing.assert_allclose(
                        got[b, t, gr], emb[idx[b, t, gr], gr], rtol=1e-5)

    def test_v1_kmeans_trains(self):
        cfg = tiny_v1_cfg(vq_type="kmeans", vq_vars=8, vq_groups=2, vq_dim=24)
        model = Wav2VecModel(cfg)
        from s2t_tpu.criterions import build_criterion

        criterion = build_criterion("wav2vec", {"infonce": False})
        src = jnp.asarray(np.random.default_rng(5).normal(size=(2, 1600)),
                          jnp.float32)
        lengths = jnp.asarray([1600, 1200])
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lengths, False,
        )["params"]
        out = model.apply(
            {"params": params}, src, lengths, False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert "kmeans_loss" in out
        loss, n, logs = criterion(out, {})
        assert np.isfinite(float(loss))
        assert "kmeans_loss" in logs
        g = jax.grad(lambda p: criterion(model.apply(
            {"params": p}, src, lengths, False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        ), {})[0])(params)
        # the codebook receives gradient through the VQ losses
        emb_g = np.asarray(g["vq"]["embedding"], np.float32)
        assert np.abs(emb_g).sum() > 0

    def test_v1_gumbel_diversity(self):
        cfg = tiny_v1_cfg(vq_type="gumbel", vq_vars=8, vq_groups=2, vq_dim=24)
        model = Wav2VecModel(cfg)
        from s2t_tpu.criterions import build_criterion

        criterion = build_criterion("wav2vec", {"infonce": True,
                                                "prob_ppl_weight": 0.1})
        src = jnp.asarray(np.random.default_rng(6).normal(size=(1, 1500)),
                          jnp.float32)
        lengths = jnp.asarray([1500])
        cfg2 = cfg.replace(infonce=True)
        model = Wav2VecModel(cfg2)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lengths, False,
        )["params"]
        out = model.apply(
            {"params": params}, src, lengths, False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert "prob_perplexity" in out
        loss, n, logs = criterion(out, {})
        assert "diversity_loss" in logs and np.isfinite(float(loss))


class TestNegativeSampling:
    def test_negatives_never_from_padding(self):
        """NaN-canary: poison the padded waveform tail; if any negative (or
        target) were drawn from padded frames, the CPC logits on valid
        positions would go NaN (code-review r3: padded-tail negatives)."""
        cfg = tiny_v1_cfg(num_negatives=6, cross_sample_negatives=4)
        model = Wav2VecModel(cfg)
        rng = np.random.default_rng(7)
        B, T = 3, 2000
        src = rng.normal(size=(B, T)).astype(np.float32)
        lengths = np.asarray([2000, 1100, 700])
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(src), jnp.asarray(lengths), False,
        )["params"]
        out_clean = model.apply(
            {"params": params}, jnp.asarray(src), jnp.asarray(lengths), False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        src_poison = src.copy()
        for b, L in enumerate(lengths):
            src_poison[b, L:] = np.nan
        out = model.apply(
            {"params": params}, jnp.asarray(src_poison), jnp.asarray(lengths),
            False, rngs={"dropout": jax.random.PRNGKey(2)},
        )
        logits = np.asarray(out["cpc_logits"], np.float32)
        valid = np.asarray(out["cpc_valid"])
        # conv receptive field bleeds NaN slightly BEFORE the frame boundary;
        # restrict the check to frames whose receptive field is fully valid
        frames = np.asarray(model.apply(
            {"params": params}, jnp.asarray(lengths),
            method=Wav2VecModel._frame_lengths))
        margin = 2  # extractor kernel/stride margin at these tiny configs
        clean = np.asarray(out_clean["cpc_logits"], np.float32)
        for b in range(B):
            f = frames[b] - margin
            v = valid[b, :f]
            assert np.isfinite(logits[b, :f][v]).all(), f"row {b}"
            # and the clean run agrees where both are finite
            np.testing.assert_allclose(
                logits[b, :f][v], clean[b, :f][v], rtol=1e-4, atol=1e-4
            )

"""wav2vec 2.0 stack tests: masking, quantizer, pretraining e2e, fine-tuning.

(reference behaviours: fairseq/models/wav2vec/wav2vec2.py,
criterions/wav2vec_criterion.py, tasks/audio_pretraining.py,
models/speech_to_text/s2t_w2v2_transformer.py)
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    Wav2VecCtc,
    Wav2VecCtcConfig,
    conv_out_lengths,
    sample_mask_spans,
)


def tiny_w2v_cfg(**kw):
    return Wav2Vec2Config(
        conv_feature_layers=((32, 10, 5), (32, 8, 4), (32, 4, 2)),
        encoder_embed_dim=48, encoder_ffn_embed_dim=96, encoder_layers=2,
        encoder_attention_heads=2, final_dim=32, latent_vars=20,
        latent_groups=2, num_negatives=10, mask_length=3, mask_prob=0.5,
        conv_pos=16, conv_pos_groups=4, dropout=0.0, attention_dropout=0.0,
        dropout_input=0.0, dropout_features=0.0,
    ).replace(**kw)


class TestMasking:
    def test_spans_within_valid(self):
        rng = jax.random.PRNGKey(0)
        lengths = jnp.asarray([50, 30, 10])
        positions, mask = sample_mask_spans(rng, 3, 50, lengths, 0.5, 3)
        pos = np.asarray(positions)
        for b, L in enumerate([50, 30, 10]):
            assert pos[b].max() < L + 3 - 1  # spans start within valid range
        assert mask.shape == (3, 50)
        # every listed position is marked in the boolean mask
        m = np.asarray(mask)
        for b in range(3):
            assert m[b, pos[b]].all()

    def test_conv_out_lengths(self):
        layers = ((512, 10, 5), (512, 3, 2))
        out = conv_out_lengths(jnp.asarray([100, 55]), layers)
        # torch formula: floor((L - k) / s + 1) per layer
        np.testing.assert_array_equal(np.asarray(out), [9, 4])


class TestPretraining:
    def test_forward_shapes_and_loss(self):
        cfg = tiny_w2v_cfg()
        model = Wav2Vec2Model(cfg)
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.normal(size=(2, 800)).astype(np.float32))
        lens = jnp.asarray([800, 600])
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lens, deterministic=True,
        )
        out = model.apply(
            variables, src, lens, deterministic=False, temp=2.0,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        K, B, M = out["logits"].shape
        assert K == cfg.num_negatives + 1 and B == 2
        assert np.isfinite(np.asarray(out["features_pen"]))
        assert float(out["prob_perplexity"]) > 1.0

        from s2t_tpu.criterions.wav2vec import Wav2VecCriterion

        crit = Wav2VecCriterion(Wav2VecCriterion.Config())
        loss, ss, logs = crit(out, {})
        assert np.isfinite(float(loss)) and float(ss) == B * M

    def test_pretraining_loss_decreases(self, tmp_path):
        """End-to-end: trainer over the audio_pretraining task on synthetic
        audio; contrastive loss must drop (reference test strategy §4.2)."""
        from s2t_tpu.config import OptimizationConfig
        from s2t_tpu.criterions.wav2vec import Wav2VecCriterion
        from s2t_tpu.tasks.audio_pretraining import AudioPretrainingTask
        from s2t_tpu.config import TrainConfig, from_dict
        from s2t_tpu.trainer import Trainer

        # synthetic manifest of sinusoid-ish waveforms
        root = tmp_path / "audio"
        root.mkdir()
        rng = np.random.default_rng(0)
        lines = [str(root)]
        for i in range(8):
            n = 700 + 50 * (i % 3)
            t = np.arange(n, dtype=np.float32)
            wav = np.sin(0.02 * (i + 1) * t) + 0.05 * rng.normal(size=n)
            np.save(root / f"u{i}.npy", wav.astype(np.float32))
            lines.append(f"u{i}.npy\t{n}")
        (root / "train.tsv").write_text("\n".join(lines))

        cfg = from_dict(TrainConfig, {
            "task": "audio_pretraining", "arch": "wav2vec2_base",
            "criterion": "wav2vec",
            "dataset": {"data": str(root), "max_tokens": 4000,
                        "max_source_positions": 1000, "num_buckets": 2},
            "optimization": {"lr": 2e-3, "warmup_updates": 5},
        })
        task = AudioPretrainingTask.setup(cfg)
        ds = task.load_dataset("train", is_train=True)
        model_cfg = tiny_w2v_cfg()
        model = Wav2Vec2Model(model_cfg)
        crit = Wav2VecCriterion(Wav2VecCriterion.Config())
        trainer = Trainer(
            model, crit,
            OptimizationConfig(lr=2e-3, warmup_updates=5, clip_norm=1.0),
            forward_fn=task.forward_fn(),
        )
        itr = task.get_batch_iterator(ds, max_tokens=4000, shuffle=False,
                                      batch_size_multiple=8).next_epoch_itr()
        batch = {k: jnp.asarray(v) for k, v in next(iter(itr)).items()
                 if k not in ("ids", "nsentences")}
        state = trainer.init_state(batch)
        losses = []
        for _ in range(15):
            state, metrics = trainer.train_step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()


class TestFineTune:
    def test_wav2vec_ctc_forward(self):
        cfg = Wav2VecCtcConfig(
            conv_feature_layers=((32, 10, 5), (32, 8, 4)),
            encoder_embed_dim=48, encoder_ffn_embed_dim=96, encoder_layers=2,
            encoder_attention_heads=2, vocab_size=11, conv_pos=16,
            conv_pos_groups=4,
        )
        model = Wav2VecCtc(cfg)
        src = jnp.zeros((2, 600))
        lens = jnp.asarray([600, 400])
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lens,
        )
        out = model.apply(variables, src, lens)
        assert out["ctc_logits"].shape[-1] == 11
        assert out["ctc_logits"].shape[1] == out["encoder_out"].shape[1]

    def test_w2v_transplant_into_ctc(self):
        """Pretrained w2v params transplant into the fine-tuning model
        (the load_wav2vec_checkpoint mechanism, wav2vec2_asr.py:98-108)."""
        from flax import serialization

        from s2t_tpu.utils.checkpoint import transplant_component

        w2v_cfg = tiny_w2v_cfg()
        pre = Wav2Vec2Model(w2v_cfg)
        src = jnp.zeros((1, 800))
        lens = jnp.asarray([800])
        pre_vars = pre.init(
            {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
            src, lens, deterministic=True,
        )
        ctc_cfg = Wav2VecCtcConfig(**{
            f.name: getattr(w2v_cfg, f.name)
            for f in __import__("dataclasses").fields(Wav2Vec2Config)
        }, vocab_size=9)
        ft = Wav2VecCtc(ctc_cfg)
        ft_vars = ft.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lens,
        )
        tgt = serialization.to_state_dict(ft_vars["params"])
        src_tree = {"w2v": serialization.to_state_dict(pre_vars["params"])}
        merged = transplant_component(tgt, src_tree, "w2v", strict=False)
        # the transplanted encoder produces the pretrained features
        out_ft = ft.apply({"params": merged}, src, lens)
        x_pre, _ = pre.apply(pre_vars, src, lens, deterministic=True,
                             method=Wav2Vec2Model.extract_features)
        np.testing.assert_allclose(
            np.asarray(out_ft["encoder_out"]), np.asarray(x_pre), atol=1e-5
        )


class TestS2TW2V2:
    def test_forward_and_generate(self):
        from s2t_tpu.models.s2t_w2v2_transformer import (
            S2TW2V2Config, S2TW2V2TransformerModel,
        )

        cfg = S2TW2V2Config(
            w2v=tiny_w2v_cfg(), encoder_layers=1, encoder_embed_dim=48,
            encoder_ffn_embed_dim=96, encoder_attention_heads=2,
            decoder_layers=1, decoder_embed_dim=48, decoder_ffn_embed_dim=96,
            decoder_attention_heads=2, vocab_size=17, dropout=0.0,
            attention_dropout=0.0, activation_dropout=0.0,
        )
        model = S2TW2V2TransformerModel(cfg)
        src = jnp.zeros((2, 700))
        lens = jnp.asarray([700, 500])
        prev = jnp.asarray([[2, 5, 6], [2, 7, 8]], jnp.int32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            src, lens, prev,
        )
        out = model.apply(variables, src, lens, prev)
        assert out["decoder_logits"].shape == (2, 3, 17)

        from s2t_tpu.inference.generator import SequenceGenerator

        gen = SequenceGenerator(model, beam_size=2, max_len_b=6, eos_id=2,
                                pad_id=1, max_target_positions=16)
        tokens, scores, enc = gen.generate(
            variables["params"],
            {"features": src, "feat_lengths": lens},
        )
        assert np.asarray(tokens).shape[0] == 2

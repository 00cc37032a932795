"""Speech-to-text task: ASR and end-to-end ST.

(reference: fairseq/tasks/speech_to_text.py:28-652 — dictionary loading from
the data config.yaml (:277-305), dataset creation (:316-357), model build with
vocab plumbing (:376), generator wiring CTCDecoder vs SequenceGenerator
(:500-530), eval WER/BLEU during validation (:418-499).)

On-device twist: feature transforms (CMVN/SpecAugment) and — when
``use_audio_input`` — fbank extraction run inside the jitted step via the
forward adapter, not in DataLoader workers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from s2t_tpu.config import TrainConfig
from s2t_tpu.data.audio.fbank import fbank_jax
from s2t_tpu.data.audio.transforms import CompositeTransform
from s2t_tpu.data.dataset import S2TDataConfig, SpeechToTextDataset
from s2t_tpu.data.dictionary import Dictionary
from s2t_tpu.inference.ctc_decoder import CTCDecoder
from s2t_tpu.inference.generator import SequenceGenerator
from s2t_tpu.registry import register_task
from s2t_tpu.tasks.base import Task


def _model_wants_oracle(model) -> bool:
    cfg = getattr(model, "cfg", None)
    return (
        getattr(cfg, "ctc_pae_ground_truth_ratio", 0.0) > 0
        or getattr(cfg, "xctc_pae_ground_truth_ratio", 0.0) > 0
    )


@register_task("speech_to_text")
class SpeechToTextTask(Task):
    def __init__(self, cfg: TrainConfig, data_cfg: S2TDataConfig,
                 tgt_dict: Dictionary, src_dict: Optional[Dictionary]):
        super().__init__(cfg)
        self.data_cfg = data_cfg
        self.tgt_dict = tgt_dict
        self.src_dict = src_dict or tgt_dict

    @classmethod
    def setup(cls, cfg: TrainConfig) -> "SpeechToTextTask":
        root = Path(cfg.dataset.data)
        data_cfg_path = root / "config.yaml"
        data_cfg = (
            S2TDataConfig.from_yaml(data_cfg_path)
            if data_cfg_path.exists()
            else S2TDataConfig()
        )
        tgt_dict = Dictionary.load(root / data_cfg.vocab_filename)
        src_dict = None
        if data_cfg.src_vocab_filename:
            src_dict = Dictionary.load(root / data_cfg.src_vocab_filename)
        return cls(cfg, data_cfg, tgt_dict, src_dict)

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)

        def one(name):
            return SpeechToTextDataset(
                root / f"{name}.tsv", self.data_cfg, self.tgt_dict,
                self.src_dict, is_train=is_train, root=str(root),
            )

        if "," in split:
            # multilingual: comma-separated per-language TSVs with
            # temperature resampling (reference: tasks/speech_to_text.py
            # from_tsv multi-split + _get_size_ratios)
            from s2t_tpu.data.multilingual import MultilingualS2TDataset

            ds = MultilingualS2TDataset(
                [one(s.strip()) for s in split.split(",")],
                alpha=self.data_cfg.sampling_alpha,
                resample=is_train,
            )
        else:
            ds = one(split)
        self.datasets[split] = ds
        return ds

    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch or "s2t_transformer_s",
            self.cfg.model,
            vocab_size=len(self.tgt_dict),
            src_vocab_size=len(self.src_dict),
            input_feat_per_channel=self.data_cfg.input_feat_per_channel,
            input_channels=self.data_cfg.input_channels,
            max_source_positions=self.cfg.dataset.max_source_positions,
            max_target_positions=self.cfg.dataset.max_target_positions,
        )

    def forward_fn(self):
        train_transforms = CompositeTransform.from_config_dict(
            self.data_cfg.get_transforms("train", True)
        )
        eval_transforms = CompositeTransform.from_config_dict(
            self.data_cfg.get_transforms("eval", False)
        )
        use_audio = self.data_cfg.use_audio_input
        n_mels = self.data_cfg.input_feat_per_channel

        # fused Pallas fbank on TPU; XLA composite elsewhere (CPU tests)
        use_pallas = jax.default_backend() not in ("cpu",)
        capture_attn = self.cfg.criterion.startswith("latency_augmented")

        def fwd(model, params, batch, deterministic, rngs=None):
            feats = batch["features"]
            lengths = batch["feat_lengths"]
            if use_audio:
                # on-device fused feature extraction (replaces the reference's
                # host DataLoader fbank path, audio_utils.py:82)
                if use_pallas:
                    from s2t_tpu.ops.fbank_pallas import fbank_pallas

                    feats, lengths = fbank_pallas(feats, lengths, num_mel_bins=n_mels)
                else:
                    feats, lengths = fbank_jax(feats, lengths, num_mel_bins=n_mels)
            tf = eval_transforms if deterministic else train_transforms
            if tf.transforms and params is not None:
                rng = None
                if rngs is not None and not deterministic:
                    rng = jax.random.fold_in(rngs["dropout"], 7)
                feats = tf(feats, lengths, rng)
            args = (feats, lengths, batch["prev_tokens"])
            if params is None:  # init mode
                return model.init(rngs["params"], *args, deterministic=True)
            kwargs = {}
            if getattr(model.cfg, "consumes_transcript", False) and "transcript" in batch:
                kwargs["transcript"] = batch["transcript"]
                kwargs["transcript_lengths"] = batch["transcript_lengths"]
            if not deterministic and _model_wants_oracle(model):
                # thread CTC targets for the PAE ground-truth oracle
                if "transcript" in batch:
                    kwargs["transcript"] = batch["transcript"]
                    kwargs["transcript_lengths"] = batch["transcript_lengths"]
                if "target" in batch and getattr(
                    model.cfg, "xctc_pae_ground_truth_ratio", 0.0
                ) > 0:
                    tgt = batch["target"]
                    kwargs["target"] = jnp.where(tgt == 2, 1, tgt)  # strip EOS
                    kwargs["target_lengths"] = batch["target_lengths"] - 1
            if (
                not deterministic
                and getattr(model.cfg, "inter_mixup_ratio_decay", False)
                and "_step" in batch
            ):
                kwargs["num_updates"] = batch["_step"]
            if capture_attn:
                # latency-augmented training: the criterion penalizes the
                # decoder's expected cross-attention delays (criterions/
                # latency.py) — capture the sown probabilities
                from s2t_tpu.criterions.latency import stack_cross_attn

                out, mods = model.apply(
                    {"params": params}, *args, deterministic=deterministic,
                    rngs=rngs, mutable=["intermediates"], **kwargs,
                )
                attn = stack_cross_attn(mods["intermediates"])
                if attn is not None:
                    out["cross_attn"] = attn
                return out
            return model.apply(
                {"params": params}, *args, deterministic=deterministic, rngs=rngs,
                **kwargs,
            )

        return fwd

    def build_generator(self, model, gen_cfg=None):
        g = gen_cfg or self.cfg.generation
        if getattr(model.cfg, "decoder_layers", 1) == 0:
            # encoder-only (NAST-style) model: decode from CTC (XCTC for ST)
            from s2t_tpu.inference.ctc_decoder import CTCGenerator

            dec = CTCDecoder(
                beam_size=g.beam, pad_id=self.tgt_dict.pad(),
                self_ensemble=g.ctc_self_ensemble,
                intermediate_logit=g.ctc_inter_logit,
            )
            ngram_lm = None
            if g.lm_path and str(g.lm_path).endswith(".arpa"):
                # kenlm-style n-gram fusion for CTC beams (reference:
                # s2t_ctc.py:215-231 ctcdecode+kenlm)
                from s2t_tpu.data.ngram_lm import ArpaLM

                ngram_lm = ArpaLM.load(g.lm_path)
            return CTCGenerator(
                model, dec, use_xctc=getattr(model.cfg, "use_xctc", False),
                ngram_lm=ngram_lm, lm_weight=g.lm_weight,
                dictionary=self.tgt_dict,
            )
        if getattr(g, "jacobi", False):
            if g.no_repeat_ngram_size > 0:
                # ngram blocking is not expressible in the parallel
                # iteration; fall back to the sequential engine so output
                # still matches the configured semantics
                import logging

                logging.getLogger("s2t_tpu").warning(
                    "generation.jacobi ignored: no_repeat_ngram_size > 0 "
                    "requires the sequential beam engine"
                )
            else:
                from s2t_tpu.inference.jacobi import JacobiGenerator

                return JacobiGenerator(
                    model,
                    max_len_a=g.max_len_a,
                    max_len_b=g.max_len_b,
                    max_target_positions=self.cfg.dataset.max_target_positions,
                    min_len=g.min_len,
                    lenpen=g.lenpen,
                    eos_id=self.tgt_dict.eos(),
                    pad_id=self.tgt_dict.pad(),
                )
        return SequenceGenerator(
            model,
            beam_size=g.beam,
            max_len_a=g.max_len_a,
            max_len_b=g.max_len_b,
            min_len=g.min_len,
            lenpen=g.lenpen,
            temperature=g.temperature,
            no_repeat_ngram_size=g.no_repeat_ngram_size,
            eos_id=self.tgt_dict.eos(),
            pad_id=self.tgt_dict.pad(),
            max_target_positions=self.cfg.dataset.max_target_positions,
            infer_ctc_weight=g.infer_ctc_weight,
            sampling=g.sampling,
            sampling_topk=g.sampling_topk,
            sampling_topp=g.sampling_topp,
            prefix_size=g.prefix_size,
            diverse_beam_groups=g.diverse_beam_groups,
            diverse_beam_strength=g.diverse_beam_strength,
            diversity_rate=g.diversity_rate,
            constraints_mode=g.constraints,
            kv_cache_dtype=getattr(g, "kv_cache_dtype", "model"),
        )

    def decode_tokens(self, tokens) -> str:
        """ids -> detokenised text (for scoring/output files)."""
        return self.tgt_dict.string(
            tokens, bpe_symbol=self.cfg.generation.post_process
        )

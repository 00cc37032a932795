"""Translation tasks: raw-text MT with on-the-fly subword tokenisation.

(reference: fairseq/tasks/translation.py:263 and the S2T fork's
translation_with_tokenizer.py:316 — MT over raw text with SPM applied on the
fly so dictionaries can be shared with the ST task for SATE pretraining.)
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import yaml

from s2t_tpu.config import TrainConfig
from s2t_tpu.data.dictionary import Dictionary
from s2t_tpu.data.text_dataset import TranslationDataset
from s2t_tpu.data.tokenizer import build_tokenizer
from s2t_tpu.inference.generator import SequenceGenerator
from s2t_tpu.registry import register_task
from s2t_tpu.tasks.base import Task


@dataclass
class TransDataConfig:
    """Per-dataset config.yaml for MT (reference: TransDataConfig,
    tasks/translation_with_tokenizer.py:237)."""

    vocab_filename: str = "dict.txt"
    src_vocab_filename: Optional[str] = None
    bpe_tokenizer: Optional[dict] = None
    src_bpe_tokenizer: Optional[dict] = None
    src_lang: str = "en"
    tgt_lang: str = "de"

    @classmethod
    def from_yaml(cls, path):
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in raw.items() if k in known})


@register_task("translation")
@register_task("translation_with_tokenizer")
# XLM-initialised MT (reference: tasks/translation_from_pretrained_xlm.py)
# is this task + --load-pretrained-encoder-from pointing at a masked-LM
# checkpoint; the transplant loader handles the key mapping
@register_task("translation_from_pretrained_xlm")
class TranslationTask(Task):
    def __init__(self, cfg, data_cfg, tgt_dict, src_dict):
        super().__init__(cfg)
        self.data_cfg = data_cfg
        self.tgt_dict = tgt_dict
        self.src_dict = src_dict or tgt_dict
        self.bpe = build_tokenizer(data_cfg.bpe_tokenizer)
        self.src_bpe = build_tokenizer(data_cfg.src_bpe_tokenizer) or self.bpe

    @classmethod
    def setup(cls, cfg: TrainConfig):
        root = Path(cfg.dataset.data)
        dc_path = root / "config.yaml"
        data_cfg = TransDataConfig.from_yaml(dc_path) if dc_path.exists() else TransDataConfig()
        tgt_dict = Dictionary.load(root / data_cfg.vocab_filename)
        src_dict = None
        if data_cfg.src_vocab_filename:
            src_dict = Dictionary.load(root / data_cfg.src_vocab_filename)
        return cls(cfg, data_cfg, tgt_dict, src_dict)

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        sl, tl = self.data_cfg.src_lang, self.data_cfg.tgt_lang
        # binarized mmap pair (fairseq-preprocess layout) takes precedence
        bin_src = root / f"{split}.{sl}-{tl}.{sl}"
        if Path(str(bin_src) + ".bin").exists():
            from s2t_tpu.data.indexed_dataset import BinarizedTranslationDataset

            bin_tgt = root / f"{split}.{sl}-{tl}.{tl}"
            ds = BinarizedTranslationDataset(
                bin_src,
                bin_tgt if Path(str(bin_tgt) + ".bin").exists() else None,
            )
            self.datasets[split] = ds
            return ds
        src = root / f"{split}.{sl}"
        tgt = root / f"{split}.{tl}"
        align = root / f"{split}.align"
        ds = TranslationDataset(
            src, tgt if tgt.exists() else None, self.src_dict, self.tgt_dict,
            self.src_bpe, self.bpe,
            align_path=align if (
                self.cfg.task_cfg.get("load_alignments") and align.exists()
            ) else None,
        )
        self.datasets[split] = ds
        return ds

    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch or "transformer",
            self.cfg.model,
            vocab_size=len(self.tgt_dict),
            src_vocab_size=len(self.src_dict),
            max_source_positions=self.cfg.dataset.max_source_positions,
            max_target_positions=self.cfg.dataset.max_target_positions,
        )

    def forward_fn(self):
        def fwd(model, params, batch, deterministic, rngs=None):
            args = (batch["src_tokens"], batch["src_lengths"], batch["prev_tokens"])
            if params is None:  # init mode
                return model.init(rngs["params"], *args, deterministic=True)
            from s2t_tpu.models.transformer_align import (
                TransformerAlignModel,
                extract_alignment_attn,
            )

            if isinstance(model, TransformerAlignModel):
                # capture the alignment layer's cross-attention
                out, mods = model.apply(
                    {"params": params}, *args, deterministic=deterministic,
                    rngs=rngs, mutable=["intermediates"],
                )
                out["align_attn"] = extract_alignment_attn(
                    mods["intermediates"], model.cfg
                )
                return out
            if self.cfg.criterion.startswith("latency_augmented"):
                # simultaneous-MT latency penalty over all decoder layers'
                # cross-attention (criterions/latency.py)
                from s2t_tpu.criterions.latency import stack_cross_attn

                out, mods = model.apply(
                    {"params": params}, *args, deterministic=deterministic,
                    rngs=rngs, mutable=["intermediates"],
                )
                attn = stack_cross_attn(mods["intermediates"])
                if attn is not None:
                    out["cross_attn"] = attn
                return out
            return model.apply(
                {"params": params}, *args, deterministic=deterministic, rngs=rngs
            )

        return fwd

    def build_generator(self, model, gen_cfg=None):
        g = gen_cfg or self.cfg.generation
        return SequenceGenerator(
            model, beam_size=g.beam, max_len_a=g.max_len_a, max_len_b=g.max_len_b,
            min_len=g.min_len, lenpen=g.lenpen, temperature=g.temperature,
            no_repeat_ngram_size=g.no_repeat_ngram_size,
            eos_id=self.tgt_dict.eos(), pad_id=self.tgt_dict.pad(),
            max_target_positions=self.cfg.dataset.max_target_positions,
            input_keys=("src_tokens", "src_lengths"),
            prefix_size=g.prefix_size,
            diverse_beam_groups=g.diverse_beam_groups,
            diverse_beam_strength=g.diverse_beam_strength,
            diversity_rate=g.diversity_rate,
            constraints_mode=g.constraints,
        )

    def decode_tokens(self, tokens) -> str:
        return self.tgt_dict.string(tokens, bpe_symbol=self.cfg.generation.post_process)


@register_task("semisupervised_translation")
class SemisupervisedTranslationTask(TranslationTask):
    """Bitext + online backtranslation of monolingual target text
    (reference: tasks/semisupervised_translation.py — joint parallel + BT
    training.  The reference trains the reverse direction inside one
    multilingual model; here the reverse (tgt->src) model is a pretrained
    checkpoint — the standard online-BT recipe — given by
    ``task_cfg.bt_checkpoint`` with arch ``task_cfg.bt_arch``.)

    Data: ``{split}.{src}/.{tgt}`` bitext plus ``mono.{tgt}`` monolingual
    targets; training batches alternate bitext and synthetic-BT batches
    (each batch single-origin via ConcatHomogeneous)."""

    def load_dataset(self, split: str, is_train: bool = False):
        bitext = super().load_dataset(split, is_train)
        t = self.cfg.task_cfg or {}
        root = Path(self.cfg.dataset.data)
        mono = root / f"mono.{self.data_cfg.tgt_lang}"
        ckpt = t.get("bt_checkpoint")
        if not is_train or not ckpt or not mono.exists():
            return bitext
        from s2t_tpu.data.backtranslation_dataset import (
            BacktranslationDataset, ConcatHomogeneous, make_backtranslator,
        )
        from s2t_tpu.models import build_model
        from s2t_tpu.utils.checkpoint import load_checkpoint

        tree, meta = load_checkpoint(ckpt)
        params = tree["params"] if "params" in tree else tree
        # reverse model translates tgt -> src
        rev = build_model(
            t.get("bt_arch", self.cfg.arch or "transformer"),
            t.get("bt_model", meta.get("model", {})),
            vocab_size=len(self.src_dict),
            src_vocab_size=len(self.tgt_dict),
            max_source_positions=self.cfg.dataset.max_source_positions,
            max_target_positions=self.cfg.dataset.max_target_positions,
        )
        gen = SequenceGenerator(
            rev, beam_size=int(t.get("bt_beam", 1)),
            max_len_b=self.cfg.dataset.max_source_positions,
            eos_id=self.src_dict.eos(), pad_id=self.src_dict.pad(),
            max_target_positions=self.cfg.dataset.max_source_positions,
            input_keys=("src_tokens", "src_lengths"),
        )
        bt = BacktranslationDataset(
            mono, self.tgt_dict, make_backtranslator(rev, params, gen),
            tgt_bpe=self.bpe,
        )
        parts = [bitext, bt]
        if float(t.get("lambda_denoising", 0.0)) > 0:
            # DAE stream (reference: semisupervised_translation.py
            # --lambda-denoising + data/noising.py UnsupervisedMTNoising):
            # noised monolingual target text -> clean text
            from s2t_tpu.data.wrappers import NoisingDataset

            dae = NoisingDataset(
                TranslationDataset(mono, mono, self.tgt_dict, self.tgt_dict,
                                   self.bpe, self.bpe),
                self.tgt_dict, seed=self.cfg.common.seed,
                max_word_shuffle_distance=float(
                    t.get("word_shuffle", 3)),
                word_dropout_prob=float(t.get("word_dropout_prob", 0.1)),
                word_blanking_prob=float(t.get("word_blanking_prob", 0.1)),
            )
            parts.append(dae)
        ds = ConcatHomogeneous(parts)
        self.datasets[split] = ds
        return ds


@register_task("translation_from_pretrained_bart")
class TranslationFromPretrainedBARTTask(TranslationTask):
    """MT fine-tuning of an mBART checkpoint (reference:
    fairseq/tasks/translation_from_pretrained_bart.py): <lang:xx> tags for
    every pretraining language are added to the dictionaries; the source
    language id is appended after the source EOS and the target language tag
    is prepended to the target, so the decoder conditions on the target
    language the way mBART pretraining did.  Load the pretrained weights via
    --finetune-from-model / checkpoint transplant."""

    def __init__(self, cfg, data_cfg, tgt_dict, src_dict):
        super().__init__(cfg, data_cfg, tgt_dict, src_dict)
        langs = cfg.task_cfg.get("langs", "")
        self.langs = [l for l in str(langs).split(",") if l]
        for d in {id(self.src_dict): self.src_dict,
                  id(self.tgt_dict): self.tgt_dict}.values():
            d.add_symbol("<mask>")
            for l in self.langs:
                d.add_symbol(f"<lang:{l}>")

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        sl, tl = self.data_cfg.src_lang, self.data_cfg.tgt_lang
        src = root / f"{split}.{sl}"
        tgt = root / f"{split}.{tl}"
        ds = TranslationDataset(
            src, tgt if tgt.exists() else None, self.src_dict, self.tgt_dict,
            self.src_bpe, self.bpe,
            tgt_lang_tag=self.tgt_dict.index(f"<lang:{tl}>"),
            src_lang_tag=self.src_dict.index(f"<lang:{sl}>"),
        )
        self.datasets[split] = ds
        return ds

    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch or "mbart_large",
            self.cfg.model,
            vocab_size=len(self.tgt_dict),
            src_vocab_size=len(self.src_dict),
            max_source_positions=self.cfg.dataset.max_source_positions,
            max_target_positions=self.cfg.dataset.max_target_positions,
        )

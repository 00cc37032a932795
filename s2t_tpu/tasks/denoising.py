"""Denoising (BART) pretraining tasks.

(reference: fairseq/tasks/denoising.py:274 and multilingual_denoising.py —
sequence-to-sequence reconstruction of text corrupted with span infilling and
sentence permutation; the multilingual variant concatenates per-language
corpora with temperature upsampling and mBART language tags.)
"""

from __future__ import annotations

from pathlib import Path

from s2t_tpu.config import TrainConfig
from s2t_tpu.data.denoising_dataset import DenoisingDataset
from s2t_tpu.data.dictionary import Dictionary
from s2t_tpu.data.multilingual import MultilingualS2TDataset
from s2t_tpu.inference.generator import SequenceGenerator
from s2t_tpu.registry import register_task
from s2t_tpu.tasks.base import Task


@register_task("denoising")
class DenoisingTask(Task):
    def __init__(self, cfg, dictionary):
        super().__init__(cfg)
        self.dictionary = dictionary
        self.tgt_dict = dictionary
        self.src_dict = dictionary
        self.mask_id = dictionary.add_symbol("<mask>")

    @classmethod
    def setup(cls, cfg: TrainConfig):
        root = Path(cfg.dataset.data)
        return cls(cfg, Dictionary.load(root / "dict.txt"))

    def _noise_kwargs(self):
        t = self.cfg.task_cfg
        return dict(
            mask_ratio=t.get("mask_ratio", 0.3),
            poisson_lambda=t.get("poisson_lambda", 3.5),
            random_ratio=t.get("random_ratio", 0.1),
            insert_ratio=t.get("insert_ratio", 0.0),
            delete_ratio=t.get("delete_ratio", 0.0),
            permute_sentence_ratio=t.get("permute_sentence_ratio", 1.0),
            seed=self.cfg.common.seed,
        )

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        ds = DenoisingDataset(
            root / f"{split}.txt", self.dictionary, **self._noise_kwargs()
        )
        self.datasets[split] = ds
        return ds

    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch or "bart_base", self.cfg.model,
            vocab_size=len(self.dictionary),
            max_source_positions=self.cfg.dataset.max_source_positions,
            max_target_positions=self.cfg.dataset.max_target_positions,
        )

    def build_criterion(self):
        from s2t_tpu.criterions import build_criterion

        return build_criterion(
            self.cfg.criterion or "label_smoothed_cross_entropy",
            self.cfg.criterion_cfg,
        )

    def forward_fn(self):
        def fwd(model, params, batch, deterministic, rngs=None):
            args = (batch["src_tokens"], batch["src_lengths"], batch["prev_tokens"])
            if params is None:
                return model.init(rngs["params"], *args, deterministic=True)
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
        )

    def decode_tokens(self, tokens) -> str:
        return self.dictionary.string(
            tokens, bpe_symbol=self.cfg.generation.post_process
        )


@register_task("multilingual_denoising")
class MultilingualDenoisingTask(DenoisingTask):
    """Per-language corpora at <data>/<lang>/<split>.txt, temperature-
    upsampled, with mBART-style <lang:xx> tags (reference:
    tasks/multilingual_denoising.py)."""

    def __init__(self, cfg, dictionary, langs):
        super().__init__(cfg, dictionary)
        self.langs = langs
        self.lang_tags = {
            l: dictionary.add_symbol(f"<lang:{l}>") for l in langs
        }

    @classmethod
    def setup(cls, cfg: TrainConfig):
        root = Path(cfg.dataset.data)
        d = Dictionary.load(root / "dict.txt")
        langs = cfg.task_cfg.get("langs")
        if langs:
            langs = [l for l in str(langs).split(",") if l]
        else:
            langs = sorted(
                p.name for p in root.iterdir()
                if p.is_dir() and (p / "train.txt").exists()
            )
        return cls(cfg, d, langs)

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        per_lang = [
            DenoisingDataset(
                root / lang / f"{split}.txt", self.dictionary,
                lang_tag=self.lang_tags[lang], **self._noise_kwargs(),
            )
            for lang in self.langs
        ]
        alpha = self.cfg.task_cfg.get("sampling_alpha", 0.7)
        ds = MultilingualS2TDataset(per_lang, alpha=alpha, resample=is_train)
        self.datasets[split] = ds
        return ds

"""Many-to-many multilingual MT.

(reference: fairseq/tasks/translation_multi_simple_epoch.py +
multilingual_translation.py — two regimes:

* shared model: language pairs concatenated with temperature-resampled
  sampling and target-language tags (translation_multi_simple_epoch);
* per-pair models: the multilingual_transformer model keyed by lang pair,
  trained round-robin — every update sees one sub-batch from EVERY pair
  (multilingual_translation.py:299-330 + data/round_robin_zip_datasets.py).

The regime follows the arch: ``multilingual_transformer*`` archs get the
round-robin zip pipeline, anything else gets the shared-model concat.)

Config: ``task_cfg.lang_pairs: ["en-de", "en-fr", ...]``; data files
``{split}.{src}-{tgt}.{src|tgt}``; the shared dict must contain
``<lang:xx>`` symbols for every target language (shared-model regime only).
"""

from __future__ import annotations

from pathlib import Path

from s2t_tpu.data.multilingual import MultilingualS2TDataset, RoundRobinZipDataset
from s2t_tpu.data.text_dataset import TranslationDataset
from s2t_tpu.registry import ARCHS, register_task
from s2t_tpu.tasks.translation import TranslationTask


@register_task("translation_multi_simple_epoch")
@register_task("multilingual_translation")
class MultilingualTranslationTask(TranslationTask):
    @property
    def lang_pairs(self):
        pairs = (self.cfg.task_cfg or {}).get("lang_pairs")
        if not pairs:
            pairs = [f"{self.data_cfg.src_lang}-{self.data_cfg.tgt_lang}"]
        return pairs

    @property
    def per_pair_models(self) -> bool:
        """True when the arch is a per-pair multilingual_transformer."""
        if not self.cfg.arch:
            return False
        import s2t_tpu.models  # noqa: F401 — populate the arch registry

        try:
            model_name, _ = ARCHS.get(self.cfg.arch)
        except KeyError:
            return False
        return model_name == "multilingual_transformer"

    def _pair_dataset(self, split: str, pair: str, tagged: bool):
        root = Path(self.cfg.dataset.data)
        sl, tl = pair.split("-")
        src = root / f"{split}.{sl}-{tl}.{sl}"
        tgt = root / f"{split}.{sl}-{tl}.{tl}"
        if not src.exists():
            return None
        tag = None
        if tagged:
            tag = self.tgt_dict.index(f"<lang:{tl}>")
            if tag == self.tgt_dict.unk():
                # Dictionary.index silently maps OOV to <unk>; conditioning
                # every target on <unk> would train garbage with no error
                raise ValueError(
                    f"dictionary is missing the language tag <lang:{tl}> "
                    "(add it to dict.txt for multilingual training)"
                )
        return TranslationDataset(
            src, tgt if tgt.exists() else None, self.src_dict,
            self.tgt_dict, self.src_bpe, self.bpe, tgt_lang_tag=tag,
        )

    def load_dataset(self, split: str, is_train: bool = False):
        per_pair = self.per_pair_models
        parts = {}
        for pair in self.lang_pairs:
            ds = self._pair_dataset(split, pair, tagged=not per_pair)
            if ds is not None:
                parts[pair] = ds
        assert parts, f"no data for split {split!r} and pairs {self.lang_pairs}"
        if per_pair:
            # per-pair models: one zip row per update carries every pair
            ds = RoundRobinZipDataset(parts)
        else:
            alpha = (self.cfg.task_cfg or {}).get("sampling_alpha", 1.0)
            items = [parts[p] for p in self.lang_pairs if p in parts]
            ds = (
                items[0] if len(items) == 1 else
                MultilingualS2TDataset(items, alpha=alpha, resample=is_train)
            )
        self.datasets[split] = ds
        return ds

    def build_model(self):
        if not self.per_pair_models:
            return super().build_model()
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch, self.cfg.model,
            vocab_size=len(self.tgt_dict),
            src_vocab_size=len(self.src_dict),
            lang_pairs=tuple(self.lang_pairs),
            max_source_positions=self.cfg.dataset.max_source_positions,
            max_target_positions=self.cfg.dataset.max_target_positions,
        )

    def build_criterion(self):
        base = super().build_criterion()
        if not self.per_pair_models:
            return base
        from s2t_tpu.criterions.multilingual import MultilingualCriterion

        return MultilingualCriterion(base)

    @property
    def eval_lang_pair(self):
        """Pair decoded at generation time (reference:
        multilingual_translation.py --source-lang/--target-lang select the
        eval pair; defaults to the first training pair)."""
        if not self.per_pair_models:
            return None
        return (self.cfg.task_cfg or {}).get(
            "eval_lang_pair", self.lang_pairs[0]
        )

    def load_pair_dataset(self, split: str, pair: str):
        """Pair-pure dataset for the generate CLI (per-pair models decode
        one pair; training/validation use the round-robin zip)."""
        ds = self._pair_dataset(split, pair, tagged=False)
        assert ds is not None, f"no data for split {split!r} pair {pair!r}"
        return ds

    def build_generator(self, model, gen_cfg=None):
        if self.per_pair_models and hasattr(model, "pair_view"):
            model = model.pair_view(self.eval_lang_pair)
        return super().build_generator(model, gen_cfg)

    def forward_fn(self):
        if not self.per_pair_models:
            return super().forward_fn()

        def fwd(model, params, batch, deterministic, rngs=None):
            if params is None:  # init mode covers every pair's modules
                return model.init(rngs["params"], batch["pairs"],
                                  deterministic=True)
            return model.apply(
                {"params": params}, batch["pairs"],
                deterministic=deterministic, rngs=rngs,
            )

        return fwd

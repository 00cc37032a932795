"""Many-to-many multilingual MT.

(reference: fairseq/tasks/translation_multi_simple_epoch.py +
multilingual_translation.py — language pairs trained jointly with
temperature-resampled sampling and target-language tags.)

Config: ``task_cfg.lang_pairs: ["en-de", "en-fr", ...]``; data files
``{split}.{src}-{tgt}.{src|tgt}``; the shared dict must contain
``<lang:xx>`` symbols for every target language.
"""

from __future__ import annotations

from pathlib import Path

from s2t_tpu.data.multilingual import MultilingualS2TDataset
from s2t_tpu.data.text_dataset import TranslationDataset
from s2t_tpu.registry import register_task
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

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        parts = []
        for pair in self.lang_pairs:
            sl, tl = pair.split("-")
            src = root / f"{split}.{sl}-{tl}.{sl}"
            tgt = root / f"{split}.{sl}-{tl}.{tl}"
            if not src.exists():
                continue
            tag = self.tgt_dict.index(f"<lang:{tl}>")
            if tag == self.tgt_dict.unk():
                # Dictionary.index silently maps OOV to <unk>; conditioning
                # every target on <unk> would train garbage with no error
                raise ValueError(
                    f"dictionary is missing the language tag <lang:{tl}> "
                    "(add it to dict.txt for multilingual training)"
                )
            parts.append(TranslationDataset(
                src, tgt if tgt.exists() else None, self.src_dict,
                self.tgt_dict, self.src_bpe, self.bpe, tgt_lang_tag=tag,
            ))
        assert parts, f"no data for split {split!r} and pairs {self.lang_pairs}"
        alpha = (self.cfg.task_cfg or {}).get("sampling_alpha", 1.0)
        ds = (
            parts[0] if len(parts) == 1 else
            MultilingualS2TDataset(parts, alpha=alpha, resample=is_train)
        )
        self.datasets[split] = ds
        return ds

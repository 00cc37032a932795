"""Masked LM pretraining task (BERT/RoBERTa style).

(reference: fairseq/tasks/masked_lm.py — token blocks with 15% dynamic
masking: 80% <mask>, 10% random, 10% unchanged; criterion masked_lm.)

TPU twist: masking happens inside the compiled step from the per-step rng
(jittable), not in DataLoader workers.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.config import TrainConfig
from s2t_tpu.data.dictionary import Dictionary
from s2t_tpu.data.text_dataset import MonolingualDataset
from s2t_tpu.registry import register_task
from s2t_tpu.tasks.base import Task


def apply_bert_masking(rng, tokens, mask_id, vocab_size, pad_id=1,
                       mask_prob=0.15, leave_unmasked_prob=0.1,
                       random_token_prob=0.1):
    """(masked_tokens, target_mask) — reference: masked_lm.py dynamic mask."""
    k1, k2, k3 = jax.random.split(rng, 3)
    maskable = tokens != pad_id
    sel = (jax.random.uniform(k1, tokens.shape) < mask_prob) & maskable
    u = jax.random.uniform(k2, tokens.shape)
    use_mask = sel & (u < 1.0 - leave_unmasked_prob - random_token_prob)
    use_rand = sel & (u >= 1.0 - random_token_prob)
    rand_tok = jax.random.randint(k3, tokens.shape, 4, vocab_size)
    out = jnp.where(use_mask, mask_id, tokens)
    out = jnp.where(use_rand, rand_tok, out)
    return out, sel


@register_task("masked_lm")
class MaskedLMTask(Task):
    def __init__(self, cfg, dictionary, block_size: int = 128):
        super().__init__(cfg)
        self.dictionary = dictionary
        self.tgt_dict = dictionary
        self.block_size = block_size
        self.mask_id = dictionary.add_symbol("<mask>")

    @classmethod
    def setup(cls, cfg: TrainConfig):
        root = Path(cfg.dataset.data)
        d = Dictionary.load(root / "dict.txt")
        block = cfg.dataset.max_target_positions or 128
        return cls(cfg, d, block_size=min(block, 512))

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        ds = MonolingualDataset(
            root / f"{split}.txt", self.dictionary, block_size=self.block_size
        )
        self.datasets[split] = ds
        return ds

    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch or "roberta_base", self.cfg.model,
            vocab_size=len(self.dictionary),
            max_positions=self.cfg.dataset.max_target_positions or 512,
        )

    def build_criterion(self):
        from s2t_tpu.criterions import build_criterion

        return build_criterion(self.cfg.criterion or "masked_lm",
                               self.cfg.criterion_cfg)

    def forward_fn(self):
        mask_id = self.mask_id
        vocab = len(self.dictionary)

        def fwd(model, params, batch, deterministic, rngs=None):
            tokens = batch["target"]  # MonolingualDataset collater layout
            if params is None:
                return model.init(rngs["params"], tokens, deterministic=True)
            rng = (
                jax.random.fold_in(rngs["dropout"], 11)
                if rngs is not None else jax.random.PRNGKey(0)
            )
            masked, sel = apply_bert_masking(rng, tokens, mask_id, vocab)
            out = model.apply(
                {"params": params}, masked, deterministic=deterministic,
                rngs=rngs,
            )
            return {**out, "mlm_targets": tokens, "mlm_mask": sel}

        return fwd

    def build_generator(self, model, gen_cfg=None):
        raise NotImplementedError("masked_lm has no generator")

    def decode_tokens(self, tokens) -> str:
        return self.dictionary.string(tokens)


@register_task("cross_lingual_lm")
class CrossLingualLMTask(MaskedLMTask):
    """XLM-style multilingual masked LM (reference: tasks/cross_lingual_lm.py
    — MLM over per-language corpora; the language signal is a <lang:xx>
    token prepended to every block, the token-embedding equivalent of XLM's
    language embeddings).  Data: <data>/<lang>/{split}.txt; temperature
    upsampling via ``task_cfg.sampling_alpha``."""

    def __init__(self, cfg, dictionary, langs, block_size: int = 128):
        super().__init__(cfg, dictionary, block_size)
        self.langs = langs
        self.lang_tags = {l: dictionary.add_symbol(f"<lang:{l}>") for l in langs}

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
        block = min(cfg.dataset.max_target_positions or 128, 512)
        return cls(cfg, d, langs, block_size=block)

    def load_dataset(self, split: str, is_train: bool = False):
        from s2t_tpu.data.multilingual import MultilingualS2TDataset

        root = Path(self.cfg.dataset.data)
        per_lang = []
        for lang in self.langs:
            ds = MonolingualDataset(
                root / lang / f"{split}.txt", self.dictionary,
                block_size=self.block_size - 1,  # room for the lang tag
            )
            tag = self.lang_tags[lang]
            ds.blocks = np.concatenate(
                [np.full((len(ds.blocks), 1), tag, np.int32), ds.blocks],
                axis=1,
            )
            ds.n_frames = np.full(len(ds.blocks), ds.blocks.shape[1], np.int64)
            per_lang.append(ds)
        alpha = self.cfg.task_cfg.get("sampling_alpha", 0.7)
        out = (
            per_lang[0] if len(per_lang) == 1 else
            MultilingualS2TDataset(per_lang, alpha=alpha, resample=is_train)
        )
        self.datasets[split] = out
        return out

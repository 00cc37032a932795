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
                       random_token_prob=0.1, protect=None):
    """(masked_tokens, target_mask) — reference: masked_lm.py dynamic mask.

    ``protect``: optional bool array of positions that must never be masked
    (CLS/SEP markers in the sentence-pair path)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    maskable = tokens != pad_id
    if protect is not None:
        maskable = maskable & ~protect
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


class SentencePairDataset:
    """BERT-style sentence-pair examples for next-sentence prediction
    (reference: fairseq/data/legacy/block_pair_dataset.py): for sentence i,
    B is the actual next sentence or a random one with p=0.5 (decided per
    epoch), laid out as  <cls> A <sep> B <sep>  with segment ids 0/1."""

    def __init__(self, path, dictionary, max_positions: int = 128, seed: int = 1):
        self.dictionary = dictionary
        self.max_positions = max_positions
        self.cls = dictionary.bos()
        self.sep = dictionary.eos()
        self.seed = seed
        self.epoch = 1
        self.sents = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    self.sents.append(
                        dictionary.encode_line(line, append_eos=False)
                    )
        if len(self.sents) < 2:
            raise ValueError("sentence-pair dataset needs >= 2 sentences")
        self.n_frames = np.full(len(self.sents), max_positions, np.int64)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.sents)

    def __getitem__(self, index):
        rng = np.random.default_rng(
            (self.seed * 0x9E3779B1 + self.epoch * 7919 + index) & 0x7FFFFFFF
        )
        a = self.sents[index]
        next_i = (index + 1) % len(self.sents)
        is_next = bool(rng.random() < 0.5)
        if is_next:
            b = self.sents[next_i]
        else:
            j = int(rng.integers(0, len(self.sents)))
            if j == next_i:  # ensure the negative really is random
                j = (j + 1) % len(self.sents)
            b = self.sents[j]
        L = self.max_positions
        # budget: cls + A + sep + B + sep
        budget = L - 3
        la = min(len(a), budget // 2)
        lb = min(len(b), budget - la)
        tokens = np.full(L, self.dictionary.pad(), np.int32)
        segments = np.zeros(L, np.int32)
        pos = 0
        tokens[pos] = self.cls; pos += 1
        tokens[pos:pos + la] = a[:la]; pos += la
        tokens[pos] = self.sep; pos += 1
        seg1_start = pos
        tokens[pos:pos + lb] = b[:lb]; pos += lb
        tokens[pos] = self.sep; pos += 1
        segments[seg1_start:pos] = 1
        return {
            "id": index, "tokens": tokens, "segments": segments,
            "nsp_label": int(is_next),
        }

    def ordered_indices(self, shuffle=True, seed=1, epoch=1):
        if shuffle:
            return np.random.default_rng(seed + epoch).permutation(len(self))
        return np.arange(len(self))

    def collater(self, samples, frame_buckets=None, token_buckets=None,
                 batch_multiple=1, pad_id=1, eos_id=2):
        from s2t_tpu.data.batching import round_up

        B_real = len(samples)
        B = round_up(B_real, batch_multiple)
        L = self.max_positions
        tokens = np.full((B, L), pad_id, np.int32)
        segments = np.zeros((B, L), np.int32)
        labels = np.zeros(B, np.int32)
        for i, s in enumerate(samples):
            tokens[i] = s["tokens"]
            segments[i] = s["segments"]
            labels[i] = s["nsp_label"]
        ntokens = int((tokens != pad_id).sum())
        return {
            "target": tokens, "segments": segments, "nsp_label": labels,
            "ntokens": float(ntokens), "nsentences": B_real,
            "ids": np.asarray([s["id"] for s in samples]),
        }


@register_task("legacy_masked_lm")
class LegacyMaskedLMTask(MaskedLMTask):
    """BERT pretraining: sentence-pair MLM + next-sentence prediction
    (reference: tasks/legacy_masked_lm.py + data/legacy/
    block_pair_dataset.py + criterions/legacy_masked_lm.py).  The default
    arch is ``bert_base`` (segment embeddings + 2-way classification
    head)."""

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        ds = SentencePairDataset(
            root / f"{split}.txt", self.dictionary,
            max_positions=self.block_size, seed=self.cfg.common.seed,
        )
        self.datasets[split] = ds
        return ds

    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch or "bert_base", self.cfg.model,
            vocab_size=len(self.dictionary),
            max_positions=self.cfg.dataset.max_target_positions or 512,
        )

    def build_criterion(self):
        from s2t_tpu.criterions import build_criterion

        return build_criterion(self.cfg.criterion or "legacy_masked_lm",
                               self.cfg.criterion_cfg)

    def forward_fn(self):
        mask_id = self.mask_id
        vocab = len(self.dictionary)
        cls_id, sep_id = self.dictionary.bos(), self.dictionary.eos()

        def fwd(model, params, batch, deterministic, rngs=None):
            tokens = batch["target"]
            segments = batch.get("segments")
            if params is None:
                return model.init(rngs["params"], tokens, deterministic=True,
                                  classification=True, segments=segments)
            rng = (
                jax.random.fold_in(rngs["dropout"], 11)
                if rngs is not None else jax.random.PRNGKey(0)
            )
            protect = (tokens == cls_id) | (tokens == sep_id)
            masked, sel = apply_bert_masking(
                rng, tokens, mask_id, vocab, protect=protect
            )
            out = model.apply(
                {"params": params}, masked, deterministic=deterministic,
                classification=True, segments=segments, rngs=rngs,
            )
            return {**out, "mlm_targets": tokens, "mlm_mask": sel}

        return fwd

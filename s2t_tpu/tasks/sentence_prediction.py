"""Sentence prediction (classification / regression) — RoBERTa fine-tuning.

(reference: fairseq/tasks/sentence_prediction.py + criterions/
sentence_prediction.py — GLUE-style single/pair sentence classification on
top of a pretrained masked-LM encoder.)

Data: ``{split}.tsv`` with "text<TAB>label" rows + dict.txt + labels.txt.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.config import TrainConfig
from s2t_tpu.data.batching import round_up
from s2t_tpu.data.dictionary import Dictionary
from s2t_tpu.registry import register_criterion, register_task
from s2t_tpu.tasks.base import Task


class SentenceDataset:
    def __init__(self, path, dictionary, labels: List[str], max_len: int = 128):
        self.dictionary = dictionary
        self.label_map = {l: i for i, l in enumerate(labels)}
        self.texts: List[np.ndarray] = []
        self.labels: List[int] = []
        for ln in Path(path).read_text(encoding="utf-8").strip().split("\n"):
            text, label = ln.rsplit("\t", 1)
            enc = dictionary.encode_line(text, append_eos=True)[:max_len]
            self.texts.append(enc)
            self.labels.append(self.label_map[label.strip()])
        self.n_frames = np.asarray([len(t) for t in self.texts], np.int64)

    def __len__(self):
        return len(self.texts)

    def __getitem__(self, i):
        return {"id": i, "tokens": self.texts[i], "label": self.labels[i]}

    def ordered_indices(self, shuffle=True, seed=1, epoch=1):
        if shuffle:
            return np.random.default_rng(seed + epoch).permutation(len(self))
        return np.arange(len(self))

    def collater(self, samples, frame_buckets=None, token_buckets=None,
                 batch_multiple=1, pad_id=1, **kw):
        B_real = len(samples)
        B = round_up(B_real, batch_multiple)
        L = max(len(s["tokens"]) for s in samples)
        toks = np.full((B, L), pad_id, np.int32)
        labels = np.zeros((B,), np.int32)
        valid = np.zeros((B,), np.float32)
        for i, s in enumerate(samples):
            toks[i, : len(s["tokens"])] = s["tokens"]
            labels[i] = s["label"]
            valid[i] = 1.0
        return {
            "tokens": toks, "labels": labels, "row_valid": valid,
            "ids": np.asarray([s["id"] for s in samples] + [-1] * (B - B_real)),
            "nsentences": B_real, "ntokens": float(B_real),
        }


@register_criterion("sentence_prediction")
class SentencePredictionCriterion:
    @dataclass
    class Config:
        pad_id: int = 1

    def __init__(self, cfg):
        self.cfg = cfg

    def __call__(self, model_out, batch):
        logits = model_out["cls_logits"].astype(jnp.float32)
        labels = batch["labels"]
        valid = batch["row_valid"]
        lp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(lp, labels[:, None], -1)[:, 0] * valid
        loss = jnp.sum(nll)
        sample_size = jnp.maximum(jnp.sum(valid), 1.0)
        pred = jnp.argmax(logits, -1)
        correct = jnp.sum((pred == labels).astype(jnp.float32) * valid)
        return loss, sample_size, {
            "loss": loss, "nll_loss": loss, "ntokens": sample_size,
            "nsentences": sample_size, "n_correct": correct,
            "total": sample_size,
        }


@register_task("sentence_prediction")
class SentencePredictionTask(Task):
    def __init__(self, cfg, dictionary, labels):
        super().__init__(cfg)
        self.dictionary = dictionary
        self.tgt_dict = dictionary
        self.labels = labels

    @classmethod
    def setup(cls, cfg: TrainConfig):
        root = Path(cfg.dataset.data)
        d = Dictionary.load(root / "dict.txt")
        labels = (root / "labels.txt").read_text().split()
        return cls(cfg, d, labels)

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        ds = SentenceDataset(
            root / f"{split}.tsv", self.dictionary, self.labels,
            max_len=self.cfg.dataset.max_target_positions or 128,
        )
        self.datasets[split] = ds
        return ds

    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch or "roberta_base", self.cfg.model,
            vocab_size=len(self.dictionary), num_classes=len(self.labels),
            max_positions=self.cfg.dataset.max_target_positions or 512,
        )

    def build_criterion(self):
        from s2t_tpu.criterions import build_criterion

        return build_criterion(self.cfg.criterion or "sentence_prediction",
                               self.cfg.criterion_cfg)

    def forward_fn(self):
        def fwd(model, params, batch, deterministic, rngs=None):
            if params is None:
                return model.init(rngs["params"], batch["tokens"],
                                  deterministic=True, classification=True)
            return model.apply(
                {"params": params}, batch["tokens"],
                deterministic=deterministic, classification=True, rngs=rngs,
            )

        return fwd

    def build_generator(self, model, gen_cfg=None):
        raise NotImplementedError

    def decode_tokens(self, tokens) -> str:
        return self.dictionary.string(tokens)


class RankingDataset:
    """Per-row candidate set: ``cand0<TAB>cand1<TAB>...<TAB>gold_index``
    (reference: tasks/sentence_ranking.py input0..inputN files)."""

    def __init__(self, path, dictionary, max_len: int = 128):
        self.dictionary = dictionary
        self.rows: List[List[np.ndarray]] = []
        self.gold: List[int] = []
        for ln in Path(path).read_text(encoding="utf-8").strip().split("\n"):
            parts = ln.split("\t")
            cands, gold = parts[:-1], int(parts[-1])
            self.rows.append([
                dictionary.encode_line(c, append_eos=True)[:max_len]
                for c in cands
            ])
            self.gold.append(gold)
        self.n_cand = len(self.rows[0])
        assert all(len(r) == self.n_cand for r in self.rows)
        self.n_frames = np.asarray(
            [max(len(c) for c in r) for r in self.rows], np.int64
        )

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        return {"id": i, "cands": self.rows[i], "gold": self.gold[i]}

    def ordered_indices(self, shuffle=True, seed=1, epoch=1):
        if shuffle:
            return np.random.default_rng(seed + epoch).permutation(len(self))
        return np.arange(len(self))

    def collater(self, samples, frame_buckets=None, token_buckets=None,
                 batch_multiple=1, pad_id=1, **kw):
        B_real = len(samples)
        B = round_up(B_real, batch_multiple)
        N = self.n_cand
        L = max(len(c) for s in samples for c in s["cands"])
        toks = np.full((B, N, L), pad_id, np.int32)
        gold = np.zeros((B,), np.int32)
        valid = np.zeros((B,), np.float32)
        for i, s in enumerate(samples):
            for n, c in enumerate(s["cands"]):
                toks[i, n, : len(c)] = c
            gold[i] = s["gold"]
            valid[i] = 1.0
        return {
            "cand_tokens": toks, "labels": gold, "row_valid": valid,
            "ids": np.asarray([s["id"] for s in samples] + [-1] * (B - B_real)),
            "nsentences": B_real, "ntokens": float(B_real),
        }


@register_criterion("sentence_ranking")
class SentenceRankingCriterion:
    """CE over per-candidate scores (reference:
    criterions/sentence_ranking.py — the gold candidate must outscore the
    alternatives)."""

    @dataclass
    class Config:
        pad_id: int = 1

    def __init__(self, cfg):
        self.cfg = cfg

    def __call__(self, model_out, batch):
        scores = model_out["rank_scores"].astype(jnp.float32)  # (B, N)
        labels = batch["labels"]
        valid = batch["row_valid"]
        lp = jax.nn.log_softmax(scores, -1)
        nll = -jnp.take_along_axis(lp, labels[:, None], -1)[:, 0] * valid
        loss = jnp.sum(nll)
        sample_size = jnp.maximum(jnp.sum(valid), 1.0)
        pred = jnp.argmax(scores, -1)
        correct = jnp.sum((pred == labels).astype(jnp.float32) * valid)
        return loss, sample_size, {
            "loss": loss, "nll_loss": loss, "ntokens": sample_size,
            "nsentences": sample_size, "n_correct": correct,
            "total": sample_size,
        }


@register_task("sentence_ranking")
class SentenceRankingTask(Task):
    """Multiple-choice ranking (reference: tasks/sentence_ranking.py —
    e.g. RACE/WSC fine-tuning: each candidate is scored by a 1-way
    classification head, trained so the gold candidate ranks first)."""

    def __init__(self, cfg, dictionary):
        super().__init__(cfg)
        self.dictionary = dictionary
        self.tgt_dict = dictionary

    @classmethod
    def setup(cls, cfg: TrainConfig):
        root = Path(cfg.dataset.data)
        return cls(cfg, Dictionary.load(root / "dict.txt"))

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        ds = RankingDataset(
            root / f"{split}.tsv", self.dictionary,
            max_len=self.cfg.dataset.max_target_positions or 128,
        )
        self.datasets[split] = ds
        return ds

    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch or "roberta_base", self.cfg.model,
            vocab_size=len(self.dictionary), num_classes=1,
            max_positions=self.cfg.dataset.max_target_positions or 512,
        )

    def build_criterion(self):
        from s2t_tpu.criterions import build_criterion

        return build_criterion(self.cfg.criterion or "sentence_ranking",
                               self.cfg.criterion_cfg)

    def forward_fn(self):
        def fwd(model, params, batch, deterministic, rngs=None):
            toks = batch["cand_tokens"]  # (B, N, L)
            B, N, L = toks.shape
            flat = toks.reshape(B * N, L)
            if params is None:
                return model.init(rngs["params"], flat,
                                  deterministic=True, classification=True)
            out = model.apply(
                {"params": params}, flat, deterministic=deterministic,
                classification=True, rngs=rngs,
            )
            out["rank_scores"] = out["cls_logits"].reshape(B, N)
            return out

        return fwd

    def build_generator(self, model, gen_cfg=None):
        raise NotImplementedError

    def decode_tokens(self, tokens) -> str:
        return self.dictionary.string(tokens)

"""Language modeling task (reference: fairseq/tasks/language_modeling.py:96 —
token-block LM over monolingual text, used by eval_lm and decoder fusion)."""

from __future__ import annotations

from pathlib import Path

from s2t_tpu.config import TrainConfig
from s2t_tpu.data.dictionary import Dictionary
from s2t_tpu.data.text_dataset import MonolingualDataset
from s2t_tpu.data.tokenizer import build_tokenizer
from s2t_tpu.registry import register_task
from s2t_tpu.tasks.base import Task


@register_task("language_modeling")
class LanguageModelingTask(Task):
    def __init__(self, cfg, dictionary, bpe=None, block_size: int = 128):
        super().__init__(cfg)
        self.dictionary = dictionary
        self.tgt_dict = dictionary
        self.bpe = bpe
        self.block_size = block_size

    @classmethod
    def setup(cls, cfg: TrainConfig):
        root = Path(cfg.dataset.data)
        dictionary = Dictionary.load(root / "dict.txt")
        bpe = None
        tok_cfg = cfg.task_cfg.get("bpe_tokenizer")
        if tok_cfg:
            bpe = build_tokenizer(tok_cfg)
        # block length defaults to the model's position budget so the two
        # can't drift apart (the reference couples them via tokens_per_sample)
        block = (
            cfg.task_cfg.get("tokens_per_sample")
            or cfg.dataset.max_target_positions
            or 128
        )
        return cls(cfg, dictionary, bpe, block)

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        path = root / f"{split}.txt"
        ds = MonolingualDataset(path, self.dictionary, self.bpe, self.block_size)
        self.datasets[split] = ds
        return ds

    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch or "transformer_lm",
            self.cfg.model,
            vocab_size=len(self.dictionary),
            max_target_positions=self.cfg.dataset.max_target_positions,
        )

    def forward_fn(self):
        def fwd(model, params, batch, deterministic, rngs=None):
            kw = {}
            if getattr(model.cfg, "adaptive_softmax_cutoff", ()) and \
                    "target" in batch:
                kw["targets"] = batch["target"]  # exact-path adaptive loss
            if params is None:  # init mode
                return model.init(
                    rngs["params"], batch["prev_tokens"], deterministic=True,
                    **kw,
                )
            return model.apply(
                {"params": params},
                batch["prev_tokens"],
                deterministic=deterministic,
                rngs=rngs,
                **kw,
            )

        return fwd

    def decode_tokens(self, tokens) -> str:
        return self.dictionary.string(tokens)

"""Task base class: dataset/model/criterion/generator construction + the
batch-iterator pipeline.

(reference: fairseq/tasks/fairseq_task.py:211-515 — get_batch_iterator =
filter-by-size → batch_by_size → EpochBatchIterator; build_model/criterion/
generator; train_step/valid_step hooks.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from s2t_tpu.config import TrainConfig
from s2t_tpu.data.batching import batch_by_size, filter_by_size, make_buckets
from s2t_tpu.data.iterators import EpochBatchIterator
from s2t_tpu.registry import TASKS


def setup_task(cfg: TrainConfig) -> "Task":
    cls = TASKS.get(cfg.task)
    return cls.setup(cfg)


class Task:
    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.datasets: Dict[str, Any] = {}

    @classmethod
    def setup(cls, cfg: TrainConfig) -> "Task":
        return cls(cfg)

    # -- to be overridden ------------------------------------------------------
    def load_dataset(self, split: str, is_train: bool = False):
        raise NotImplementedError

    def build_model(self):
        raise NotImplementedError

    def build_criterion(self):
        from s2t_tpu.criterions import build_criterion

        return build_criterion(self.cfg.criterion, self.cfg.criterion_cfg)

    def forward_fn(self):
        """Forward adapter used by the Trainer (applies on-device feature
        transforms before the model where relevant)."""
        from s2t_tpu.trainer import s2t_forward

        return s2t_forward

    # -- shared pipeline ---------------------------------------------------------
    def get_batch_iterator(
        self,
        dataset,
        max_tokens: Optional[int] = None,
        max_sentences: Optional[int] = None,
        seed: int = 1,
        shuffle: bool = True,
        num_shards: int = 1,
        shard_id: int = 0,
        buffer_size: int = 4,
        batch_size_multiple: Optional[int] = None,
    ) -> EpochBatchIterator:
        import math as _math

        ds_cfg = self.cfg.dataset
        max_tokens = max_tokens or ds_cfg.max_tokens
        # batches must divide over the data-parallel mesh axis: pad the batch
        # dim to lcm(required multiple, mesh data size); extra rows are dummy
        # (zero-length, all-pad) and contribute nothing to any loss
        if batch_size_multiple is None:
            import jax

            batch_size_multiple = jax.device_count()
        multiple = _math.lcm(ds_cfg.required_batch_size_multiple, batch_size_multiple)
        # datasets whose n_frames are NOT 10ms-frame counts (raw-audio
        # sample counts) declare their own cap; everything else uses the
        # config's frame semantics
        frame_cap = getattr(dataset, "frame_cap", None) or ds_cfg.max_source_positions
        frame_buckets = make_buckets(
            frame_cap, ds_cfg.num_buckets, sizes=dataset.n_frames
        )
        token_buckets = make_buckets(
            ds_cfg.max_target_positions, max(ds_cfg.num_buckets // 2, 4), min_val=8,
            sizes=getattr(dataset, "n_tokens", None),
        )

        keep = filter_by_size(
            dataset.n_frames,
            # target-length filtering when the dataset can provide lengths
            # cheaply (pre-encoded targets); None skips the token filter
            getattr(dataset, "n_tokens", None),
            max_frames=frame_cap,
            max_tokens=ds_cfg.max_target_positions,
        )

        def batches_fn(epoch: int):
            order = dataset.ordered_indices(shuffle=shuffle, seed=seed, epoch=epoch)
            keep_set = np.zeros(len(dataset), dtype=bool)
            keep_set[keep] = True
            order = order[keep_set[order]]
            return batch_by_size(
                order,
                dataset.n_frames,
                max_tokens=max_tokens,
                max_sentences=max_sentences or ds_cfg.batch_size,
                frame_buckets=frame_buckets,
                required_batch_size_multiple=multiple,
            )

        def collate(samples):
            return dataset.collater(
                samples,
                frame_buckets=frame_buckets,
                token_buckets=token_buckets,
                batch_multiple=multiple,
            )

        return EpochBatchIterator(
            dataset, batches_fn, collate, seed=seed,
            num_shards=num_shards, shard_id=shard_id, buffer_size=buffer_size,
            shuffle_batches=shuffle,
        )

"""wav2vec 2.0 pretraining task.

(reference: fairseq/tasks/audio_pretraining.py:91 — loads FileAudioDataset
manifests ({split}.tsv under the data dir), builds the wav2vec model and
criterion; no dictionaries needed for pure pretraining.)
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from s2t_tpu.config import TrainConfig
from s2t_tpu.data.raw_audio_dataset import RawAudioDataset
from s2t_tpu.registry import register_task
from s2t_tpu.tasks.base import Task


@register_task("audio_pretraining")
class AudioPretrainingTask(Task):
    # reference default: crop training utterances to 250k raw samples
    # (~15.6 s at 16 kHz; fairseq/tasks/audio_pretraining.py max_sample_size)
    DEFAULT_MAX_SAMPLE_SIZE = 250_000

    def load_dataset(self, split: str, is_train: bool = False):
        root = Path(self.cfg.dataset.data)
        model_cfg = self.cfg.model if isinstance(self.cfg.model, dict) else {}
        # dataset.max_source_positions keeps its framework-wide 10ms-frame
        # semantics; raw-sample cropping/filtering uses task_cfg
        # max_sample_size, which RawAudioDataset also exposes as frame_cap
        # so the batch iterator filters and buckets on the raw-sample scale.
        max_samples = int(
            self.cfg.task_cfg.get(
                "max_sample_size", self.DEFAULT_MAX_SAMPLE_SIZE
            )
        )
        ds = RawAudioDataset(
            root / f"{split}.tsv",
            max_sample_size=max_samples,
            normalize=bool(model_cfg.get("normalize", False)),
        )
        self.datasets[split] = ds
        return ds

    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(self.cfg.arch or "wav2vec2_base", self.cfg.model)

    def build_criterion(self):
        from s2t_tpu.criterions import build_criterion

        name = self.cfg.criterion or "wav2vec"
        return build_criterion(name, self.cfg.criterion_cfg)

    def forward_fn(self):
        def fwd(model, params, batch, deterministic, rngs=None):
            args = (batch["source"], batch["lengths"])
            if params is None:  # init mode: needs a dropout rng for masking
                init_rngs = {"params": rngs["params"], "dropout": rngs["params"]}
                return model.init(init_rngs, *args, deterministic=True)
            # gumbel temperature annealed by update count
            # (reference: latent_temp (start, end, decay), wav2vec2.py:178;
            # wav2vec v1 names the same triple vq_temp, wav2vec.py:152)
            t0, t1, decay = getattr(
                model.cfg, "latent_temp", None
            ) or model.cfg.vq_temp
            step = batch.get("_step", jnp.zeros((), jnp.int32))
            temp = jnp.maximum(t0 * decay ** step.astype(jnp.float32), t1)
            if rngs is None:
                # validation still masks + samples negatives: fixed rng
                rngs = {"dropout": jax.random.PRNGKey(0)}
            return model.apply(
                {"params": params}, *args, deterministic=deterministic,
                temp=temp, rngs=rngs,
            )

        return fwd

    def build_generator(self, model, gen_cfg=None):
        raise NotImplementedError("audio_pretraining has no generator")

    def decode_tokens(self, tokens) -> str:
        raise NotImplementedError

"""Round-robin multilingual criterion: sum a base criterion over the
per-pair sub-batches of a RoundRobinZipDataset batch.

(reference: fairseq/tasks/multilingual_translation.py:299-330 — train_step
loops the lang pairs, accumulating loss/sample_size and keeping per-pair
logging outputs keyed ``{key}:{lang_pair}``. Here the loop is traced into
the one jitted step, so all pairs' losses come out of a single graph.)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp


class MultilingualCriterion:
    """Wraps a per-pair criterion; consumes {"pairs": {pair: out}} model
    output and {"pairs": {pair: batch}} zip batches."""

    def __init__(self, base):
        self.base = base

    def __getattr__(self, name):
        # config introspection (cfg, pad_id, ...) passes through
        return getattr(self.base, name)

    def __call__(
        self, model_out: Dict[str, Any], batch: Dict[str, Any]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        total = jnp.asarray(0.0, jnp.float32)
        sample_size = jnp.asarray(0.0, jnp.float32)
        logs: Dict[str, jnp.ndarray] = {}
        summed: Dict[str, jnp.ndarray] = {}
        for pair, out in model_out["pairs"].items():
            # base criteria return SUMMED loss; the trainer normalises by
            # the global sample size after accumulation (trainer.py:339)
            loss, ss, pair_logs = self.base(out, batch["pairs"][pair])
            total = total + loss
            sample_size = sample_size + ss
            for k, v in pair_logs.items():
                logs[f"{pair}:{k}"] = v
                summed[k] = summed.get(k, 0.0) + v
        # aggregate view mirrors the single-pair log keys so the trainer's
        # meters/valid-metric plumbing work unchanged
        for k, v in summed.items():
            logs[k] = v
        return total, sample_size, logs

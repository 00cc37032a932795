"""Checkpointing: save/resume, best-k rotation, averaging, component transplant.

(reference: fairseq/checkpoint_utils.py:29-770 — checkpoint_best/last tracking,
keep-last-epochs / keep-best-checkpoints rotation, n-best averaging
(scripts/average_checkpoints.py:114), and load_pretrained_component_from_model
(:676) used by SATE/dual pretraining.)

Format: msgpack of the numpy-ified pytree + a json sidecar of metadata.
Async saves run on a daemon thread (reference: --write-checkpoints-asynchronously).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_pytree(path: str | Path, tree: Any) -> None:
    data = serialization.msgpack_serialize(_to_host(tree))
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_pytree(path: str | Path) -> Any:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


class CheckpointManager:
    """Rotation + best-k tracking (reference: checkpoint_utils.save_checkpoint)."""

    def __init__(
        self,
        save_dir: str | Path,
        keep_last_epochs: int = -1,
        keep_interval_updates: int = -1,
        keep_best_checkpoints: int = -1,
        best_metric: str = "loss",
        maximize_best: bool = False,
        async_save: bool = False,
    ):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.keep_last_epochs = keep_last_epochs
        self.keep_interval_updates = keep_interval_updates
        self.keep_best_checkpoints = keep_best_checkpoints
        self.best_metric = best_metric
        self.maximize_best = maximize_best
        self.async_save = async_save
        self._best: Optional[float] = None
        self._threads: List[threading.Thread] = []

    # -- helpers -------------------------------------------------------------
    def _write(self, name: str, tree: Any, meta: Dict[str, Any]):
        path = self.save_dir / name

        def do():
            save_pytree(path, tree)
            with open(str(path) + ".json", "w") as f:
                json.dump(meta, f)

        if self.async_save:
            t = threading.Thread(target=do, daemon=True)
            t.start()
            self._threads.append(t)
        else:
            do()

    def wait(self):
        for t in self._threads:
            t.join()
        self._threads.clear()

    def _is_better(self, val: float) -> bool:
        if self._best is None:
            return True
        return val > self._best if self.maximize_best else val < self._best

    # -- public API ------------------------------------------------------------
    def save(
        self,
        tree: Any,
        step: int,
        epoch: int,
        val_metric: Optional[float] = None,
        end_of_epoch: bool = True,
        extra_meta: Optional[Dict[str, Any]] = None,
    ) -> None:
        """``extra_meta`` (e.g. the epoch iterator state for mid-epoch resume,
        reference: trainer.py state_dict includes epoch_itr) is merged into
        the json sidecar and comes back through ``load_checkpoint``."""
        tree = _to_host(tree)
        meta = {
            "step": step,
            "epoch": epoch,
            "val_metric": val_metric,
            "best_metric_name": self.best_metric,
        }
        if extra_meta:
            meta.update(extra_meta)
        if end_of_epoch:
            self._write(f"checkpoint{epoch}.pt", tree, meta)
        else:
            self._write(f"checkpoint_{epoch}_{step}.pt", tree, meta)
        self._write("checkpoint_last.pt", tree, meta)
        if val_metric is not None:
            if self._is_better(val_metric):
                self._best = val_metric
                self._write("checkpoint_best.pt", tree, meta)
            if self.keep_best_checkpoints > 0:
                self._write(
                    f"checkpoint.best_{self.best_metric}_{val_metric:.4f}_{step}.pt",
                    tree,
                    meta,
                )
        self.wait()
        self._rotate()

    def _rotate(self):
        if self.keep_last_epochs > 0:
            ckpts = sorted(
                self.save_dir.glob("checkpoint[0-9]*.pt"),
                key=lambda p: int(re.match(r"checkpoint(\d+)\.pt", p.name).group(1))
                if re.match(r"checkpoint(\d+)\.pt", p.name)
                else -1,
            )
            ckpts = [p for p in ckpts if re.match(r"checkpoint\d+\.pt$", p.name)]
            for p in ckpts[: -self.keep_last_epochs]:
                p.unlink(missing_ok=True)
                Path(str(p) + ".json").unlink(missing_ok=True)
        if self.keep_interval_updates > 0:
            ckpts = sorted(
                self.save_dir.glob("checkpoint_*_*.pt"),
                key=lambda p: int(p.stem.split("_")[-1]),
            )
            for p in ckpts[: -self.keep_interval_updates]:
                p.unlink(missing_ok=True)
                Path(str(p) + ".json").unlink(missing_ok=True)
        if self.keep_best_checkpoints > 0:
            ckpts = list(self.save_dir.glob(f"checkpoint.best_{self.best_metric}_*.pt"))

            def score(p):
                m = re.search(r"_(-?[\d.]+)_\d+\.pt$", p.name)
                return float(m.group(1)) if m else 0.0

            ckpts.sort(key=score, reverse=self.maximize_best)
            for p in ckpts[self.keep_best_checkpoints :]:
                p.unlink(missing_ok=True)
                Path(str(p) + ".json").unlink(missing_ok=True)

    def best_checkpoints(self, n: int) -> List[Path]:
        ckpts = list(self.save_dir.glob(f"checkpoint.best_{self.best_metric}_*.pt"))

        def score(p):
            m = re.search(r"_(-?[\d.]+)_\d+\.pt$", p.name)
            return float(m.group(1)) if m else 0.0

        ckpts.sort(key=score, reverse=self.maximize_best)
        return ckpts[:n]


def load_checkpoint(path: str | Path):
    """Returns (pytree, meta_dict)."""
    tree = load_pytree(path)
    meta_path = str(path) + ".json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta


def average_checkpoints(paths: List[str | Path]) -> Any:
    """Uniform parameter averaging (reference: scripts/average_checkpoints.py:114
    — the avg-10-best decode-time trick in every recipe)."""
    assert paths, "no checkpoints to average"
    acc = None
    for p in paths:
        tree, _ = load_checkpoint(p)
        params = tree["params"] if isinstance(tree, dict) and "params" in tree else tree
        if acc is None:
            acc = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        else:
            acc = jax.tree.map(lambda a, x: a + np.asarray(x, np.float64), acc, params)
    n = len(paths)
    return jax.tree.map(lambda a: (a / n).astype(np.float32), acc)


def transplant_component(
    target_params: Dict[str, Any],
    source_params: Dict[str, Any],
    component: str,
    strict: bool = True,
    source_component: str = None,
) -> Dict[str, Any]:
    """Copy ``component`` subtree (e.g. "encoder", "decoder", "encoder/acoustic")
    from a source param tree into a copy of ``target_params``.

    The mechanism behind SATE/dual pretrained init and
    --load-pretrained-{encoder,decoder}-from (reference:
    checkpoint_utils.load_pretrained_component_from_model:676-756).
    Raises KeyError if shapes mismatch or the path is missing.

    ``source_component`` names the subtree in the source when it differs
    from the target path (SATE: source "encoder" → target
    "encoder/acoustic"; reference: s2t_sate.py:268-296
    --load-pretrained-acoustic-encoder-from).

    ``strict=False`` tolerates *extra* keys in the source (the reference's
    remove_pretraining_modules flow: a wav2vec2 pretraining checkpoint carries
    quantizer/final_proj subtrees the fine-tuning model lacks) — only keys
    present in the target are copied, and every target key must exist in the
    source with a matching shape.
    """
    import copy

    out = copy.deepcopy(target_params)
    parts = component.split("/")
    src_parts = (source_component or component).split("/")

    def get_node(tree, parts):
        node = tree
        for p in parts:
            if p not in node:
                raise KeyError(f"component path {component!r} missing {p!r}")
            node = node[p]
        return node

    src = get_node(source_params, src_parts)
    dst_parent = out
    for p in parts[:-1]:
        dst_parent = dst_parent[p]
    tgt = dst_parent[parts[-1]]

    def check(a, b, path=""):
        # a = target subtree, b = source subtree
        if isinstance(a, dict):
            missing = set(a) - set(b)
            extra = set(b) - set(a)
            if missing or (extra and strict):
                raise KeyError(
                    f"component {component} structure mismatch at {path}: "
                    f"{sorted(a)} vs {sorted(b)}"
                )
            for k in a:
                check(a[k], b[k], path + "/" + k)
        else:
            if np.shape(a) != np.shape(b):
                raise KeyError(
                    f"shape mismatch at {component}{path}: {np.shape(a)} vs {np.shape(b)}"
                )

    def take(a, b):
        if isinstance(a, dict):
            return {k: take(a[k], b[k]) for k in a}
        return b

    check(tgt, src)
    dst_parent[parts[-1]] = take(tgt, src) if not strict else jax.tree.map(
        lambda x: x, src
    )
    return out

"""Plugin registries for tasks / models / criterions / optimizers / lr schedules.

A single generic registry replaces the reference's three overlapping systems
(fairseq/registry.py:13-100, fairseq/tasks/__init__.py, fairseq/models/__init__.py).

Each registry maps a string name to a class (or factory).  Model architectures
("arch presets") are plain functions that return a fully-populated model config —
the functional analogue of fairseq's ``register_model_architecture`` defaults
mutators (reference: s2t_transformer.py:2256-2470).
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    """A named string→object registry with decorator-style registration."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Any] = {}

    def register(self, name: str, obj: Any | None = None):
        if obj is not None:
            self._register(name, obj)
            return obj

        def deco(o):
            self._register(name, o)
            return o

        return deco

    def _register(self, name: str, obj: Any):
        if name in self._entries and self._entries[name] is not obj:
            raise ValueError(f"duplicate {self.kind} registration: {name!r}")
        self._entries[name] = obj

    def get(self, name: str) -> Any:
        if name not in self._entries:
            known = ", ".join(sorted(self._entries))
            raise KeyError(f"unknown {self.kind} {name!r}; known: {known}")
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def keys(self):
        return sorted(self._entries)


TASKS = Registry("task")
MODELS = Registry("model")
ARCHS = Registry("model architecture")  # name -> (model_name, config factory)
CRITERIONS = Registry("criterion")
OPTIMIZERS = Registry("optimizer")
LR_SCHEDULERS = Registry("lr scheduler")
TOKENIZERS = Registry("tokenizer")
FEATURE_TRANSFORMS = Registry("feature transform")
SCORERS = Registry("scorer")
SEARCHES = Registry("search strategy")


def register_task(name: str):
    return TASKS.register(name)


def register_model(name: str):
    return MODELS.register(name)


def register_model_architecture(model_name: str, arch_name: str):
    """Register an arch preset: a zero-arg (or cfg->cfg) function returning the
    model config for this named architecture."""

    def deco(fn: Callable):
        ARCHS.register(arch_name, (model_name, fn))
        return fn

    return deco


def register_criterion(name: str):
    return CRITERIONS.register(name)


def register_optimizer(name: str):
    return OPTIMIZERS.register(name)


def register_lr_scheduler(name: str):
    return LR_SCHEDULERS.register(name)


def register_tokenizer(name: str):
    return TOKENIZERS.register(name)


def register_feature_transform(name: str):
    return FEATURE_TRANSFORMS.register(name)


def register_scorer(name: str):
    return SCORERS.register(name)


def register_search(name: str):
    return SEARCHES.register(name)

"""Model construction from arch name + config-dict overrides."""

from __future__ import annotations

from dataclasses import fields
from typing import Any, Dict

from s2t_tpu.registry import ARCHS, MODELS


def build_model(arch: str, overrides: Dict[str, Any] | None = None, **ctx):
    """Build a model from a registered architecture preset.

    ``ctx`` carries task-provided values (vocab sizes, feature dims) applied
    after the preset; ``overrides`` is the user's model config section.
    The functional analogue of fairseq's parse_args_and_arch + build_model
    (reference: fairseq/options.py, models/__init__.py).
    """
    model_name, preset = ARCHS.get(arch)
    model_cls = MODELS.get(model_name)
    cfg = preset()
    known = {f.name for f in fields(cfg)}
    merged = {**(overrides or {}), **ctx}
    unknown = set(merged) - known
    if unknown:
        raise ValueError(f"unknown model config keys for {arch}: {sorted(unknown)}")
    cfg = cfg.replace(**merged) if hasattr(cfg, "replace") else cfg
    return model_cls(cfg=cfg)

"""Model construction from arch name + config-dict overrides."""

from __future__ import annotations

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
    merged = {**(overrides or {}), **ctx}
    # lists from YAML -> tuples (config fields are hashable tuples)
    merged = {k: tuple(v) if isinstance(v, list) else v for k, v in merged.items()}
    try:
        cfg = preset(**merged)
    except TypeError as e:
        raise ValueError(f"unknown model config key for arch {arch!r}: {e}") from e
    return model_cls(cfg=cfg)

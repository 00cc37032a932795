from __future__ import annotations

from typing import Any, Dict

from s2t_tpu.config import from_dict
from s2t_tpu.registry import CRITERIONS


def build_criterion(name: str, cfg_dict: Dict[str, Any] | None = None, **ctx):
    cls = CRITERIONS.get(name)
    cfg = from_dict(cls.Config, {**(cfg_dict or {}), **ctx})
    return cls(cfg)

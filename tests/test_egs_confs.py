"""Every recipe YAML under egs/ must resolve AND build-and-trace.

test_conf_resolves is the fast config-rot guard: arch registered,
model-config keys accepted by the preset, criterion buildable, optimization
section loadable into TrainConfig.

test_speech_conf_traces / test_mt_conf_traces extend the mustc/st zoo's
full forward/loss shape-tracing (test_conf_zoo.py) to the OTHER recipe
zoos (VERDICT r3 #4: librispeech/aishell/mustc-asr/wmt16 confs were only
key-validated): build the model from arch + model section, the criterion
from its criterion section, and trace init + forward + loss with
jax.eval_shape — zero FLOPs, but unknown keys, bad shapes, and missing
heads all fail here.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

import s2t_tpu.models  # noqa: F401 — populate the arch registry
import s2t_tpu.criterions  # noqa: F401
from s2t_tpu.config import TrainConfig, from_dict, load_yaml_stack
from s2t_tpu.criterions.build import build_criterion
from s2t_tpu.models.build import build_model
from s2t_tpu.registry import ARCHS

EGS = Path(__file__).resolve().parent.parent / "egs"
CONFS = sorted(
    str(p.relative_to(EGS)) for p in EGS.rglob("*.yaml")
    if "mustc/st/conf" not in str(p)
)
SPEECH_ZOOS = ("librispeech/asr/conf", "aishell/asr/conf", "mustc/asr/conf")
SPEECH_CONFS = [c for c in CONFS if str(Path(c).parent) in SPEECH_ZOOS
                and Path(c).name != "basis.yaml"]
MT_CONFS = [c for c in CONFS
            if str(Path(c).parent) in ("wmt16/mt/conf", "mustc/mt/conf")
            and Path(c).name != "basis.yaml"]

B, T, NMEL, V = 2, 48, 80, 24


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


def _speech_batch():
    rng = np.random.default_rng(0)
    targets = rng.integers(4, V, size=(B, 6)).astype(np.int32)
    targets[:, -1] = 2
    prev = np.roll(targets, 1, axis=1)
    prev[:, 0] = 2
    return {
        "features": jnp.zeros((B, T, NMEL), jnp.float32),
        "feat_lengths": jnp.full((B,), T, jnp.int32),
        "prev_tokens": jnp.asarray(prev),
        "target": jnp.asarray(targets),
        "target_lengths": jnp.full((B,), 6, jnp.int32),
        "transcript": jnp.asarray(targets[:, :-1]),
        "transcript_lengths": jnp.full((B,), 5, jnp.int32),
        "ntokens": jnp.asarray(float(B * 6), jnp.float32),
    }


def _trace(model, criterion, batch, fwd_args, fwd_kwargs):
    def init_fn(rng):
        return model.init(rng, *fwd_args, deterministic=True)

    variables = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"])
    )
    assert n_params > 0

    def loss_fn(params, rng):
        out = model.apply(
            {"params": params}, *fwd_args, deterministic=False,
            rngs={"dropout": rng}, **fwd_kwargs,
        )
        loss, sample_size, logs = criterion(out, batch)
        return loss

    loss_shape = jax.eval_shape(
        loss_fn, variables["params"], jax.random.PRNGKey(1)
    )
    assert loss_shape.shape == ()


@pytest.mark.parametrize("rel", SPEECH_CONFS)
def test_speech_conf_traces(rel):
    d = load_yaml_stack([str(EGS / rel)])
    cfg = from_dict(TrainConfig, d)
    arch = cfg.arch
    if not arch:
        # feature fragments stack onto an arch conf; trace them on the
        # backbone they modify (PDS fragments need a PDS arch)
        arch = ("pdss2t_transformer_s_8"
                if any(k.startswith("pds_") for k in cfg.model)
                else "s2t_transformer_s")
    model = build_model(arch, cfg.model, vocab_size=V, max_target_positions=64)
    criterion = build_criterion(
        cfg.criterion or "label_smoothed_cross_entropy_with_ctc",
        cfg.criterion_cfg,
    )
    batch = _speech_batch()
    mcfg = model.cfg
    kw = {}
    if getattr(mcfg, "ctc_pae_ground_truth_ratio", 0.0) > 0:
        kw["transcript"] = batch["transcript"]
        kw["transcript_lengths"] = batch["transcript_lengths"]
    if getattr(mcfg, "xctc_pae_ground_truth_ratio", 0.0) > 0:
        kw["target"] = batch["target"]
        kw["target_lengths"] = batch["target_lengths"]
    _trace(model, criterion, batch,
           (batch["features"], batch["feat_lengths"], batch["prev_tokens"]),
           kw)


@pytest.mark.parametrize("rel", MT_CONFS)
def test_mt_conf_traces(rel):
    d = load_yaml_stack([str(EGS / rel)])
    cfg = from_dict(TrainConfig, d)
    model = build_model(cfg.arch or "transformer", cfg.model, vocab_size=V,
                        max_target_positions=64)
    criterion = build_criterion(
        cfg.criterion or "label_smoothed_cross_entropy", cfg.criterion_cfg
    )
    rng = np.random.default_rng(0)
    targets = rng.integers(4, V, size=(B, 6)).astype(np.int32)
    targets[:, -1] = 2
    prev = np.roll(targets, 1, axis=1)
    prev[:, 0] = 2
    src = rng.integers(4, V, size=(B, 9)).astype(np.int32)
    batch = {
        "src_tokens": jnp.asarray(src),
        "src_lengths": jnp.full((B,), 9, jnp.int32),
        "prev_tokens": jnp.asarray(prev),
        "target": jnp.asarray(targets),
        "target_lengths": jnp.full((B,), 6, jnp.int32),
        "ntokens": jnp.asarray(float(B * 6), jnp.float32),
    }
    _trace(model, criterion, batch,
           (batch["src_tokens"], batch["src_lengths"], batch["prev_tokens"]),
           {})

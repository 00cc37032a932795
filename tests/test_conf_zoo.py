"""Every recipe YAML in egs/mustc/st/conf must build and trace.

For each conf: load it through the same stacked-YAML path egs/run.py uses,
build the model from its arch + model section and the criterion from its
criterion section, then trace init + forward + loss with jax.eval_shape —
an end-to-end structural check (unknown keys, bad shapes, missing heads all
fail here) at zero FLOPs.  The key reproduction regimes additionally have
real numeric convergence tests (test_convergence_zoo.py, test_mixup.py).

(reference: the 55-file conf zoo at ref:egs/mustc/st/conf/)
"""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import TrainConfig, from_dict, load_yaml_stack
from s2t_tpu.criterions.build import build_criterion
from s2t_tpu.models.build import build_model

CONF_DIR = Path(__file__).resolve().parent.parent / "egs" / "mustc" / "st" / "conf"
CONFS = sorted(p.name for p in CONF_DIR.glob("*.yaml"))

B, T, NMEL, V = 2, 48, 80, 24


def _batch(raw_audio: bool):
    rng = np.random.default_rng(0)
    if raw_audio:
        feats = jnp.zeros((B, T * 160), jnp.float32)
        lens = jnp.full((B,), T * 160, jnp.int32)
    else:
        feats = jnp.zeros((B, T, NMEL), jnp.float32)
        lens = jnp.full((B,), T, jnp.int32)
    targets = rng.integers(4, V, size=(B, 6)).astype(np.int32)
    targets[:, -1] = 2
    prev = np.roll(targets, 1, axis=1)
    prev[:, 0] = 2
    return {
        "features": feats,
        "feat_lengths": lens,
        "prev_tokens": jnp.asarray(prev),
        "target": jnp.asarray(targets),
        "target_lengths": jnp.full((B,), 6, jnp.int32),
        "transcript": jnp.asarray(targets[:, :-1]),
        "transcript_lengths": jnp.full((B,), 5, jnp.int32),
        "transcript0": jnp.asarray(targets[:, :-1]),
        "transcript0_lengths": jnp.full((B,), 5, jnp.int32),
        "transcript1": jnp.asarray(targets[:, :-2]),
        "transcript1_lengths": jnp.full((B,), 4, jnp.int32),
        "aligned_target": jnp.asarray(targets),
        "ntokens": jnp.asarray(float(B * 6), jnp.float32),
    }


@pytest.mark.parametrize("conf", CONFS)
def test_conf_builds_and_traces(conf):
    d = load_yaml_stack([str(CONF_DIR / conf)])
    cfg = from_dict(TrainConfig, d)
    arch = cfg.arch or "s2t_transformer_s"
    raw_audio = bool(cfg.task_cfg.get("use_audio_input"))
    model = build_model(arch, cfg.model, vocab_size=V, max_target_positions=64)
    criterion = build_criterion(
        cfg.criterion or "label_smoothed_cross_entropy_with_ctc",
        cfg.criterion_cfg,
    )
    batch = _batch(raw_audio)
    mcfg = model.cfg

    def fwd_kwargs():
        kw = {}
        if getattr(mcfg, "consumes_transcript", False):
            kw["transcript"] = batch["transcript"]
            kw["transcript_lengths"] = batch["transcript_lengths"]
        if getattr(mcfg, "ctc_pae_ground_truth_ratio", 0.0) > 0:
            kw["transcript"] = batch["transcript"]
            kw["transcript_lengths"] = batch["transcript_lengths"]
        if getattr(mcfg, "xctc_pae_ground_truth_ratio", 0.0) > 0:
            kw["target"] = batch["target"]
            kw["target_lengths"] = batch["target_lengths"]
        return kw

    def init_fn(rng):
        return model.init(
            rng, batch["features"], batch["feat_lengths"],
            batch["prev_tokens"], deterministic=True,
        )

    variables = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"])
    )
    assert n_params > 0

    def loss_fn(params, rng):
        out = model.apply(
            {"params": params}, batch["features"], batch["feat_lengths"],
            batch["prev_tokens"], deterministic=False,
            rngs={"dropout": rng}, **fwd_kwargs(),
        )
        loss, sample_size, logs = criterion(out, batch)
        return loss

    loss_shape = jax.eval_shape(
        loss_fn, variables["params"], jax.random.PRNGKey(1)
    )
    assert loss_shape.shape == ()

"""Training CLI (reference: fairseq_cli/train.py:46-483).

Usage:
    python -m s2t_tpu.cli.train DATA_DIR \
        --config conf/base.yaml --config conf/ctc.yaml \
        optimization.lr=0.002 arch=s2t_transformer_s

Stacked --config files merge left-to-right (the reference's --train-configN,
options.py:95-145); trailing key.path=value pairs override everything.
"""

from __future__ import annotations

import argparse
import logging
import math
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("s2t_tpu.train")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("data", nargs="?", default=None)
    p.add_argument("--config", action="append", default=[], help="YAML config (repeatable)")
    p.add_argument("overrides", nargs="*", default=[], help="key.path=value overrides")
    return p.parse_args(argv)


def build_cfg(args):
    from s2t_tpu.config import TrainConfig, apply_overrides, from_dict, load_yaml_stack

    d = load_yaml_stack(args.config)
    d = apply_overrides(d, args.overrides)
    cfg = from_dict(TrainConfig, d)
    if args.data:
        cfg.dataset.data = args.data
    return cfg


def to_device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    # nested dicts: round-robin zip batches carry {"pairs": {pair: batch}}
    drop = {"ids", "nsentences"}
    return {
        k: to_device_batch(v) if isinstance(v, dict) else jnp.asarray(v)
        for k, v in batch.items() if k not in drop
    }


def _make_ctc_decode_fn(task, trainer):
    """Jitted encoder + CTC greedy decode for validation WER
    (reference: criterions/ctc.py:1104+ valid-time wer/cer logging).
    One program per feature shape (bucketed, so a bounded set)."""
    model = trainer.model
    if not hasattr(type(model), "encode"):
        return None

    @jax.jit
    def run(params, features, feat_lengths):
        from s2t_tpu.ops.ctc import ctc_greedy_decode

        enc = model.apply(
            {"params": params}, features, feat_lengths,
            method=type(model).encode,
        )
        if enc.get("ctc_logits") is None:
            return None
        return ctc_greedy_decode(enc["ctc_logits"], enc["encoder_lengths"])

    def fn(params, dev):
        return run(params, dev["features"], dev["feat_lengths"])

    return fn


def _accumulate_ctc_wer(task, ctc_fn, params, dev, batch, counts) -> None:
    from s2t_tpu.utils.scoring import edit_distance

    out = ctc_fn(params, dev)
    if out is None:
        return
    toks = np.asarray(out[0])
    # CTC scores the transcript (source dict) when present; otherwise the
    # target — decode references with the MATCHING dictionary
    if "transcript" in batch:
        key, dic = "transcript", getattr(task, "src_dict", task.tgt_dict)
    else:
        key, dic = "target", task.tgt_dict
    refs = np.asarray(batch[key])
    for b in range(batch["nsentences"]):
        hyp = dic.string(toks[b]).split()
        ref = dic.string(refs[b]).split()
        counts["w_err"] += edit_distance(hyp, ref)
        counts["w_len"] += len(ref)
        counts["c_err"] += edit_distance(list(" ".join(hyp)), list(" ".join(ref)))
        counts["c_len"] += len(" ".join(ref))


def validate(cfg, task, trainer, state, valid_ds, generator=None) -> Dict[str, float]:
    from s2t_tpu.utils.scoring import build_scorer

    itr = task.get_batch_iterator(
        valid_ds, max_tokens=cfg.dataset.max_tokens, seed=cfg.common.seed,
        shuffle=False, batch_size_multiple=int(trainer.mesh.shape["data"]),
    ).next_epoch_itr()
    tot: Dict[str, float] = {}
    n = 0.0
    scorer = None
    if generator is not None and (cfg.eval.eval_wer or cfg.eval.eval_bleu):
        scorer = build_scorer("wer" if cfg.eval.eval_wer else "sacrebleu")
    ctc_wer_fn = None
    wer_counts = {"w_err": 0, "w_len": 0, "c_err": 0, "c_len": 0}
    if cfg.eval.eval_ctc_wer:
        ctc_wer_fn = _make_ctc_decode_fn(task, trainer)
    # BMUF mode evaluates the replica-averaged model; otherwise a no-op view
    eval_params = (
        trainer.eval_params(state)
        if (ctc_wer_fn is not None or scorer is not None)
        else None
    )
    for batch in itr:
        dev = to_device_batch(batch)
        logs = trainer.valid_step(state, dev)
        ss = float(logs.get("sample_size", 1.0))
        tot["loss"] = tot.get("loss", 0.0) + float(logs["loss"])
        tot["nll_loss"] = tot.get("nll_loss", 0.0) + float(logs.get("nll_loss", logs["loss"]))
        # carry every scalar criterion log into validation history
        # (latency_loss, ctc_loss, diversity_loss, ...).  Counter-style keys
        # are summed raw and reported as their own ratio below — dividing a
        # counter by sample_size is meaningless (code-review r3)
        for k, v in logs.items():
            if k in ("loss", "nll_loss", "sample_size"):
                continue
            try:
                tot[k] = tot.get(k, 0.0) + float(v)
            except (TypeError, ValueError):
                pass
        n += ss
        if ctc_wer_fn is not None:
            _accumulate_ctc_wer(task, ctc_wer_fn, eval_params, dev, batch, wer_counts)
        if scorer is not None:
            tokens, scores, _ = generator.generate(eval_params, dev)
            hyp_toks = np.asarray(tokens)[:, 0]
            B_real = batch["nsentences"]
            for b in range(B_real):
                hyp = task.decode_tokens(hyp_toks[b])
                ref = task.decode_tokens(np.asarray(batch["target"])[b])
                scorer.add(ref, hyp)
    COUNTERS = {"n_correct", "total", "ntokens", "nsentences"}
    out = {
        k: (v if k in COUNTERS else v / max(n, 1.0)) for k, v in tot.items()
    }
    if "n_correct" in out and out.get("total", 0) > 0:
        out["accuracy"] = out["n_correct"] / out["total"]
    if scorer is not None:
        key = "wer" if cfg.eval.eval_wer else "bleu"
        out[key] = scorer.score()
    if ctc_wer_fn is not None and wer_counts["w_len"] > 0:
        out["ctc_wer"] = 100.0 * wer_counts["w_err"] / wer_counts["w_len"]
        out["ctc_cer"] = 100.0 * wer_counts["c_err"] / max(wer_counts["c_len"], 1)
    return out


def main(cfg) -> Dict[str, Any]:
    from s2t_tpu.parallel.mesh import make_mesh
    from s2t_tpu.tasks import setup_task
    from s2t_tpu.trainer import Trainer
    from s2t_tpu.utils.checkpoint import CheckpointManager, load_checkpoint

    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(name)s | %(message)s")
    if cfg.distributed.pipeline_parallel > 1:
        # pipeline parallelism is a model-structure choice (stacked stage
        # params): forward the mesh config into the model section so archs
        # that support it build the pipelined stack, and archs that don't
        # fail loudly on the unknown field instead of silently running DP
        # (reference: --pipeline-balance/-devices select the PP model class,
        # model_parallel/models/pipeline_parallel_transformer/model.py:80)
        cfg.model = dict(cfg.model or {})
        cfg.model.setdefault(
            "pipeline_parallel", cfg.distributed.pipeline_parallel
        )
    task = setup_task(cfg)
    train_ds = task.load_dataset(cfg.dataset.train_subset, is_train=True)
    valid_ds = task.load_dataset(cfg.dataset.valid_subset)
    model = task.build_model()
    criterion = task.build_criterion()
    mesh = make_mesh(cfg.distributed)
    trainer = Trainer(
        model, criterion, cfg.optimization, mesh,
        forward_fn=task.forward_fn(), seed=cfg.common.seed,
        dist_cfg=cfg.distributed, bmuf_cfg=cfg.bmuf,
    )
    if cfg.bmuf.active:
        logger.info(
            "BMUF/%s mode: %d local replicas, sync every %d updates",
            cfg.bmuf.variant, int(mesh.shape["data"]), cfg.bmuf.sync_interval,
        )
    logger.info(
        "mesh: %s | model params: (lazy init) | arch: %s", dict(mesh.shape), cfg.arch
    )

    epoch_itr = task.get_batch_iterator(
        train_ds, max_tokens=cfg.dataset.max_tokens, seed=cfg.common.seed,
        shuffle=cfg.dataset.shuffle, buffer_size=cfg.dataset.data_buffer_size,
        batch_size_multiple=int(mesh.shape["data"]),
    )

    ckpt = CheckpointManager(
        cfg.checkpoint.save_dir,
        keep_last_epochs=cfg.checkpoint.keep_last_epochs,
        keep_interval_updates=cfg.checkpoint.keep_interval_updates,
        keep_best_checkpoints=cfg.checkpoint.keep_best_checkpoints,
        best_metric=cfg.checkpoint.best_checkpoint_metric,
        maximize_best=cfg.checkpoint.maximize_best_checkpoint_metric,
        async_save=cfg.checkpoint.async_save,
    )

    # peek a batch for state init
    peek_itr = epoch_itr.next_epoch_itr()
    first_batch = to_device_batch(next(iter(peek_itr)))
    state = trainer.init_state(first_batch)
    epoch_itr.rewind()  # the peeked batch is re-consumed

    # pretrained component transplant (SATE/dual init; reference:
    # --load-pretrained-{encoder,decoder}-from, checkpoint_utils.py:676)
    from flax import serialization
    from s2t_tpu.utils.checkpoint import transplant_component

    for comp, path in (
        ("encoder", cfg.checkpoint.load_pretrained_encoder_from),
        ("decoder", cfg.checkpoint.load_pretrained_decoder_from),
    ):
        if path:
            src_tree, _ = load_checkpoint(path)
            src_params = src_tree.get("params", src_tree)
            host = serialization.to_state_dict(state.params)
            new = transplant_component(host, src_params, comp)
            params = serialization.from_state_dict(state.params, new)
            state = state.replace(params=jax.tree.map(jnp.asarray, params))
            logger.info("loaded pretrained %s from %s", comp, path)
    if cfg.checkpoint.finetune_from_model:
        src_tree, _ = load_checkpoint(cfg.checkpoint.finetune_from_model)
        params = serialization.from_state_dict(
            state.params, src_tree.get("params", src_tree)
        )
        state = state.replace(params=jax.tree.map(jnp.asarray, params))
        logger.info("finetuning from %s", cfg.checkpoint.finetune_from_model)

    # resume
    last = Path(cfg.checkpoint.save_dir) / (cfg.checkpoint.restore_file + ".pt")
    if last.exists() and not cfg.checkpoint.finetune_from_model:
        tree, meta = load_checkpoint(last)
        if not cfg.checkpoint.reset_optimizer:
            state = trainer.load_state_dict(tree, state)
        else:
            from flax import serialization

            params = serialization.from_state_dict(state.params, tree["params"])
            state = state.replace(params=jax.tree.map(jnp.asarray, params))
        if not cfg.checkpoint.reset_dataloader and "epoch_itr" in meta:
            epoch_itr.load_state_dict(meta["epoch_itr"])
        logger.info("resumed from %s at step %d", last, int(state.step))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info("num. model params: %s", f"{n_params:,}")

    generator = None
    if cfg.eval.eval_wer or cfg.eval.eval_bleu:
        gen_cfg = cfg.generation
        generator = task.build_generator(model)
        generator.beam_size = cfg.eval.eval_gen_beam

    from s2t_tpu.utils.progress import ProgressLogger

    progress = ProgressLogger(
        cfg.common.log_format, cfg.common.tensorboard_logdir,
        cfg.common.wandb_project,
        azureml_logging=cfg.common.azureml_logging,
    )
    max_epoch = cfg.optimization.max_epoch or math.inf
    max_update = cfg.optimization.max_update or math.inf
    patience_left = cfg.optimization.patience
    best_val = None
    history = []
    profiling = False
    profile_done = False
    plateau = None
    if cfg.optimization.lr_scheduler in ("reduce_on_plateau", "reduce_lr_on_plateau"):
        from s2t_tpu.optim.builders import ReduceOnPlateau

        plateau = ReduceOnPlateau(
            shrink=cfg.optimization.lr_shrink,
            patience=cfg.optimization.lr_patience,
        )

    while epoch_itr.epoch <= max_epoch and int(state.step) < max_update:
        itr = epoch_itr.next_epoch_itr()
        t0 = time.time()
        interval_logs: Dict[str, float] = {}
        interval_n = 0
        for batch in itr:
            if cfg.common.profile:
                # jax profiler window (reference: --profile wrapping,
                # fairseq_cli/train.py:491-494 — nvtx/cuda profiler there)
                step_now = int(state.step)
                # >= not ==: a resumed run whose step is already past
                # profile_start must still get its trace window
                if (step_now >= cfg.common.profile_start and not profiling
                        and not profile_done):
                    logdir = Path(
                        cfg.common.tensorboard_logdir or cfg.checkpoint.save_dir
                    ) / "profile"
                    logdir.mkdir(parents=True, exist_ok=True)
                    jax.profiler.start_trace(str(logdir))
                    profiling = True
                    profile_stop_at = step_now + cfg.common.profile_steps
                    logger.info("profiler trace started -> %s", logdir)
                elif profiling and step_now >= profile_stop_at:
                    jax.profiler.stop_trace()
                    profiling = False
                    profile_done = True
                    logger.info("profiler trace stopped")
            state, metrics = trainer.train_step(state, to_device_batch(batch))
            interval_n += 1
            for k in ("loss", "gnorm"):
                interval_logs[k] = interval_logs.get(k, 0.0) + float(metrics[k])
            if int(state.step) % cfg.common.log_interval == 0:
                ups = interval_n / (time.time() - t0 + 1e-9)
                progress.log(
                    {
                        "loss": interval_logs["loss"] / interval_n,
                        "gnorm": interval_logs["gnorm"] / interval_n,
                        "lr": float(metrics["lr"]),
                        "ups": ups,
                    },
                    int(state.step), "train", epoch_itr.epoch,
                )
                interval_logs, interval_n, t0 = {}, 0, time.time()
            if (
                cfg.checkpoint.save_interval_updates > 0
                and int(state.step) % cfg.checkpoint.save_interval_updates == 0
            ):
                ckpt.save(trainer.state_dict(state), int(state.step),
                          epoch_itr.epoch, end_of_epoch=False,
                          extra_meta={"epoch_itr": epoch_itr.state_dict()})
            if int(state.step) >= max_update:
                break

        val = validate(cfg, task, trainer, state, valid_ds, generator)
        metric_name = cfg.checkpoint.best_checkpoint_metric
        val_metric = val.get(metric_name, val.get("loss"))
        if plateau is not None:
            scale = plateau.step(float(val.get("loss", val_metric)))
            state = trainer.set_lr_scale(state, scale)
            val["lr_scale"] = scale
        progress.log(val, int(state.step), "valid", epoch_itr.epoch)
        history.append(val)
        if not cfg.checkpoint.no_save:
            ckpt.save(trainer.state_dict(state), int(state.step), epoch_itr.epoch,
                      val_metric=val_metric,
                      extra_meta={"epoch_itr": epoch_itr.state_dict()})
        # patience-based early stop (reference: fairseq_cli/train.py:206-232)
        better = (
            best_val is None
            or (val_metric > best_val
                if cfg.checkpoint.maximize_best_checkpoint_metric
                else val_metric < best_val)
        )
        if better:
            best_val = val_metric
            patience_left = cfg.optimization.patience
        elif cfg.optimization.patience > 0:
            patience_left -= 1
            if patience_left <= 0:
                logger.info("early stop: patience exhausted")
                break
        epoch_itr.next_epoch()

    if profiling:  # loop may exit inside the profile window
        jax.profiler.stop_trace()
        logger.info("profiler trace stopped (loop exit)")
    progress.close()
    return {"state": state, "history": history, "task": task, "model": model}


def cli_main():
    args = parse_args()
    main(build_cfg(args))


if __name__ == "__main__":
    cli_main()

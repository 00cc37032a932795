"""Staged recipe runner — the Python answer to the reference's Kaldi-style
run.sh scripts (reference: egs/mustc/st/run.sh — stage 0 data prep, stage 1
train, stage 2 average+decode).

Usage (from a recipe dir containing conf/):
    python ../../run.py --data DATA_DIR --save-dir ckpt \
        --configs conf/base.yaml conf/ctc.yaml --stage 1 --stop-stage 2 \
        [--input-root RAW_DIR] [overrides...]
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

logger = logging.getLogger("s2t_tpu.run")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=0)
    p.add_argument("--stop-stage", type=int, default=2)
    p.add_argument("--data", required=True, help="prepared data dir")
    p.add_argument("--input-root", help="raw data dir for stage 0")
    p.add_argument("--save-dir", default="checkpoints")
    p.add_argument("--configs", nargs="+", default=[])
    p.add_argument("--n-average", type=int, default=10,
                   help="checkpoints to average before decoding")
    p.add_argument("--gen-subset", default="test")
    p.add_argument("--vocab-size", type=int, default=5000)
    p.add_argument("--speed-perturb", action="store_true")
    p.add_argument("--corpus", default="tsv",
                   help="stage-0 raw layout: tsv|mustc|librispeech|covost|mtedx")
    p.add_argument("--lang", help="stage-0 corpus language (de, es-en, ...)")
    p.add_argument("--prep-task", default="st", choices=["asr", "st"])
    p.add_argument("--prep-splits", nargs="+",
                   help="stage-0 split names (default: corpus-specific)")
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(message)s")

    from s2t_tpu.config import TrainConfig, apply_overrides, from_dict, load_yaml_stack

    d = load_yaml_stack(args.configs)
    d = apply_overrides(d, args.overrides)
    cfg = from_dict(TrainConfig, d)
    cfg.dataset.data = args.data
    cfg.checkpoint.save_dir = args.save_dir

    if args.stage <= 0 <= args.stop_stage and args.input_root:
        logger.info("=== stage 0: data preparation ===")
        from s2t_tpu.cli.prep_audio import main as prep_main

        prep_argv = ["--output-root", args.data,
                     "--vocab-size", str(args.vocab_size), "--cmvn",
                     "--corpus", args.corpus, "--task", args.prep_task]
        if args.corpus == "tsv":
            prep_argv += ["--input-root", args.input_root]
        else:
            prep_argv += ["--data-root", args.input_root]
            if args.lang:
                prep_argv += ["--lang", args.lang]
        if args.prep_splits:
            prep_argv += ["--splits", *args.prep_splits]
        if args.speed_perturb:
            prep_argv.append("--speed-perturb")
        prep_main(prep_argv)

    if args.stage <= 1 <= args.stop_stage:
        logger.info("=== stage 1: training ===")
        from s2t_tpu.cli.train import main as train_main

        train_main(cfg)

    if args.stage <= 2 <= args.stop_stage:
        logger.info("=== stage 2: average + decode ===")
        from s2t_tpu.cli.generate import main as generate_main
        from s2t_tpu.utils.checkpoint import (
            CheckpointManager, average_checkpoints, load_checkpoint,
        )

        mgr = CheckpointManager(
            args.save_dir,
            best_metric=cfg.checkpoint.best_checkpoint_metric,
            maximize_best=cfg.checkpoint.maximize_best_checkpoint_metric,
        )
        paths = mgr.best_checkpoints(args.n_average)
        if paths:
            logger.info("averaging %d best checkpoints", len(paths))
            params = average_checkpoints(paths)
        else:
            tree, _ = load_checkpoint(Path(args.save_dir) / "checkpoint_last.pt")
            params = tree["params"]
        cfg.dataset.gen_subset = args.gen_subset
        cfg.generation.results_path = str(Path(args.save_dir) / "decode")
        result = generate_main(cfg, params)
        logger.info("decode result: %s", result["score_str"])
        return result


if __name__ == "__main__":
    main()

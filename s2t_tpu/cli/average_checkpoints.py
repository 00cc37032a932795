"""Average checkpoint parameters (reference: scripts/average_checkpoints.py:114
— the avg-N-best decode-time trick used by every recipe, egs/mustc/st/run.sh:374)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--inputs", nargs="+", help="explicit checkpoint paths")
    p.add_argument("--save-dir", help="checkpoint dir for --num-best mode")
    p.add_argument("--num-best-checkpoints", type=int, default=0)
    p.add_argument("--best-metric", default="loss")
    p.add_argument("--maximize", action="store_true")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    from s2t_tpu.utils.checkpoint import (
        CheckpointManager,
        average_checkpoints,
        save_pytree,
    )

    if args.num_best_checkpoints > 0:
        mgr = CheckpointManager(
            args.save_dir, best_metric=args.best_metric, maximize_best=args.maximize
        )
        paths = mgr.best_checkpoints(args.num_best_checkpoints)
    else:
        paths = args.inputs
    avg = average_checkpoints(paths)
    save_pytree(args.output, {"params": avg})
    print(f"averaged {len(paths)} checkpoints -> {args.output}")


if __name__ == "__main__":
    main()

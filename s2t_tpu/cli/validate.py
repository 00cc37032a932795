"""Criterion-only evaluation of a checkpoint (reference: fairseq_cli/validate.py:29)."""

from __future__ import annotations

import argparse
import logging

import jax.numpy as jnp

logger = logging.getLogger("s2t_tpu.validate")


def main(cfg, params) -> dict:
    from s2t_tpu.parallel.mesh import make_mesh
    from s2t_tpu.tasks import setup_task
    from s2t_tpu.trainer import Trainer

    task = setup_task(cfg)
    ds = task.load_dataset(cfg.dataset.valid_subset)
    model = task.build_model()
    criterion = task.build_criterion()
    mesh = make_mesh(cfg.distributed)
    trainer = Trainer(model, criterion, cfg.optimization, mesh,
                      forward_fn=task.forward_fn(), dist_cfg=cfg.distributed)
    itr = task.get_batch_iterator(
        ds, max_tokens=cfg.dataset.max_tokens, shuffle=False,
        batch_size_multiple=int(mesh.shape["data"]),
    ).next_epoch_itr()

    state = None
    totals, n = {}, 0.0
    for batch in itr:
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k not in ("ids", "nsentences")}
        if state is None:
            state = trainer.init_state(dev)
            state = state.replace(params=params)
        logs = trainer.valid_step(state, dev)
        ss = float(logs.get("sample_size", 1.0))
        for k, v in logs.items():
            try:
                totals[k] = totals.get(k, 0.0) + float(v)
            except (TypeError, ValueError):
                pass
        n += ss
    out = {k: v / max(n, 1.0) for k, v in totals.items()}
    logger.info("valid on %s: %s", cfg.dataset.valid_subset,
                " ".join(f"{k} {v:.4f}" for k, v in sorted(out.items())))
    return out


def cli_main():
    from s2t_tpu.cli.generate import load_params, parse_args
    from s2t_tpu.cli.train import build_cfg

    logging.basicConfig(level=logging.INFO)
    args = parse_args()
    cfg = build_cfg(args)
    params = load_params(args, cfg)
    main(cfg, params)


if __name__ == "__main__":
    cli_main()

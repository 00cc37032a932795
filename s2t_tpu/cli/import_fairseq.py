"""Convert a reference (fairseq) checkpoint into this framework's format.

Usage:
    python -m s2t_tpu.cli.import_fairseq ref_checkpoint.pt out.pt \
        [--override key=value ...]

Writes the msgpack pytree checkpoint + a json sidecar carrying the inferred
model config, loadable by generate/train via --path / finetune_from_model.
(reference checkpoint layout: fairseq/checkpoint_utils.py:244-339)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging

logger = logging.getLogger("s2t_tpu.import_fairseq")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("input", help="fairseq .pt checkpoint")
    p.add_argument("output", help="output checkpoint path")
    p.add_argument(
        "--override", action="append", default=[],
        help="config override key=value (e.g. encoder_attention_heads=4)",
    )
    p.add_argument(
        "--type", default="s2t", choices=("s2t", "mt"),
        help="checkpoint family: s2t_transformer or MT transformer",
    )
    return p.parse_args(argv)


def _parse_value(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v in ("true", "True"):
        return True
    if v in ("false", "False"):
        return False
    return v


def main(argv=None):
    from s2t_tpu.interop.fairseq_import import (
        import_fairseq_mt,
        import_fairseq_s2t,
    )
    from s2t_tpu.utils.checkpoint import save_pytree

    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(message)s")
    args = parse_args(argv)
    overrides = dict(
        (k, _parse_value(v))
        for k, v in (s.split("=", 1) for s in args.override)
    )
    importer = import_fairseq_mt if args.type == "mt" else import_fairseq_s2t
    params, cfg = importer(args.input, **overrides)
    save_pytree(args.output, {"params": params})
    meta = {"imported_from": args.input, "model": dataclasses.asdict(cfg)}
    with open(args.output + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    import jax

    n = sum(x.size for x in jax.tree.leaves(params))
    logger.info("imported %s -> %s (%s params)", args.input, args.output, f"{n:,}")
    logger.info("inferred config: %s", json.dumps(meta["model"]))


if __name__ == "__main__":
    main()

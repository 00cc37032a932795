"""LM perplexity evaluation (reference: fairseq_cli/eval_lm.py:236)."""

from __future__ import annotations

import logging
import math

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("s2t_tpu.eval_lm")


def main(cfg, params) -> dict:
    import jax

    from s2t_tpu.tasks import setup_task

    task = setup_task(cfg)
    ds = task.load_dataset(cfg.dataset.gen_subset)
    if cfg.eval.context_window > 0:
        # carry the previous block's tail as unscored context (reference:
        # fairseq_cli/eval_lm.py --context-window)
        from s2t_tpu.data.wrappers import LMContextWindowDataset

        ds = LMContextWindowDataset(
            ds, cfg.eval.context_window,
            pad_id=task.tgt_dict.pad(), eos_id=task.tgt_dict.eos(),
        )
    model = task.build_model()
    itr = task.get_batch_iterator(ds, shuffle=False).next_epoch_itr()

    @jax.jit
    def nll_fn(params, prev, target):
        out = model.apply({"params": params}, prev, deterministic=True)
        lp = jax.nn.log_softmax(out["decoder_logits"].astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(lp, target[..., None], axis=-1)[..., 0]
        mask = target != 1
        return jnp.sum(jnp.where(mask, -tok_lp, 0.0)), jnp.sum(mask)

    total_nll, total_tok = 0.0, 0.0
    for batch in itr:
        nll, ntok = nll_fn(
            params, jnp.asarray(batch["prev_tokens"]), jnp.asarray(batch["target"])
        )
        total_nll += float(nll)
        total_tok += float(ntok)
    avg_nll = total_nll / max(total_tok, 1.0)
    ppl = math.exp(avg_nll)
    logger.info("loss %.4f | ppl %.2f over %d tokens", avg_nll, ppl, int(total_tok))
    return {"loss": avg_nll, "perplexity": ppl, "ntokens": total_tok}


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

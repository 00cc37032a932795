"""Generation CLI with fairseq-compatible output files.

(reference: fairseq_cli/generate.py:28-464 — writes generate-<subset>.txt with
T-/H-/D- lines and translation-<subset>.txt, scores BLEU/WER; optional
checkpoint averaging like scripts/average_checkpoints.py.)

Usage:
    python -m s2t_tpu.cli.generate DATA_DIR --path ckpt.pt \
        [--avg-best N --save-dir DIR] --config conf.yaml \
        generation.beam=5 dataset.gen_subset=test
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("s2t_tpu.generate")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("data", nargs="?", default=None)
    p.add_argument("--path", default=None, help="checkpoint path")
    p.add_argument("--avg-best", type=int, default=0,
                   help="average the N best checkpoints from --save-dir")
    p.add_argument("--save-dir", default=None)
    p.add_argument("--config", action="append", default=[])
    p.add_argument("overrides", nargs="*", default=[])
    return p.parse_args(argv)


def load_params(args, cfg, example_state_params=None):
    from s2t_tpu.utils.checkpoint import (
        CheckpointManager,
        average_checkpoints,
        load_checkpoint,
    )

    if args.avg_best and args.save_dir:
        mgr = CheckpointManager(
            args.save_dir,
            best_metric=cfg.checkpoint.best_checkpoint_metric,
            maximize_best=cfg.checkpoint.maximize_best_checkpoint_metric,
        )
        paths = mgr.best_checkpoints(args.avg_best)
        logger.info("averaging %d checkpoints", len(paths))
        return average_checkpoints(paths)
    tree, _ = load_checkpoint(args.path)
    return tree["params"] if "params" in tree else tree


def main(cfg, params, task=None) -> Dict[str, Any]:
    """Decode ``gen_subset`` and score. Returns dict with scores and outputs."""
    from s2t_tpu.tasks import setup_task
    from s2t_tpu.utils.scoring import build_scorer

    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(name)s | %(message)s")
    task = task or setup_task(cfg)
    subset = cfg.dataset.gen_subset
    eval_pair = getattr(task, "eval_lang_pair", None)
    if eval_pair:
        # per-pair multilingual models decode one pair (reference:
        # multilingual_translation.py eval via source/target lang)
        ds = task.load_pair_dataset(subset, eval_pair)
    else:
        ds = task.load_dataset(subset)
    model = task.build_model()
    generator = task.build_generator(model)

    itr = task.get_batch_iterator(
        ds, max_tokens=cfg.dataset.max_tokens, shuffle=False,
    ).next_epoch_itr()

    results: Dict[int, Dict[str, Any]] = {}
    n_utts = 0
    gen_time = 0.0
    total_frames = 0
    for batch in itr:
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k not in ("ids", "nsentences")}
        t0 = time.time()
        tokens, scores, enc = generator.generate(params, dev)
        jax.block_until_ready(tokens)
        gen_time += time.time() - t0
        tokens = np.asarray(tokens)
        scores = np.asarray(scores)
        B_real = batch["nsentences"]
        # --ctc-infer: greedy CTC transcript/translation dumps alongside the
        # beam output (reference: generate.py:109-135 + CTC.set_ctc_infer —
        # produces translation-<subset>.txt.ctc/.xctc for cal_wer/cal_ctc_bleu)
        ctc_hyps = xctc_hyps = None
        if cfg.generation.ctc_infer and isinstance(enc, dict):
            from s2t_tpu.ops.ctc import ctc_greedy_decode

            if enc.get("ctc_logits") is not None:
                toks, lens_ = ctc_greedy_decode(
                    enc["ctc_logits"], enc["encoder_lengths"]
                )
                ctc_hyps = np.asarray(toks)
            if enc.get("xctc_logits") is not None:
                toks, lens_ = ctc_greedy_decode(
                    enc["xctc_logits"], enc["encoder_lengths"]
                )
                xctc_hyps = np.asarray(toks)
        n_utts += B_real
        len_key = "feat_lengths" if "feat_lengths" in batch else "src_lengths"
        total_frames += int(np.asarray(batch[len_key])[:B_real].sum())
        for b in range(B_real):
            sid = int(batch["ids"][b])
            hyp_tok = tokens[b, 0] if tokens.ndim == 3 else tokens[b]
            hyp_str = task.tgt_dict.string(hyp_tok)
            hyp_detok = task.decode_tokens(hyp_tok)
            entry = {
                "hyp_tokens": hyp_str,
                "hyp": hyp_detok,
                "score": float(scores[b, 0]) if scores.ndim == 2 else 0.0,
            }
            if "target" in batch:
                tgt = np.asarray(batch["target"])[b]
                entry["ref_tokens"] = task.tgt_dict.string(tgt)
                entry["ref"] = task.decode_tokens(tgt)
            if ctc_hyps is not None:
                src_dict = getattr(task, "src_dict", task.tgt_dict)
                entry["ctc"] = src_dict.string(
                    ctc_hyps[b], bpe_symbol=cfg.generation.post_process
                )
            if xctc_hyps is not None:
                entry["xctc"] = task.decode_tokens(xctc_hyps[b])
            results[sid] = entry

    # scoring
    scorer = build_scorer(cfg.generation.scoring)
    for sid in sorted(results):
        r = results[sid]
        if "ref" in r:
            scorer.add(r["ref"], r["hyp"])
    score_str = scorer.result_string() if results and "ref" in next(iter(results.values())) else ""

    # output files (fairseq format)
    out_dir = Path(cfg.generation.results_path or cfg.checkpoint.save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / f"generate-{subset}.txt", "w") as f, open(
        out_dir / f"translation-{subset}.txt", "w"
    ) as ft:
        for sid in sorted(results):
            r = results[sid]
            if "ref_tokens" in r:
                f.write(f"T-{sid}\t{r['ref_tokens']}\n")
            f.write(f"H-{sid}\t{r['score']:.4f}\t{r['hyp_tokens']}\n")
            f.write(f"D-{sid}\t{r['score']:.4f}\t{r['hyp']}\n")
            ft.write(r["hyp"] + "\n")
        if score_str:
            f.write(f"Generate {subset} with beam={cfg.generation.beam}: {score_str}\n")
    if any("ctc" in r for r in results.values()):
        with open(out_dir / f"translation-{subset}.txt.ctc", "w") as f:
            for sid in sorted(results):
                f.write(results[sid].get("ctc", "") + "\n")
    if any("xctc" in r for r in results.values()):
        with open(out_dir / f"translation-{subset}.txt.xctc", "w") as f:
            for sid in sorted(results):
                f.write(results[sid].get("xctc", "") + "\n")

    # RTF: audio seconds / wall seconds. With use_audio_input the collated
    # lengths are 16 kHz sample counts, not 10 ms frames.
    data_cfg = getattr(task, "data_cfg", None)
    if data_cfg is not None and getattr(data_cfg, "use_audio_input", False):
        audio_seconds = total_frames / float(getattr(data_cfg, "sample_rate", 16000))
    else:
        audio_seconds = total_frames * 0.01
    rtf = audio_seconds / gen_time if gen_time > 0 else 0.0
    logger.info(
        "decoded %d utterances in %.1fs (%.2f utt/s, RTF %.1fx) | %s",
        n_utts, gen_time, n_utts / max(gen_time, 1e-9), rtf, score_str,
    )
    return {
        "results": results,
        "score_str": score_str,
        "scorer": scorer,
        "n_utts": n_utts,
        "gen_time": gen_time,
        "rtf": rtf,
        "utts_per_sec": n_utts / max(gen_time, 1e-9),
    }


def cli_main():
    from s2t_tpu.cli.train import build_cfg

    args = parse_args()
    cfg = build_cfg(args)
    params = load_params(args, cfg)
    main(cfg, params)


if __name__ == "__main__":
    cli_main()

"""Score a hypothesis file against a reference file
(reference: fairseq_cli/score.py:37)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sys", required=True, help="hypothesis file")
    p.add_argument("--ref", required=True, help="reference file")
    p.add_argument("--metric", default="sacrebleu",
                   choices=["sacrebleu", "bleu", "fast_bleu", "wer", "cer"])
    args = p.parse_args(argv)

    from s2t_tpu.utils.scoring import build_scorer

    scorer = build_scorer(args.metric)
    with open(args.sys) as fs, open(args.ref) as fr:
        for hyp, ref in zip(fs, fr):
            scorer.add(ref.rstrip("\n"), hyp.rstrip("\n"))
    print(scorer.result_string())
    return scorer.score()


if __name__ == "__main__":
    main()

"""Binarize raw bitext into mmap .idx/.bin (reference: fairseq_cli/
preprocess.py:32 — the fairseq-preprocess mmap path for large corpora).

Usage:
    python -m s2t_tpu.cli.preprocess --source-lang en --target-lang de \
        --trainpref data/train --validpref data/dev --destdir out \
        [--srcdict dict.en.txt] [--joined-dictionary] [--nwordssrc 10000]
"""

from __future__ import annotations

import argparse
import logging
from collections import Counter
from pathlib import Path

logger = logging.getLogger("s2t_tpu.preprocess")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--source-lang", required=True)
    p.add_argument("--target-lang", required=True)
    p.add_argument("--trainpref", required=True)
    p.add_argument("--validpref", default=None)
    p.add_argument("--testpref", default=None)
    p.add_argument("--destdir", required=True)
    p.add_argument("--srcdict", default=None)
    p.add_argument("--tgtdict", default=None)
    p.add_argument("--joined-dictionary", action="store_true")
    p.add_argument("--nwordssrc", type=int, default=-1)
    p.add_argument("--nwordstgt", type=int, default=-1)
    p.add_argument("--threshold", type=int, default=0)
    return p.parse_args(argv)


def build_dict(paths, nwords, threshold):
    from s2t_tpu.data.dictionary import Dictionary

    d = Dictionary()
    counts: Counter = Counter()
    for path in paths:
        with open(path, encoding="utf-8") as f:
            for line in f:
                counts.update(line.split())
    items = [
        (t, c) for t, c in
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c >= threshold
    ]
    if nwords > 0:
        items = items[:nwords]
    for t, c in items:
        d.add_symbol(t, c)
    return d


def binarize(path, dictionary, out_prefix):
    from s2t_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder

    b = MMapIndexedDatasetBuilder(out_prefix)
    n_tok = 0
    with open(path, encoding="utf-8") as f:
        for line in f:
            ids = dictionary.encode_line(line.strip(), append_eos=True)
            b.add_item(ids)
            n_tok += len(ids)
    b.finalize()
    return n_tok


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(message)s")
    args = parse_args(argv)
    dest = Path(args.destdir)
    dest.mkdir(parents=True, exist_ok=True)
    src, tgt = args.source_lang, args.target_lang

    from s2t_tpu.data.dictionary import Dictionary

    if args.joined_dictionary:
        d = (Dictionary.load(args.srcdict) if args.srcdict else build_dict(
            [f"{args.trainpref}.{src}", f"{args.trainpref}.{tgt}"],
            args.nwordssrc, args.threshold))
        src_dict = tgt_dict = d
    else:
        src_dict = Dictionary.load(args.srcdict) if args.srcdict else build_dict(
            [f"{args.trainpref}.{src}"], args.nwordssrc, args.threshold)
        tgt_dict = Dictionary.load(args.tgtdict) if args.tgtdict else build_dict(
            [f"{args.trainpref}.{tgt}"], args.nwordstgt, args.threshold)
    src_dict.save(dest / f"dict.{src}.txt")
    tgt_dict.save(dest / f"dict.{tgt}.txt")

    for name, pref in (("train", args.trainpref), ("valid", args.validpref),
                       ("test", args.testpref)):
        if not pref:
            continue
        for lang, d in ((src, src_dict), (tgt, tgt_dict)):
            n = binarize(f"{pref}.{lang}", d,
                         dest / f"{name}.{src}-{tgt}.{lang}")
            logger.info("binarized %s.%s: %d tokens", name, lang, n)
    logger.info("done -> %s", dest)


if __name__ == "__main__":
    main()

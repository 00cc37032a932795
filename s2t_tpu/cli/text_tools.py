"""Text-prep utilities: subword train/encode/decode + lcrm.

(reference: scripts/spm_train.py, spm_encode.py, spm_decode.py and
scripts/lcrm.py — the recipe plumbing around fairseq-preprocess; here they
share the framework's own tokenizer implementations.)

Usage:
    python -m s2t_tpu.cli.text_tools spm_train  --input x.txt --model m.json \
        --vocab-size 8000 [--type unigram|bpe]
    python -m s2t_tpu.cli.text_tools spm_encode --model m.json < in > out
    python -m s2t_tpu.cli.text_tools spm_decode --model m.json < in > out
    python -m s2t_tpu.cli.text_tools lcrm < in > out
"""

from __future__ import annotations

import argparse
import string
import sys


_LCRM_TABLE = {ord(c): None for c in string.punctuation if c != "'"}


def lcrm_line(line: str) -> str:
    """Lowercase + remove punctuation except apostrophes (reference:
    scripts/lcrm.py — the MuST-C ASR-side text normalisation)."""
    return " ".join(line.lower().translate(_LCRM_TABLE).split())


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("spm_train")
    t.add_argument("--input", required=True, nargs="+")
    t.add_argument("--model", required=True)
    t.add_argument("--vocab-size", type=int, default=8000)
    t.add_argument("--type", default="unigram", choices=("unigram", "bpe"))

    for name in ("spm_encode", "spm_decode"):
        e = sub.add_parser(name)
        e.add_argument("--model", required=True)
        e.add_argument("--input", default=None)
        e.add_argument("--output", default=None)

    sub.add_parser("lcrm").add_argument("--input", default=None)

    rb = sub.add_parser("read_binarized")  # reference: scripts/read_binarized.py
    rb.add_argument("--dataset-impl", default="mmap")
    rb.add_argument("--dict", dest="dict_path", default=None)
    rb.add_argument("--input", required=True, help=".bin/.idx prefix")
    rb.add_argument("--output", default=None)

    args = p.parse_args(argv)

    from s2t_tpu.data.tokenizer import build_tokenizer
    from s2t_tpu.registry import TOKENIZERS

    if args.cmd == "spm_train":
        lines = []
        for path in args.input:
            with open(path, encoding="utf-8") as f:
                lines.extend(l.rstrip("\n") for l in f)
        TOKENIZERS.get(args.type).train(lines, args.vocab_size, args.model)
        print(f"trained {args.type} model ({args.vocab_size}) -> {args.model}",
              file=sys.stderr)
        return

    if args.cmd == "read_binarized":
        from s2t_tpu.data.dictionary import Dictionary
        from s2t_tpu.data.indexed_dataset import MMapIndexedDataset

        ds = MMapIndexedDataset(args.input)
        d = Dictionary.load(args.dict_path) if args.dict_path else None
        dst = (open(args.output, "w", encoding="utf-8")
               if args.output else sys.stdout)
        for i in range(len(ds)):
            ids = ds[i]
            dst.write(
                (d.string(ids) if d else " ".join(map(str, ids))) + "\n"
            )
        return

    src = (open(args.input, encoding="utf-8") if getattr(args, "input", None)
           else sys.stdin)
    dst = (open(args.output, "w", encoding="utf-8")
           if getattr(args, "output", None) else sys.stdout)

    if args.cmd == "lcrm":
        for line in src:
            dst.write(lcrm_line(line) + "\n")
        return

    kind = "bpe" if "bpe" in str(args.model) else "unigram"
    tok = build_tokenizer({"bpe": kind, "model_path": args.model})
    for line in src:
        line = line.rstrip("\n")
        if args.cmd == "spm_encode":
            dst.write(tok.encode_line(line) + "\n")
        else:
            dst.write(tok.decode(line.split()) + "\n")


if __name__ == "__main__":
    main()

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
import os
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

    rp = sub.add_parser("rm_pt")  # reference: scripts/rm_pt.py — prune old
    rp.add_argument("--root", required=True, nargs="+")  # checkpoint dirs
    rp.add_argument("--save-last", type=int, default=0)
    rp.add_argument("--save-interval", type=int, default=0)
    rp.add_argument("--dry-run", action="store_true")

    sd = sub.add_parser("shard_docs")  # reference: scripts/shard_docs.py
    sd.add_argument("input")
    sd.add_argument("--num-shards", type=int, required=True)

    cd = sub.add_parser("count_docs")  # reference: scripts/count_docs.py
    cd.add_argument("input")

    sv = sub.add_parser("split_train_valid_docs")
    # reference: scripts/split_train_valid_docs.py
    sv.add_argument("input")
    sv.add_argument("--valid-percent", type=float, default=0.01)

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

    if args.cmd == "rm_pt":
        # keep checkpoint_best/_last plus the newest --save-last numbered
        # checkpoints (or every --save-interval'th); delete the rest
        if args.save_last <= 0 and args.save_interval <= 0:
            p.error("rm_pt needs --save-last and/or --save-interval > 0 "
                    "(a no-retention invocation would delete every "
                    "numbered checkpoint)")
        import re

        num_re = re.compile(r"checkpoint(?:_\d+_)?(\d+)\.(pt|ckpt)$")
        for root in args.root:
            entries = []
            for f in sorted(os.listdir(root)):
                m = num_re.fullmatch(f)
                if m:
                    entries.append((int(m.group(1)), f))
            entries.sort()
            keep = set()
            if args.save_last > 0:
                keep |= {f for _, f in entries[-args.save_last:]}
            if args.save_interval > 0:
                keep |= {f for n, f in entries if n % args.save_interval == 0}
            for _, f in entries:
                if f in keep:
                    continue
                path = os.path.join(root, f)
                print(("would remove " if args.dry_run else "removing ") + path,
                      file=sys.stderr)
                if not args.dry_run:
                    os.remove(path)
                    for side in (path + ".json", path + ".meta"):
                        if os.path.exists(side):
                            os.remove(side)
        return

    if args.cmd in ("shard_docs", "count_docs", "split_train_valid_docs"):
        # documents separated by a single empty line (reference scripts)
        def docs(path):
            doc = []
            with open(path, encoding="utf-8") as f:
                for line in f:
                    if line.strip() == "":
                        if doc:
                            yield doc
                        doc = []
                    else:
                        doc.append(line)
            if doc:
                yield doc

        if args.cmd == "count_docs":
            n = lines = toks = 0
            for d in docs(args.input):
                n += 1
                lines += len(d)
                toks += sum(len(l.split()) for l in d)
            print(f"docs {n} | avg lines/doc {lines / max(n,1):.2f} | "
                  f"avg tokens/doc {toks / max(n,1):.2f}")
        elif args.cmd == "shard_docs":
            assert args.num_shards > 1
            outs = [open(f"{args.input}.shard{i}", "w", encoding="utf-8")
                    for i in range(args.num_shards)]
            try:
                for i, d in enumerate(docs(args.input)):
                    o = outs[i % args.num_shards]
                    o.writelines(d)
                    o.write("\n")
            finally:
                for o in outs:
                    o.close()
        else:
            valid_every = max(int(1.0 / max(args.valid_percent, 1e-9)), 2)
            with open(args.input + ".train", "w", encoding="utf-8") as tr, \
                 open(args.input + ".valid", "w", encoding="utf-8") as va:
                for i, d in enumerate(docs(args.input)):
                    o = va if i % valid_every == 0 else tr
                    o.writelines(d)
                    o.write("\n")
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

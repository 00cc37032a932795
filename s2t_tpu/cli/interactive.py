"""Interactive decoding REPL (reference: fairseq_cli/interactive.py:108; for
S2T the input lines are audio paths — tasks/speech_to_text.py:545-552)."""

from __future__ import annotations

import logging
import sys

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("s2t_tpu.interactive")


def encode_line(task, line: str):
    """Build a 1-sentence batch from an input line (audio path or text)."""
    from s2t_tpu.data.dataset import load_waveform
    from s2t_tpu.data.audio.fbank import fbank_numpy

    if hasattr(task, "data_cfg") and hasattr(task.data_cfg, "input_feat_per_channel"):
        path = line.strip()
        if path.endswith((".npy",)):
            feats = np.load(path)
        else:
            wave = load_waveform(path, root="")
            feats = fbank_numpy(wave, num_mel_bins=task.data_cfg.input_feat_per_channel)
        return {
            "features": jnp.asarray(feats[None]),
            "feat_lengths": jnp.asarray([feats.shape[0]]),
        }
    # text task; with generation.constraints set, the input line may carry
    # tab-separated constraint phrases after the source sentence
    # (reference: fairseq_cli/interactive.py --constraints input format)
    constraints = None
    if getattr(task.cfg.generation, "constraints", None) and "\t" in line:
        parts = line.rstrip("\n").split("\t")
        line = parts[0]
        phrases = [p for p in parts[1:] if p.strip()]
        if phrases:
            from s2t_tpu.inference.constrained import pack_constraints

            ids = [
                [int(t) for t in task.tgt_dict.encode_line(
                    task.bpe.encode_line(p) if getattr(task, "bpe", None) else p,
                    append_eos=False,
                )]
                for p in phrases
            ]
            constraints = jnp.asarray(
                pack_constraints([ids], pad_id=task.tgt_dict.pad())
            )
    toks = task.src_dict.encode_line(
        task.src_bpe.encode_line(line) if task.src_bpe else line
    )
    batch = {
        "src_tokens": jnp.asarray(toks[None].astype(np.int32)),
        "src_lengths": jnp.asarray([len(toks)]),
    }
    if constraints is not None:
        batch["constraints"] = constraints
    return batch


def main(cfg, params, lines=None, task=None):
    from s2t_tpu.tasks import setup_task

    task = task or setup_task(cfg)
    model = task.build_model()
    generator = task.build_generator(model)
    src = lines if lines is not None else sys.stdin
    outputs = []
    for line in src:
        if not line.strip():
            continue
        batch = encode_line(task, line)
        tokens, scores, _ = generator.generate(params, batch)
        hyp = task.decode_tokens(np.asarray(tokens)[0, 0])
        print(f"H-\t{float(np.asarray(scores)[0, 0]):.4f}\t{hyp}")
        outputs.append(hyp)
    return outputs


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

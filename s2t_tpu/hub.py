"""Hub API: one-call loading of a trained model for interactive use.

(reference: fairseq/hub_utils.py:298 GeneratorHubInterface + hubconf.py —
`model = from_pretrained(...); model.translate("...")`.)

Usage:
    from s2t_tpu.hub import from_pretrained
    m = from_pretrained("ckpt/checkpoint_best.pt", data_dir="data/mustc")
    m.translate("audio.wav")              # speech task: path input
    m.translate("ein satz .")             # text task: raw text
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, List, Optional

import numpy as np


class GeneratorHub:
    def __init__(self, cfg, task, model, params, generator):
        self.cfg = cfg
        self.task = task
        self.model = model
        self.params = params
        self.generator = generator

    def _speech_batch(self, paths: List[str]):
        from s2t_tpu.data.dataset import load_features, load_waveform

        feats = []
        for p in paths:
            if self.task.data_cfg.use_audio_input:
                feats.append(load_waveform(p))
            elif p.endswith(".npy"):
                feats.append(load_features(p))
            else:  # raw wav -> host fbank
                from s2t_tpu.data.audio.fbank import fbank_numpy

                feats.append(fbank_numpy(load_waveform(p)))
        T = max(f.shape[0] for f in feats)
        D = feats[0].shape[1] if feats[0].ndim > 1 else 1
        import numpy as np

        shape = (len(feats), T, D) if feats[0].ndim > 1 else (len(feats), T)
        arr = np.zeros(shape, np.float32)
        lens = np.zeros((len(feats),), np.int32)
        for i, f in enumerate(feats):
            arr[i, : f.shape[0]] = f
            lens[i] = f.shape[0]
        return {"features": arr, "feat_lengths": lens}

    def _text_batch(self, lines: List[str]):
        src_dict = getattr(self.task, "src_dict", self.task.tgt_dict)
        bpe = getattr(self.task, "src_bpe", None) or getattr(self.task, "bpe", None)
        import numpy as np

        enc = []
        for l in lines:
            if bpe is not None:
                l = bpe.encode_line(l)
            enc.append(src_dict.encode_line(l, append_eos=True))
        S = max(len(e) for e in enc)
        arr = np.full((len(enc), S), src_dict.pad(), np.int32)
        lens = np.zeros((len(enc),), np.int32)
        for i, e in enumerate(enc):
            arr[i, : len(e)] = e
            lens[i] = len(e)
        return {"src_tokens": arr, "src_lengths": lens}

    def generate(self, inputs: List[str]) -> List[str]:
        from s2t_tpu.tasks.speech_to_text import SpeechToTextTask

        if isinstance(self.task, SpeechToTextTask):
            batch = self._speech_batch(inputs)
        else:
            batch = self._text_batch(inputs)
        tokens, scores, _ = self.generator.generate(self.params, batch)
        toks = np.asarray(tokens)[:, 0]
        return [self.task.decode_tokens(toks[b]) for b in range(len(inputs))]

    def translate(self, text: str) -> str:
        return self.generate([text])[0]

    transcribe = translate


def from_pretrained(
    checkpoint: str | Path,
    data_dir: Optional[str] = None,
    config: Optional[dict] = None,
    **overrides,
) -> GeneratorHub:
    """Load checkpoint (+json sidecar model config) and build a generator."""
    import jax

    from s2t_tpu.config import TrainConfig, apply_overrides, from_dict
    from s2t_tpu.tasks import setup_task
    from s2t_tpu.utils.checkpoint import load_checkpoint

    tree, meta = load_checkpoint(checkpoint)
    d = dict(config or {})
    if "model" in meta and "model" not in d:
        d["model"] = meta["model"]
    cfg = from_dict(TrainConfig, d)
    if data_dir:
        cfg.dataset.data = str(data_dir)
    for k, v in overrides.items():
        setattr(cfg.generation, k, v)
    task = setup_task(cfg)
    model = task.build_model()
    params = tree["params"] if "params" in tree else tree
    generator = task.build_generator(model)
    return GeneratorHub(cfg, task, model, params, generator)

"""Benchmark: MuST-C-like ST generation throughput on one chip.

Prints ONE JSON line:
  {"metric": "rtf_beam5_s2t_transformer_s", "value": <RTF>, "unit":
   "x_realtime", "vs_baseline": <RTF / 10>}

Workload: s2t_transformer_s-equivalent (256d, 12 enc / 6 dec layers, 10k
vocab), batch of ~10 s utterances (1000 fbank frames), beam 5, max 100 decode
steps — the reference's MuST-C tst-COMMON decode regime (egs/mustc/st/run.sh
beam 5 lenpen 1.0).  RTF = audio-seconds decoded per wall-second (frames are
10 ms).  Baseline: the north-star target of 10x realtime vs CPU
fairseq-generate (BASELINE.json); vs_baseline = RTF / 10.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from s2t_tpu.models.s2t_transformer import s2t_transformer_s, S2TTransformerModel
    from s2t_tpu.inference.generator import SequenceGenerator

    B, T, N_BATCHES = 16, 1000, 4  # 16 utts x 10 s
    VOCAB = 10000
    BEAM, MAX_LEN = 5, 100

    cfg = s2t_transformer_s(
        vocab_size=VOCAB,
        dtype_str="bfloat16",
        max_target_positions=1024,
    )
    model = S2TTransformerModel(cfg)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), feats, lens, jnp.zeros((B, 4), jnp.int32)
    )["params"]

    gen = SequenceGenerator(
        model, beam_size=BEAM, max_len_a=0.0, max_len_b=MAX_LEN, lenpen=1.0
    )

    # warmup / compile (np.asarray forces completion — block_until_ready does
    # not reliably block on remote-tunnelled backends)
    tokens, scores, _ = gen.generate(params, {"features": feats, "feat_lengths": lens})
    np.asarray(tokens)

    batches = [
        jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
        for _ in range(N_BATCHES)
    ]
    t0 = time.perf_counter()
    for f in batches:
        tokens, scores, _ = gen.generate(params, {"features": f, "feat_lengths": lens})
        np.asarray(tokens)
    wall = time.perf_counter() - t0

    n_utts = B * N_BATCHES
    audio_seconds = n_utts * T * 0.01
    rtf = audio_seconds / wall
    out = {
        "metric": "rtf_beam5_s2t_transformer_s",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 3),
        "extra": {
            "utts_per_sec": round(n_utts / wall, 2),
            "wall_s": round(wall, 3),
            "batch": B,
            "beam": BEAM,
            "frames": T,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Quick serving-RTF check for the decode loop on the real chip.

Usage: python tools/rtf_check.py [batch] [beam]

Decode-loop changes MUST be validated with this end-to-end number, not op
microbenchmarks: the beam scan's donated cache carry lets XLA alias the
take_along_axis reorder in place, so forms that win in isolation (flat-row
gather, two-stage top-k) have lost 25-40% in context.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from s2t_tpu.inference.generator import SequenceGenerator
    from s2t_tpu.models.s2t_transformer import (
        S2TTransformerModel, s2t_transformer_s,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    beam = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    kv = sys.argv[3] if len(sys.argv) > 3 else "model"
    lazy = kv == "lazy"  # lazy ancestry reorder (fp cache)
    if lazy:
        kv = "model"
    T, N, VOCAB, MAX_LEN = 1000, 2, 10000, 100
    cfg = s2t_transformer_s(
        vocab_size=VOCAB, dtype_str="bfloat16", max_target_positions=1024
    )
    model = S2TTransformerModel(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), feats, lens, jnp.zeros((B, 4), jnp.int32)
    )["params"]
    gen = SequenceGenerator(
        model, beam_size=beam, max_len_a=0.0, max_len_b=MAX_LEN, lenpen=1.0,
        kv_cache_dtype=kv, lazy_beam_reorder=lazy,
    )
    toks, _, _ = gen.generate(params, {"features": feats, "feat_lengths": lens})
    np.asarray(toks)  # compile + warm
    batches = [
        jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
        for _ in range(N)
    ]
    for f in batches:
        np.asarray(f[0, 0, 0])  # finish uploads before timing
    t0 = time.perf_counter()
    for f in batches:
        toks, _, _ = gen.generate(params, {"features": f, "feat_lengths": lens})
        np.asarray(toks)
    wall = time.perf_counter() - t0
    print(
        f"RTF {B * N * T * 0.01 / wall:.1f}x realtime | "
        f"{B * N / wall:.1f} utt/s | wall {wall:.2f}s | B={B} beam={beam} "
        f"kv={kv} lazy={lazy}"
    )


if __name__ == "__main__":
    main()

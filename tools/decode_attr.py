"""Attribute beam-decode device time (the bench headline) by op.

Usage: python tools/decode_attr.py [B beam] — traces one generate() call at
the bench shape and prints top self-time ops from the xplane.
"""
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from s2t_tpu.inference.generator import SequenceGenerator
from s2t_tpu.models.s2t_transformer import S2TTransformerModel, s2t_transformer_s

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
beam = int(sys.argv[2]) if len(sys.argv) > 2 else 5
T, VOCAB, MAX_LEN = 1000, 10000, 100
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
    model, beam_size=beam, max_len_a=0.0, max_len_b=MAX_LEN, lenpen=1.0
)
toks, _, _ = gen.generate(params, {"features": feats, "feat_lengths": lens})
np.asarray(toks)  # warm
logdir = "/tmp/s2t_decode_prof"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    toks, _, _ = gen.generate(params, {"features": feats, "feat_lengths": lens})
    np.asarray(toks)
print("trace captured", flush=True)

from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
space = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    space.ParseFromString(f.read())

self_tot = collections.Counter()
info = {}
for plane in space.planes:
    if "TPU" not in plane.name:
        continue
    smeta = {k: v.name for k, v in plane.stat_metadata.items()}
    for mid, md in plane.event_metadata.items():
        tf_op = cat = shape = ""
        for s in md.stats:
            nm = smeta.get(s.metadata_id, "")
            if nm == "tf_op":
                tf_op = s.str_value
            elif nm == "hlo_category":
                cat = s.str_value
            elif nm == "shape_with_layout":
                shape = s.str_value
        info[mid] = (md.name, tf_op, cat, shape)
    for line in plane.lines:
        if "XLA Ops" not in line.name:
            continue
        evs = sorted(
            ((e.offset_ps, e.duration_ps, e.metadata_id) for e in line.events),
            key=lambda t: (t[0], -t[1]),
        )
        stack = []
        def close(fr):
            self_tot[fr[1]] += max(fr[3] - fr[2], 0)
        for off, dur, mid in evs:
            while stack and stack[-1][0] <= off:
                close(stack.pop())
            if stack:
                stack[-1][2] += dur
            stack.append([off + dur, mid, 0, dur])
        while stack:
            close(stack.pop())

total = sum(ps for mid, ps in self_tot.items()
            if not info[mid][2].endswith(("-start", "-done")))
print(f"\n== decode: top sync ops (total {total/1e9:.1f} ms) ==")
shown = 0
for mid, ps in self_tot.most_common(100):
    nm, tf_op, cat, shape = info[mid]
    if cat.endswith(("-start", "-done")):
        continue
    print(f"{ps/1e9:8.2f} ms {cat:<14.14s} {shape[:46]:<46} {tf_op[-60:]}")
    shown += 1
    if shown >= 28:
        break

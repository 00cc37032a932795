"""Attribute m-model train-step device time to model components using the
xplane trace's own per-op stats (tf_op = jax op_name path, hlo_category,
shape_with_layout).  Prints ms/step by component and the top single ops.

Usage: python tools/step_attr.py [existing_trace_dir]
(captures a fresh trace when no dir is given)
"""
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
logdir = sys.argv[1] if len(sys.argv) > 1 else None

if logdir is None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from s2t_tpu.config import OptimizationConfig
    from s2t_tpu.criterions import build_criterion
    from s2t_tpu.registry import ARCHS
    from s2t_tpu.models.s2t_transformer import S2TTransformerModel
    from s2t_tpu.trainer import Trainer

    B, T, U, VOCAB = 40, 1000, 30, 10000
    name, preset = ARCHS.get("s2t_transformer_m")
    cfg = preset(vocab_size=VOCAB, dtype_str="bfloat16", max_target_positions=1024)
    model = S2TTransformerModel(cfg)
    criterion = build_criterion(
        "label_smoothed_cross_entropy_with_ctc", {"ctc": {"ctc_weight": 0.3}}
    )
    trainer = Trainer(
        model, criterion,
        OptimizationConfig(lr=2e-3, warmup_updates=10000, clip_norm=10.0),
    )
    rng = np.random.default_rng(0)
    targets = rng.integers(4, VOCAB, size=(B, U)).astype(np.int32)
    targets[:, -1] = 2
    prev = np.roll(targets, 1, 1)
    prev[:, 0] = 2
    batch = {
        "features": jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32)),
        "feat_lengths": jnp.full((B,), T, jnp.int32),
        "prev_tokens": jnp.asarray(prev),
        "target": jnp.asarray(targets),
        "transcript": jnp.asarray(targets[:, :-1]),
        "transcript_lengths": jnp.full((B,), U - 1, jnp.int32),
        "ntokens": float(B * U),
    }
    state = trainer.init_state(batch)
    one = trainer._make_train_step(1)

    @jax.jit
    def run_k(state, batch, rng):
        def body(i, carry):
            s, _ = carry
            s2, m = one(s, batch, jax.random.fold_in(rng, i))
            return (s2, m["loss"].astype(jnp.float32))
        _, loss = jax.lax.fori_loop(0, K, body, (state, jnp.zeros((), jnp.float32)))
        return loss

    float(run_k(state, batch, trainer.base_rng))  # warm (float = true sync)
    logdir = "/tmp/s2t_attr"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        float(run_k(state, batch, trainer.base_rng))
    print("trace captured", flush=True)

from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
assert paths, f"no xplane.pb under {logdir}"
space = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    space.ParseFromString(f.read())

self_tot = collections.Counter()   # metadata_id -> self ps
info = {}                          # metadata_id -> (name, tf_op, category, shape)
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
            ((ev.offset_ps, ev.duration_ps, ev.metadata_id)
             for ev in line.events),
            key=lambda t: (t[0], -t[1]),
        )
        stack = []
        def close(fr):
            end, mid, child, dur = fr
            self_tot[mid] += max(dur - child, 0)
        for off, dur, mid in evs:
            while stack and stack[-1][0] <= off:
                close(stack.pop())
            if stack:
                stack[-1][2] += dur
            stack.append([off + dur, mid, 0, dur])
        while stack:
            close(stack.pop())


def bucket(tf_op: str, cat: str) -> str:
    if cat in ("copy-start", "copy-done", "slice-start", "slice-done",
               "async-start", "async-done"):
        return "(async DMA)"
    if not tf_op:
        return f"(?){cat}"
    d = "bwd" if "transpose(jvp" in tf_op else "fwd"
    low = tf_op.lower()
    parts = tf_op.split("/")
    comp = "other"
    for i, p in enumerate(parts):
        if p in ("encoder", "decoder"):
            comp = p
            rest = "/".join(parts[i + 1:]).lower()
            for kw, sub in (
                ("subsample", "subsample"), ("ctc_head", "ctc_head"),
                ("self_attn", "self_attn"), ("cross_attn", "cross_attn"),
                ("fc1", "ffn"), ("fc2", "ffn"), ("norm", "norm"),
                ("embed", "embed"), ("out_proj", "out_proj"),
                ("dropout", "dropout"),
            ):
                if kw in rest:
                    comp = f"{p}.{sub}"
                    break
            break
    if comp == "other":
        for kw, lab in (
            ("ctc", "ctc_loss"), ("adam", "optimizer"), ("opt", "optimizer"),
            ("norm", "grad_norm"),
            ("log_softmax", "ce_loss"), ("nll", "ce_loss"),
        ):
            if kw in low:
                comp = lab
                break
    return f"{d}:{comp}"


by_bucket = collections.Counter()
total = 0
for mid, ps in self_tot.items():
    nm, tf_op, cat, shape = info.get(mid, ("?", "", "", ""))
    by_bucket[bucket(tf_op, cat)] += ps
    total += ps

print(f"\n== self time by component (/{K} steps) ==")
for b, ps in by_bucket.most_common(50):
    print(f"{ps/1e9/K:9.3f} ms/step  {ps/total*100:5.1f}%  {b}")
print(f"{total/1e9/K:9.3f} ms/step  total (incl async self-time)")

print("\n== top 35 single ops ==")
for mid, ps in self_tot.most_common(35):
    nm, tf_op, cat, shape = info.get(mid, ("?", "", "", ""))
    short = nm.split(" = ")[0]
    print(f"{ps/1e9/K:8.3f} ms  {cat:<12.12s} {short[:28]:<28} {tf_op[-70:]}")

print("\n== async copies by shape ==")
copies = collections.Counter()
for mid, ps in self_tot.items():
    nm, tf_op, cat, shape = info.get(mid, ("?", "", "", ""))
    if cat in ("copy-start", "slice-start", "async-start"):
        copies[shape or nm.split(" = ")[0]] += ps
for sh, ps in copies.most_common(25):
    print(f"{ps/1e9/K:8.3f} ms  {sh[:110]}")

"""Capture a jax.profiler trace of the m-model train step and print the
top self-time ops (xprof tool conversion)."""
import os, sys, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from s2t_tpu.config import OptimizationConfig
from s2t_tpu.criterions import build_criterion
from s2t_tpu.registry import ARCHS
from s2t_tpu.models.s2t_transformer import S2TTransformerModel
from s2t_tpu.trainer import Trainer

B, T, U, VOCAB = 40, 1000, 30, 10000
name, preset = ARCHS.get("s2t_transformer_m")
cfg = preset(vocab_size=VOCAB, dtype_str="bfloat16", max_target_positions=1024)
model = S2TTransformerModel(cfg)
criterion = build_criterion("label_smoothed_cross_entropy_with_ctc", {"ctc": {"ctc_weight": 0.3}})
trainer = Trainer(model, criterion, OptimizationConfig(lr=2e-3, warmup_updates=10000, clip_norm=10.0))
rng = np.random.default_rng(0)
targets = rng.integers(4, VOCAB, size=(B, U)).astype(np.int32); targets[:, -1] = 2
prev = np.roll(targets, 1, 1); prev[:, 0] = 2
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
K = 10

@jax.jit
def run_k(state, batch, rng):
    def body(i, carry):
        s, _ = carry
        s2, m = one(s, batch, rng)
        return (s2, m["loss"])
    _, loss = jax.lax.fori_loop(0, K, body, (state, jnp.zeros((), jnp.float32)))
    return loss

np.asarray(run_k(state, batch, trainer.base_rng))  # warm
logdir = "/tmp/s2t_prof"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    np.asarray(run_k(state, batch, trainer.base_rng))
print("trace captured")

# convert to op stats
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print(xplanes)
for tool in ("framework_op_stats^", "op_profile^"):
    try:
        data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
        out = f"/tmp/prof_{tool.strip('^')}.out"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print("wrote", out)
    except Exception as e:
        print(tool, "failed:", e)

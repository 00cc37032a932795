"""Decompose m-model train-step DEVICE time via K-fused fori_loop dispatches
(single dispatch per measurement — per-call tunnel latency excluded)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from s2t_tpu.config import OptimizationConfig
from s2t_tpu.criterions import build_criterion
from s2t_tpu.registry import ARCHS
from s2t_tpu.models.s2t_transformer import S2TTransformerModel
from s2t_tpu.trainer import Trainer

B, T, U, VOCAB = 40, 1000, 30, 10000
K = 20
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
params = state.params
key = jax.random.PRNGKey(0)

def loop_time(make_body, label, n_outer=2):
    @jax.jit
    def runk(*args):
        def body(i, acc):
            return acc + make_body(i, *args)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    out = runk(*loop_args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(n_outer):
        t0 = time.perf_counter()
        jax.block_until_ready(runk(*loop_args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:38s} {best / K * 1000:8.2f} ms/step")

# fwd only
loop_args = (params, batch, key)
def body_fwd(i, params, batch, rng):
    l, _ = trainer._loss_fn(params, batch, jax.random.fold_in(rng, i))
    return l.astype(jnp.float32)
loop_time(body_fwd, "forward+loss")

def body_fwdbwd(i, params, batch, rng):
    (l, _), g = jax.value_and_grad(trainer._loss_fn, has_aux=True)(
        params, batch, jax.random.fold_in(rng, i))
    # consume grads so they aren't DCE'd
    s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)[:4])
    return l.astype(jnp.float32) + 0.0 * s
loop_time(body_fwdbwd, "forward+backward")

def body_noctc(i, params, batch, rng):
    # model fwd+bwd through CE only (ctc weight off via criterion switch)
    def lf(p):
        out = model.apply({"params": p}, batch["features"], batch["feat_lengths"],
                          batch["prev_tokens"], deterministic=False,
                          rngs={"dropout": jax.random.fold_in(rng, i)})
        from s2t_tpu.criterions.label_smoothed_ce import label_smoothed_nll_loss
        l, _ = label_smoothed_nll_loss(out["decoder_logits"], batch["target"], 0.1, 1)
        # keep ctc head in the graph but cheap: sum of logits
        return l.astype(jnp.float32) + 0.0 * jnp.sum(out["ctc_logits"].astype(jnp.float32))
    l, g = jax.value_and_grad(lf)(params)
    s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)[:4])
    return l + 0.0 * s
loop_time(body_noctc, "fwd+bwd w/o CTC loss (CE only)")


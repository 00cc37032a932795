"""Finer m-model step decomposition: full-grad backward, dropout on/off,
optimizer-only — K-fused fori_loop dispatches (tunnel latency excluded)."""
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
key = trainer.base_rng


def timeit(fn, args, label, n_outer=3):
    # float() forces a device->host read: block_until_ready does NOT
    # reliably sync through the axon tunnel (measured: dense attention
    # "0.0 ms" with it, 45 ms with a host read)
    out = fn(*args)
    out = jax.tree.leaves(out)[0]
    float(jnp.sum(out)) if out.ndim else float(out)
    best = 1e9
    for _ in range(n_outer):
        t0 = time.perf_counter()
        o = jax.tree.leaves(fn(*args))[0]
        float(jnp.sum(o)) if o.ndim else float(o)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best / K * 1000:8.2f} ms/step")


def fold(i):
    return jax.random.fold_in(key, i)


# 1. forward+loss, training mode (dropout on)
@jax.jit
def fwd_train(params, batch):
    def body(i, acc):
        l, _ = trainer._loss_fn(params, batch, fold(i))
        return acc + l.astype(jnp.float32)
    return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))


# 2. forward+loss, deterministic
@jax.jit
def fwd_det(params, batch):
    from s2t_tpu.criterions.label_smoothed_ce import label_smoothed_nll_loss
    def body(i, acc):
        out = model.apply({"params": params}, batch["features"], batch["feat_lengths"],
                          batch["prev_tokens"], deterministic=True)
        l, _ = label_smoothed_nll_loss(out["decoder_logits"], batch["target"], 0.1, 1)
        return acc + l.astype(jnp.float32)
    return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))


# 3. fwd+bwd consuming ALL grads (sum into a scalar so nothing is DCE'd)
@jax.jit
def fwdbwd_all(params, batch):
    def body(i, acc):
        (l, _), g = jax.value_and_grad(trainer._loss_fn, has_aux=True)(
            params, batch, fold(i))
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g))
        return acc + l.astype(jnp.float32) + 0.0 * s
    return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))


# 4. full train step
one = trainer._make_train_step(1)
@jax.jit
def full_step(state, batch):
    def body(i, carry):
        s, _ = carry
        s2, m = one(s, batch, fold(i))
        return (s2, m["loss"])
    _, loss = jax.lax.fori_loop(0, K, body, (state, jnp.zeros((), jnp.float32)))
    return loss


timeit(fwd_det, (params, batch), "forward (deterministic, CE only)")
timeit(fwd_train, (params, batch), "forward+loss (train dropout)")
timeit(fwdbwd_all, (params, batch), "fwd+bwd ALL grads")
timeit(full_step, (state, batch), "full train step")


# 5. forward train-mode (dropout ON) but CE loss only — no CTC loss
@jax.jit
def fwd_train_ce(params, batch):
    from s2t_tpu.criterions.label_smoothed_ce import label_smoothed_nll_loss
    def body(i, acc):
        out = model.apply({"params": params}, batch["features"], batch["feat_lengths"],
                          batch["prev_tokens"], deterministic=False,
                          rngs={"dropout": fold(i)})
        l, _ = label_smoothed_nll_loss(out["decoder_logits"], batch["target"], 0.1, 1)
        return acc + l.astype(jnp.float32) + 0.0 * jnp.sum(out["ctc_logits"].astype(jnp.float32))
    return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))


# 6. deterministic forward + full CTC+CE loss (no dropout, full criterion)
@jax.jit
def fwd_det_full(params, batch):
    def body(i, acc):
        out = model.apply({"params": params}, batch["features"], batch["feat_lengths"],
                          batch["prev_tokens"], deterministic=True)
        l = criterion(out, batch)[0]
        return acc + l.astype(jnp.float32)
    return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

timeit(fwd_train_ce, (params, batch), "forward train dropout, CE only")
timeit(fwd_det_full, (params, batch), "forward deterministic, CTC+CE loss")


# 7. loop-VARIANT deterministic forward (features perturbed by i so XLA
# cannot hoist the body out of the fori_loop) — the true fwd time
@jax.jit
def fwd_det_var(params, batch):
    from s2t_tpu.criterions.label_smoothed_ce import label_smoothed_nll_loss
    def body(i, acc):
        feats = batch["features"] + i.astype(jnp.float32) * 1e-12
        out = model.apply({"params": params}, feats, batch["feat_lengths"],
                          batch["prev_tokens"], deterministic=True)
        l, _ = label_smoothed_nll_loss(out["decoder_logits"], batch["target"], 0.1, 1)
        return acc + l.astype(jnp.float32) + 0.0 * jnp.sum(out["ctc_logits"].astype(jnp.float32))
    return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))


# 8. loop-variant det forward + full criterion (CTC fwd cost on top of 7)
@jax.jit
def fwd_det_full_var(params, batch):
    def body(i, acc):
        feats = batch["features"] + i.astype(jnp.float32) * 1e-12
        out = model.apply({"params": params}, feats, batch["feat_lengths"],
                          batch["prev_tokens"], deterministic=True)
        l = criterion(out, batch)[0]
        return acc + l.astype(jnp.float32)
    return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

timeit(fwd_det_var, (params, batch), "fwd det loop-variant, CE only")
timeit(fwd_det_full_var, (params, batch), "fwd det loop-variant, CTC+CE")

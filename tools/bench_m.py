"""m-model 40k-frame training-step bench with XLA cost analysis."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from s2t_tpu.config import OptimizationConfig
from s2t_tpu.criterions import build_criterion
from s2t_tpu.models.s2t_transformer import S2TTransformerModel
from s2t_tpu.registry import ARCHS
from s2t_tpu.trainer import Trainer

arch = sys.argv[1] if len(sys.argv) > 1 else "s2t_transformer_m"
B, T, U, VOCAB = 40, 1000, 30, 10000
name, preset = ARCHS.get(arch)
cfg = preset(vocab_size=VOCAB, dtype_str="bfloat16", max_target_positions=1024)
model = S2TTransformerModel(cfg)
criterion = build_criterion("label_smoothed_cross_entropy_with_ctc", {"ctc": {"ctc_weight": 0.3}})
trainer = Trainer(model, criterion, OptimizationConfig(lr=2e-3, warmup_updates=10000, clip_norm=10.0))
rng = np.random.default_rng(0)
targets = rng.integers(4, VOCAB, size=(B, U)).astype(np.int32)
targets[:, -1] = 2
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
K = 20
one = trainer._make_train_step(1)

@jax.jit
def run_k(state, batch, rng):
    def body(i, carry):
        s, _ = carry
        s2, m = one(s, batch, rng)
        return (s2, m["loss"])
    _, loss = jax.lax.fori_loop(0, K, body, (state, jnp.zeros((), jnp.float32)))
    return loss

np.asarray(run_k(state, batch, trainer.base_rng))
t0 = time.perf_counter()
np.asarray(run_k(state, batch, trainer.base_rng))
wall = time.perf_counter() - t0
sps = K / wall
cost = jax.jit(one).lower(state, batch, jax.random.PRNGKey(0)).compile()
an = cost.cost_analysis()
if isinstance(an, list): an = an[0]
executed = float(an.get("flops", 0.0))
bytes_ = float(an.get("bytes accessed", 0.0))
from s2t_tpu.utils.flops import s2t_train_flops
flops = s2t_train_flops(
    B, T, U, d_model=cfg.encoder_embed_dim, ffn=cfg.encoder_ffn_embed_dim,
    enc_layers=cfg.encoder_layers, dec_layers=cfg.decoder_layers, vocab=VOCAB)
dev = str(jax.devices()[0]).lower()
peak = 197e12
print(f"arch={arch} B={B} T={T} steps/s={sps:.3f} ms/step={1000/sps:.2f}")
print(f"model flops/step={flops:.3e} executed={executed:.3e} bytes/step={bytes_:.3e} MFU={flops*sps/peak:.4f}")
print(f"HBM BW use={bytes_*sps/1e9:.1f} GB/s (v5e peak ~819)")

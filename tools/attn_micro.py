"""Attention-core microbench at the m-model shape: XLA dense vs Pallas fused,
fwd+bwd, K-fused fori_loop (no per-call tunnel latency).

Usage: python tools/attn_micro.py [B T H D rate]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

B, T, H, D = 40, 250, 8, 64
rate = 0.15
if len(sys.argv) > 4:
    B, T, H, D = map(int, sys.argv[1:5])
if len(sys.argv) > 5:
    rate = float(sys.argv[5])
K = 50

key = jax.random.key(0, impl="rbg")
q = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
k = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
v = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
valid = jnp.ones((B, T), bool)
scale = 1.0 / np.sqrt(D)


def dense_core(q, k, v, rng):
    s = jnp.einsum("bthd,bshd->bhts", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    if rate > 0:
        kthr = int(round(rate * 256))
        bits = jax.random.bits(rng, p.shape, dtype=jnp.uint8)
        p = jnp.where(bits >= jnp.uint8(kthr), p / (1 - kthr / 256), 0)
    return jnp.einsum("bhts,bshd->bthd", p, v)


def fused_core(q, k, v, rng):
    from s2t_tpu.ops.attention_pallas import fused_attention
    return fused_attention(q, k, v, valid, rate, rng)


def bench(core, label):
    # marginal cost per call via the K=K1 vs K=K2 slope: a jitted fori_loop
    # dispatch through the axon tunnel carries ~25 ms of FIXED overhead, so
    # total/K is biased by +25/K ms — the slope cancels it.
    def total_for(KK):
        @jax.jit
        def runk(q, k, v, key):
            def body(i, acc):
                rng = jax.random.fold_in(key, i)
                qi = q * (1.0 + i.astype(jnp.float32) * 1e-3).astype(q.dtype)
                def loss(q, k, v):
                    return jnp.sum(core(q, k, v, rng).astype(jnp.float32))
                l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(qi, k, v)
                return acc + l + sum(jnp.sum(x.astype(jnp.float32)) for x in g) * 1e-20
            return jax.lax.fori_loop(0, KK, body, jnp.zeros((), jnp.float32))
        # float() forces a device->host read: block_until_ready does NOT
        # reliably sync through the axon tunnel (docs/design.md round 3)
        float(runk(q, k, v, key))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(runk(q, k, v, key))
            best = min(best, time.perf_counter() - t0)
        return best
    K1, K2 = 10, K
    ms = (total_for(K2) - total_for(K1)) / (K2 - K1) * 1000
    print(f"{label:28s} B={B} T={T} H={H} D={D} rate={rate}  {ms:8.3f} ms/call (fwd+bwd)")
    return ms


d = bench(dense_core, "dense XLA")
f = bench(fused_core, "pallas fused")
print(f"speedup dense/fused = {d/f:.2f}x")

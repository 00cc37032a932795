"""Multi-head attention zoo with explicit functional KV caches.

Replaces the reference attention variants (fairseq/modules/
multihead_attention.py:643, espnet_multihead_attention.py:23-576 incl. rotary,
rel_position_multihead_attention.py) with a single flax module family.

TPU design:
  * one fused QKV projection where possible — bigger matmuls for the MXU
  * attention bias is an additive float mask computed once per batch
  * incremental decoding uses an *explicit* cache pytree (k, v arrays of
    static shape (B, T_max, H, Dh) + an index) threaded through lax.scan —
    never flax mutable state, so beam reorder is a plain gather
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.positional import apply_rope, rope_tables
from s2t_tpu.modules.dropout import Dropout as _FastDropout

NEG = -1e9


def attention_suppression(scores: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Mask attention keys whose probability falls ``scale`` standard
    deviations below the per-query mean (reference:
    speech_to_text/utils.py:524-559 — the augmented-memory streaming
    robustness trick).  scores: (..., Tk) pre-softmax."""
    prob = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    nonzero = prob > 0
    n = jnp.sum(nonzero.astype(jnp.float32), axis=-1, keepdims=True)
    mean = jnp.sum(prob, axis=-1, keepdims=True) / (n + 1e-8)
    dis = jnp.where(nonzero, (prob - mean) ** 2, 0.0)
    std = jnp.sqrt(jnp.sum(dis, axis=-1, keepdims=True) / (n - 1.0 + 1e-8))
    thr = mean - scale * std
    return jnp.where(prob < thr, NEG, scores.astype(jnp.float32)).astype(
        scores.dtype
    )


def dot_attention_weights(q, k, bias, dtype, std_scale: float = 0.0):
    """q: (B, Tq, H, Dh), k: (B, Tk, H, Dh), bias: (B, 1|H, Tq, Tk) additive.

    The softmax stays in f32 (the (B, H, T, T) store is bf16 either way —
    XLA fuses the convert; measured only 0.35 ms/step on the m-model to
    drop the upcast, not worth the numerics)."""
    depth = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(depth).astype(q.dtype)
    if bias is not None:
        scores = scores + bias
    if std_scale > 0:
        scores = attention_suppression(scores, std_scale)
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)


def _attn_core(q, k, v, bias, key, k_u8):
    """scores -> masked softmax -> (regen) dropout -> PV, checkpointed with
    nothing saved: the backward recomputes the whole core from q/k/v/bias
    instead of storing (B, H, Tq, Tk)-shaped residuals across fwd->bwd —
    the dense-path equivalent of the Pallas kernel's in-VMEM recompute
    (ops/attention_pallas.py), at XLA's own layouts.  Dropout draws the
    identical uint8 bits on recompute (same key), keeping modules/dropout.py
    threshold semantics."""
    w = dot_attention_weights(q, k, bias, q.dtype)
    if key is not None:
        bits = jax.random.bits(key, w.shape, dtype=jnp.uint8)
        scale = jnp.asarray(1.0 / (1.0 - k_u8 / 256.0), w.dtype)
        w = jnp.where(bits >= jnp.uint8(k_u8), w * scale, 0)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


_attn_core_remat = jax.checkpoint(
    _attn_core,
    policy=jax.checkpoint_policies.nothing_saveable,
    static_argnums=(5,),
)


def _attn_remat_enabled() -> bool:
    import os

    return os.environ.get("S2T_ATTN_REMAT", "0") not in ("0", "false")


class MultiHeadAttention(nn.Module):
    """Standard / rotary multi-head attention.

    attention_type: "abs" (plain dot-product) or "rope" (rotary on q,k).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    attention_type: str = "abs"
    max_positions: int = 4096
    # sequence parallelism: self-attention over a T axis sharded on the
    # mesh "seq" axis via ring ppermute (no reference equivalent; SURVEY §7)
    seq_parallel: bool = False
    # reduced attention: subsample keys/values by this stride (reference:
    # fairseq/modules/reduced_multihead_attention.py downsampled-KV variant)
    kv_stride: int = 1
    # suppress outlier-weak keys: mask keys whose attention prob is more
    # than this many stds below the per-query mean (reference
    # augmented_memory_attention.py std_scale); 0 = off
    attention_std_scale: float = 0.0
    # sow the attention probabilities into the "intermediates" collection
    # when applied mutably.  Only decoder CROSS attention sets this (the
    # alignment/latency consumers need exactly that); encoder self-attention
    # leaving it False keeps mutable-capture passes from materializing every
    # (B, H, T, T) tensor and from disabling the fused kernel (code-review r3)
    sow_attn: bool = False
    # Shaw-style relative attention (attention_type == "relative"): clipped
    # learned relative-key embeddings added to the content score, k_only mode
    # (reference: fairseq/modules/relative_multihead_attention.py:16-57,
    # preset s2t_transformer_s_relative max_encoder_relative_length=100)
    max_relative_length: int = 0
    # Gaussian local attention (attention_type == "local"): per-head
    # learnable sigma and gate mixing a distance-Gaussian attention
    # distribution into the content distribution (reference:
    # modules/local_multihead_attention.py:99-106,326-380 —
    # probs = ((1-σ(w))·softmax(scores) + σ(w)·softmax(-d²/2σ²)) / 2,
    # padded keys zeroed after the mix, no renormalisation)
    gauss_mask_sigma: float = 0.0
    init_mask_weight: float = 0.5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.embed_dim % self.num_heads == 0
        self.head_dim = self.embed_dim // self.num_heads
        self.q_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")
        self.k_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")
        self.v_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")
        self.out_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")
        if self.attention_type == "relative":
            assert self.max_relative_length > 0
            self.relative_position_keys = self.param(
                "relative_position_keys",
                nn.initializers.xavier_uniform(),
                (2 * self.max_relative_length + 1, self.head_dim),
            )
        if self.attention_type == "local" and self.gauss_mask_sigma != 0:
            self.gauss_sigma = self.param(
                "gauss_sigma",
                nn.initializers.constant(self.gauss_mask_sigma),
                (self.num_heads, 1, 1),
            )
            self.gauss_mask_weight = self.param(
                "gauss_mask_weight",
                nn.initializers.constant(self.init_mask_weight),
                (self.num_heads, 1, 1),
            )
        self.drop = _FastDropout(self.dropout)

    def _relative_bias(self, q, key_pos, q_pos):
        """Shaw relative-key score as an additive (B, H, Tq, Tk) bias term
        (pre-scaled by 1/sqrt(Dh) to compose with dot_attention_weights).

        q: (B, Tq, H, Dh); key_pos: (Tk,) absolute key positions;
        q_pos: (Tq,) absolute query positions (a traced scalar-per-row array
        in incremental mode)."""
        L = self.max_relative_length
        dist = jnp.clip(key_pos[None, :] - q_pos[:, None], -L, L) + L  # (Tq, Tk)
        rk = jnp.take(self.relative_position_keys, dist, axis=0)  # (Tq, Tk, Dh)
        rel = jnp.einsum("bqhd,qkd->bhqk", q, rk.astype(q.dtype))
        return rel / jnp.sqrt(self.head_dim).astype(q.dtype)

    def _split(self, x):
        B, T, _ = x.shape
        return x.reshape(B, T, self.num_heads, self.head_dim)

    def _grouped_cross(self, q, k, v, bias, deterministic):
        """Cross-attention with sentence-level K/V shared by G beams.

        q: (B*G, 1, H, Dh); k, v: (B, Tk, H, Dh);
        bias: (B*G, 1, 1, Tk) or None.  Returns ((B*G, 1, D), None).
        """
        B, Tk = k.shape[0], k.shape[1]
        G = q.shape[0] // B
        qg = q.reshape(B, G, self.num_heads, self.head_dim)
        scores = jnp.einsum("bghd,bthd->bhgt", qg, k) / jnp.sqrt(
            self.head_dim
        ).astype(q.dtype)
        if bias is not None:
            # (B*G, 1, 1, Tk) -> (B, 1, G, Tk), broadcast over heads
            scores = scores + bias.reshape(B, G, 1, Tk).transpose(0, 2, 1, 3)
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        w = self.drop(w, deterministic=deterministic)
        out = jnp.einsum("bhgt,bthd->bghd", w, v)
        out = out.reshape(B * G, 1, self.embed_dim)
        return self.out_proj(out), None

    def project_kv(self, key, value=None):
        """Precompute split K/V for a static source (cross-attention during
        incremental decode — the reference caches static_kv the same way;
        re-projecting encoder states every step dominates per-step FLOPs)."""
        value = key if value is None else value
        return self._split(self.k_proj(key)), self._split(self.v_proj(value))

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        cache: Optional[dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
        valid_mask: Optional[jnp.ndarray] = None,
        kv_override: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_ancestry: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[dict]]:
        """Returns (output (B, Tq, D), new_cache).

        Incremental mode: pass ``cache`` = {"k": (B, Tmax, H, Dh), "v": ...}
        and ``cache_index`` (scalar int32).  query must then have Tq == 1 and
        key/value are the *new* step only; cached keys up to index are used.
        """
        if self.kv_stride > 1 and cache is None:
            key = key[:, :: self.kv_stride]
            value = value[:, :: self.kv_stride]
            if bias is not None:
                bias = bias[..., :: self.kv_stride]
        q = self._split(self.q_proj(query))
        if kv_override is not None:
            k, v = kv_override
            if k.shape[0] != q.shape[0] and cache is None:
                # beam-shared cross K/V: kv has one row per sentence, q has
                # G beams per sentence (incremental decode, Tq == 1).  The
                # encoder projections are computed once per sentence instead
                # of once per beam — 1/G of the projection FLOPs and reads
                return self._grouped_cross(q, k, v, bias, deterministic)
        else:
            k = self._split(self.k_proj(key))
            v = self._split(self.v_proj(value))

        if self.attention_type == "rope":
            cos, sin = rope_tables(self.max_positions, self.head_dim, dtype=q.dtype)
            if cache is not None:
                q_pos = cache_index
                q = apply_rope(q, jax.lax.dynamic_slice_in_dim(cos, q_pos, 1),
                               jax.lax.dynamic_slice_in_dim(sin, q_pos, 1))
                k = apply_rope(k, jax.lax.dynamic_slice_in_dim(cos, q_pos, 1),
                               jax.lax.dynamic_slice_in_dim(sin, q_pos, 1))
            else:
                Tq, Tk = q.shape[1], k.shape[1]
                q = apply_rope(q, cos[:Tq], sin[:Tq])
                k = apply_rope(k, cos[:Tk], sin[:Tk])

        if self.seq_parallel and cache is None and valid_mask is not None:
            from s2t_tpu.parallel.context import get_mesh, seq_parallel_enabled

            if seq_parallel_enabled():
                from s2t_tpu.parallel.ring_attention import ring_attention

                out = ring_attention(q, k, v, valid_mask, get_mesh())
                out = out.reshape(out.shape[0], out.shape[1], self.embed_dim)
                return self.out_proj(out), None

        if bias is None and valid_mask is not None and cache is None \
                and kv_override is None:
            if (
                self.attention_type in ("abs", "rope")  # rope applied above
                and q.shape[1] == k.shape[1]
            ):
                # encoder self-attention with a pure padding mask: use the
                # VMEM-resident fused kernel when available (TPU) — the
                # (B, H, T, T) probabilities never touch HBM and attention
                # dropout is regenerated in backward
                # (ops/attention_pallas.py).  Skipped when attn_weights are
                # being sowed (alignment supervision needs the dense probs).
                from s2t_tpu.ops.attention_pallas import (
                    fused_attention,
                    fused_attention_available,
                )

                if fused_attention_available(
                    q.shape[1], self.head_dim, self.num_heads
                ) and not (
                    self.sow_attn
                    and self.is_mutable_collection("intermediates")
                ):
                    rate = 0.0 if deterministic else self.dropout
                    rng = self.make_rng("dropout") if rate > 0 else None
                    out = fused_attention(q, k, v, valid_mask, rate, rng)
                    out = out.reshape(
                        out.shape[0], out.shape[1], self.embed_dim
                    )
                    return self.out_proj(out), None
            # dense fallback for EVERY non-fused shape (incl. Shaw-relative
            # and strided-KV attention — leaving bias None here ran those
            # unmasked, code-review r3): rebuild the padding bias the caller
            # elided, striding the mask like the keys when kv_stride > 1
            vm = valid_mask
            if self.kv_stride > 1:
                vm = valid_mask[:, :: self.kv_stride]
            bias = padding_bias(vm, q.dtype)

        new_cache = None
        if cache is not None and cache_ancestry is not None:
            # LAZY BEAM REORDER: the beam loop never physically reorders the
            # (B*K, L, H, Dh) cache — each beam writes its row at its OWN
            # slot and ``cache_ancestry`` (B, K, L) int32 maps (beam, t) to
            # the physical slot holding its token-t key/value (already
            # including this step's row = own slot).  The per-position
            # ancestor rows are selected with a plain take_along_axis gather
            # over the slot axis: exactly the bytes attention must read
            # anyway, fused by XLA into the Tq==1 score/output reductions.
            # (The round-3 formulation scored every query against ALL K
            # slots and one-hot-selected — K x the score flops plus (K, K)
            # selection tensors padding 5->8 on two sublane dims — and lost
            # end-to-end, docs/design.md.  This gather form replaces it;
            # same math, none of that overhead.)
            assert "k_scale" not in cache, "ancestry + int8 KV unsupported"
            assert q.shape[1] == 1 and self.attention_type in ("abs", "rope")
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                cache["k"], k, cache_index, axis=1
            )
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                cache["v"], v, cache_index, axis=1
            )
            new_cache = {"k": k_cache, "v": v_cache}
            Bs, Kb, L = cache_ancestry.shape
            H, Dh = self.num_heads, self.head_dim
            kc = k_cache.reshape(Bs, Kb, L, H * Dh)
            vc = v_cache.reshape(Bs, Kb, L, H * Dh)
            idx3 = cache_ancestry[..., None]  # (B, K, L, 1)
            k_sel = jnp.take_along_axis(kc, idx3, axis=1).reshape(
                Bs * Kb, L, H, Dh
            )
            v_sel = jnp.take_along_axis(vc, idx3, axis=1).reshape(
                Bs * Kb, L, H, Dh
            )
            step_mask = jnp.arange(L)[None, None, None, :] <= cache_index
            step_bias = jnp.where(step_mask, 0.0, NEG).astype(q.dtype)
            bias = step_bias if bias is None else bias + step_bias
            w = dot_attention_weights(q, k_sel, bias, q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", w, v_sel)
            out = out.reshape(out.shape[0], out.shape[1], self.embed_dim)
            return self.out_proj(out), new_cache
        if cache is not None and "k_scale" in cache:
            # int8 KV cache (generation.kv_cache_dtype=int8): each step's
            # k/v row is quantized per (position, head) with an absmax/127
            # scale before the cache write.  The beam loop's dominant cost is
            # the per-step cache reorder gather (docs/serving.md) — int8
            # halves those bytes; dequantization fuses into the attention
            # einsum's operand read.
            def q8(x):
                s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
                s = jnp.maximum(s, 1e-8)
                q = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127
                ).astype(jnp.int8)
                return q, s.astype(jnp.bfloat16)

            kq, ks = q8(k)
            vq, vs = q8(v)
            upd = lambda c, x: jax.lax.dynamic_update_slice_in_dim(
                c, x, cache_index, axis=1
            )
            new_cache = {
                "k": upd(cache["k"], kq), "k_scale": upd(cache["k_scale"], ks),
                "v": upd(cache["v"], vq), "v_scale": upd(cache["v_scale"], vs),
            }
            Tk = new_cache["k"].shape[1]
            step_mask = jnp.arange(Tk)[None, None, None, :] <= cache_index
            step_bias = jnp.where(step_mask, 0.0, NEG).astype(q.dtype)
            bias = step_bias if bias is None else bias + step_bias
            if self.attention_type == "relative":
                q_pos = cache_index + jnp.arange(q.shape[1])
                key_pos = jnp.arange(Tk)
                bias = bias + self._relative_bias(q, key_pos, q_pos)
            # the per-(position, head) scale commutes out of the head-dim
            # contraction, so the int8 cache feeds the matmuls directly —
            # never materializing a dequantized copy:
            #   scores[t] = (q . k8[t]) * s_k[t];  out = sum_t (w[t] s_v[t]) v8[t]
            k8 = new_cache["k"].astype(q.dtype)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k8) / jnp.sqrt(
                q.shape[-1]
            ).astype(q.dtype)
            scores = scores * jnp.transpose(
                new_cache["k_scale"].astype(q.dtype), (0, 2, 1)
            )[:, :, None, :]
            scores = scores + bias
            w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
            if self.sow_attn:
                self.sow("intermediates", "attn_weights", w)
            wv = w * jnp.transpose(
                new_cache["v_scale"].astype(q.dtype), (0, 2, 1)
            )[:, :, None, :]
            out = jnp.einsum("bhqk,bkhd->bqhd", wv, new_cache["v"].astype(q.dtype))
            out = out.reshape(out.shape[0], out.shape[1], self.embed_dim)
            return self.out_proj(out), new_cache
        elif cache is not None:
            # write this step's k/v at cache_index, then attend over the cache
            k_cache = jax.lax.dynamic_update_slice_in_dim(cache["k"], k, cache_index, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(cache["v"], v, cache_index, axis=1)
            new_cache = {"k": k_cache, "v": v_cache}
            k, v = k_cache, v_cache
            Tk = k.shape[1]
            step_mask = jnp.arange(Tk)[None, None, None, :] <= cache_index
            step_bias = jnp.where(step_mask, 0.0, NEG).astype(q.dtype)
            bias = step_bias if bias is None else bias + step_bias

        if self.attention_type == "relative":
            if cache is not None:
                q_pos = cache_index + jnp.arange(q.shape[1])
            else:
                q_pos = jnp.arange(q.shape[1])
            key_pos = jnp.arange(k.shape[1]) * (
                self.kv_stride if cache is None else 1
            )
            rel = self._relative_bias(q, key_pos, q_pos)
            bias = rel if bias is None else bias + rel

        if (
            cache is None
            and not self.sow_attn
            and self.attention_std_scale == 0
            and not (self.attention_type == "local"
                     and self.gauss_mask_sigma != 0)
            and q.shape[1] > 1
            and _attn_remat_enabled()
        ):
            key = None
            k_u8 = 0
            if not deterministic and self.dropout > 0:
                k_u8 = min(max(int(round(self.dropout * 256)), 0), 255)
                if k_u8 > 0:
                    key = self.make_rng("dropout")
            out = _attn_core_remat(q, k, v, bias, key, k_u8)
            out = out.reshape(out.shape[0], out.shape[1], self.embed_dim)
            return self.out_proj(out), new_cache

        w = dot_attention_weights(q, k, bias, q.dtype, self.attention_std_scale)
        if self.attention_type == "local" and self.gauss_mask_sigma != 0 \
                and cache is None:
            # Gaussian mixture attention (reference:
            # local_multihead_attention.py:326-380): the Gaussian term sees
            # neither padding nor the hard window — padded keys are zeroed
            # AFTER mixing, unrenormalised, and the mix carries the
            # reference's literal /2
            Tq, Tk = q.shape[1], k.shape[1]
            d = jnp.arange(Tk, dtype=jnp.float32)
            dis2 = -((d[None, :] - d[:Tq, None]) ** 2) / 2.0  # (Tq, Tk)
            inv_sig2 = 1.0 / jnp.square(self.gauss_sigma.astype(jnp.float32))
            gauss = dis2[None] * inv_sig2  # (H, Tq, Tk)
            p_gauss = jax.nn.softmax(gauss, axis=-1)[None].astype(w.dtype)
            mw = jax.nn.sigmoid(
                self.gauss_mask_weight.astype(jnp.float32)
            )[None].astype(w.dtype)
            w = ((1.0 - mw) * w + mw * p_gauss) / 2.0
            if valid_mask is not None:
                vm = valid_mask
                if self.kv_stride > 1:
                    vm = valid_mask[:, :: self.kv_stride]
                w = w * vm[:, None, None, :].astype(w.dtype)
        # capture for alignment supervision / latency training when the
        # caller applies with mutable=["intermediates"] (no-op otherwise);
        # only modules with sow_attn (decoder cross-attention) participate —
        # the reference returns attn from forward when need_attn is set
        if self.sow_attn:
            self.sow("intermediates", "attn_weights", w)
        w = self.drop(w, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
        out = out.reshape(out.shape[0], out.shape[1], self.embed_dim)
        return self.out_proj(out), new_cache


class RelPositionMultiHeadAttention(nn.Module):
    """Transformer-XL style relative-position attention (ESPnet variant used
    by Conformer; reference: espnet_multihead_attention.py RelPositionMHA).

    Expects ``pos_emb``: (2T-1, D) relative encoding table for the current T.
    Learnable content/position biases u, v (pos_bias_u / pos_bias_v).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.embed_dim % self.num_heads == 0
        self.head_dim = self.embed_dim // self.num_heads
        self.q_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")
        self.k_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")
        self.v_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")
        self.pos_proj = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype, name="pos_proj")
        self.out_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")
        self.pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(), (self.num_heads, self.head_dim)
        )
        self.pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(), (self.num_heads, self.head_dim)
        )
        self.drop = _FastDropout(self.dropout)

    @staticmethod
    def _rel_shift(x):
        """(B, H, T, 2T-1) -> (B, H, T, T): pick diagonal bands so that
        position j-i indexes the table at (T-1) + (j - i)."""
        B, H, T, L = x.shape  # L == 2T-1
        # pad one on the left of last dim, reshape trick (Transformer-XL)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(B, H, L + 1, T)
        x = x[:, :, 1:, :].reshape(B, H, T, L)
        return x[..., :T]

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        pos_emb: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, T, _ = query.shape
        q = self.q_proj(query).reshape(B, T, self.num_heads, self.head_dim)
        k = self.k_proj(key).reshape(B, T, self.num_heads, self.head_dim)
        v = self.v_proj(value).reshape(B, T, self.num_heads, self.head_dim)
        p = self.pos_proj(pos_emb).reshape(-1, self.num_heads, self.head_dim)  # (2T-1, H, Dh)

        q_u = q + self.pos_bias_u.astype(q.dtype)[None, None]
        q_v = q + self.pos_bias_v.astype(q.dtype)[None, None]
        # content score
        ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k)
        # position score: (B, H, T, 2T-1) -> shift -> (B, H, T, T)
        bd = jnp.einsum("bqhd,lhd->bhql", q_v, p)
        bd = self._rel_shift(bd)
        scores = (ac + bd) / jnp.sqrt(self.head_dim).astype(q.dtype)
        if bias is not None:
            scores = scores + bias
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        w = self.drop(w, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, T, self.embed_dim)
        return self.out_proj(out)


def padding_bias(valid_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, Tk) valid-mask -> (B, 1, 1, Tk) additive attention bias."""
    return jnp.where(valid_mask[:, None, None, :], 0.0, NEG).astype(dtype)


def local_window_bias(T: int, window: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, T, T) band mask: positions farther than ``window`` are hidden
    (reference: fairseq/modules/local_multihead_attention.py — windowed
    self-attention as a research option)."""
    i = jnp.arange(T)
    band = jnp.abs(i[:, None] - i[None, :]) <= window
    return jnp.where(band, 0.0, NEG).astype(dtype)[None, None]


def causal_bias(T: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, T, T) additive causal mask."""
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))
    return jnp.where(mask, 0.0, NEG).astype(dtype)[None, None]

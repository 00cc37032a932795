"""wav2vec (v1) — contrastive predictive coding over raw audio, TPU-first.

(reference: fairseq/models/wav2vec/wav2vec.py:163-630 — Wav2VecModel with a
conv feature extractor, a causal conv aggregator, and a CPC prediction head
that scores each aggregator frame against the true future feature frame and
sampled negatives, `prediction_steps` steps ahead.)

TPU re-design:
  * the reference builds a RAGGED flat prediction buffer whose length depends
    on (steps, offset, T) and fills it with a Python loop of differently-sized
    einsums (wav2vec.py:562-604).  Here predictions are one DENSE
    (B, T, steps, 1+N) tensor: score[b,t,i,n] = <x_i[b,t], targets[b,t+off+i,n]>
    computed by one einsum per step over a statically shifted target tensor,
    with a validity mask where t+offset+i exceeds the frame count — identical
    scores, static shapes, no host-side size arithmetic.
  * ConvTranspose2d(in, out, (1, steps)) is algebraically a per-step linear
    map; implemented as a single einsum against a (C_in, steps, C_out) weight.
  * negatives are drawn per (b, t) with the same self-exclusion shift as the
    reference (same-utterance by default, cross-utterance optional).
  * the aggregator's causal padding (left k-1) uses zero or edge padding
    matching agg_zero_pad / ReplicationPad1d.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.dropout import Dropout as _FastDropout
from s2t_tpu.registry import register_model, register_model_architecture


@dataclass(frozen=True)
class Wav2VecConfig:
    prediction_steps: int = 12
    num_negatives: int = 10
    cross_sample_negatives: int = 0
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2),
        (512, 1, 1), (512, 1, 1), (512, 1, 1),
    )
    conv_aggregator_layers: Tuple[Tuple[int, int, int], ...] = tuple(
        (512, k, 1) for k in range(2, 14)
    )
    dropout: float = 0.0
    dropout_features: float = 0.0
    dropout_agg: float = 0.0
    no_conv_bias: bool = False
    agg_zero_pad: bool = False
    skip_connections_feat: bool = False
    skip_connections_agg: bool = True
    residual_scale: float = 0.5
    log_compression: bool = True
    balanced_classes: bool = False
    non_affine_group_norm: bool = False
    offset: int = -1  # -1 = "auto" from the extractor's receptive field
    activation: str = "relu"
    infonce: bool = False
    # vector quantization of the targets (reference wav2vec.py:198-224:
    # --vq-type none|gumbel|kmeans)
    vq_type: str = "none"
    vq_vars: int = 320
    vq_groups: int = 2
    vq_dim: int = 0  # 0 = extractor dim
    vq_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    vq_gamma: float = 0.25
    dtype_str: str = "float32"

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def effective_offset(self) -> int:
        if self.offset >= 0:
            return self.offset
        # receptive field / jump of the extractor (reference wav2vec.py:226-238)
        jin = rin = 0
        for _, k, stride in self.conv_feature_layers:
            if rin == 0:
                rin = k
            rin = rin + (k - 1) * jin
            jin = stride if jin == 0 else jin * stride
        return int(math.ceil(rin / jin))


def _act(name: str):
    return nn.relu if name == "relu" else (
        lambda x: nn.gelu(x, approximate=False))


class GroupNormBlock(nn.Module):
    """Single-group norm over (T, C) per utterance, f32 statistics
    (reference: wav2vec.py norm_block -> Fp32GroupNorm(1, dim)).

    The reference trains on cropped pad-free batches, so normalizing over
    the whole time axis is safe there; with padded batches the statistics
    must be MASKED to the valid frames or the same utterance gets different
    features depending on its bucket's padding (and any junk in the tail
    poisons every frame)."""

    affine: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None):
        B, T, C = x.shape
        xf = x.astype(jnp.float32)
        if valid is None:
            n = float(T * C)
            mean = jnp.mean(xf, axis=(1, 2))
            var = jnp.mean((xf - mean[:, None, None]) ** 2, axis=(1, 2))
        else:
            m = valid[..., None]
            # where, not multiply: junk (even NaN) in the padded tail must
            # not reach the statistics
            xz = jnp.where(m, xf, 0.0)
            n = jnp.maximum(
                jnp.sum(m.astype(jnp.float32), axis=(1, 2)) * C, 1.0
            )
            mean = jnp.sum(xz, axis=(1, 2)) / n
            var = jnp.sum(
                jnp.where(m, (xf - mean[:, None, None]) ** 2, 0.0),
                axis=(1, 2),
            ) / n
        h = (xf - mean[:, None, None]) * jax.lax.rsqrt(
            var[:, None, None] + 1e-5
        )
        if self.affine:
            scale = self.param("gn_scale", nn.initializers.ones, (C,))
            bias = self.param("gn_bias", nn.initializers.zeros, (C,))
            h = h * scale[None, None] + bias[None, None]
        if valid is not None:
            # silence the padded tail for downstream convs
            h = jnp.where(valid[..., None], h, 0.0)
        return h.astype(self.dtype)


class ConvFeatureExtractorV1(nn.Module):
    """Raw waveform -> frame features (reference: wav2vec.py:367-418).

    ``lengths`` makes every group-norm's statistics padding-independent
    (see GroupNormBlock)."""

    cfg: Wav2VecConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from s2t_tpu.utils.masking import lengths_to_mask

        cfg = self.cfg
        h = x[..., None]  # (B, T, 1)
        for i, (dim, k, s) in enumerate(cfg.conv_feature_layers):
            prev = h
            h = nn.Conv(
                features=dim, kernel_size=(k,), strides=(s,), padding="VALID",
                use_bias=False, dtype=cfg.dtype, name=f"conv{i}",
            )(h)
            valid = None
            if lengths is not None:
                lengths = (lengths - k) // s + 1
                valid = lengths_to_mask(jnp.maximum(lengths, 0), h.shape[1])
            h = _FastDropout(cfg.dropout)(h, deterministic=deterministic)
            h = GroupNormBlock(
                affine=not cfg.non_affine_group_norm, dtype=cfg.dtype,
                name=f"norm{i}",
            )(h, valid)
            h = _act(cfg.activation)(h)
            if cfg.skip_connections_feat and h.shape[-1] == prev.shape[-1]:
                # stride-subsample the residual to the new time length
                t, rt = h.shape[1], prev.shape[1]
                res = prev[:, :: rt // t][:, :t]
                h = (h + res) * math.sqrt(cfg.residual_scale)
        if cfg.log_compression:
            h = jnp.log(jnp.abs(h.astype(jnp.float32)) + 1.0).astype(h.dtype)
        return h


class ConvAggregator(nn.Module):
    """Causal conv stack over features (reference: wav2vec.py:430-486)."""

    cfg: Wav2VecConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        for i, (dim, k, s) in enumerate(cfg.conv_aggregator_layers):
            residual = x
            ka = k // 2
            kb = ka - 1 if k % 2 == 0 else ka
            mode = "constant" if cfg.agg_zero_pad else "edge"
            h = jnp.pad(x, ((0, 0), (ka + kb, 0), (0, 0)), mode=mode)
            h = nn.Conv(
                features=dim, kernel_size=(k,), strides=(s,), padding="VALID",
                use_bias=not cfg.no_conv_bias, dtype=cfg.dtype, name=f"conv{i}",
            )(h)
            h = _FastDropout(cfg.dropout)(h, deterministic=deterministic)
            h = GroupNormBlock(
                affine=not cfg.non_affine_group_norm, dtype=cfg.dtype,
                name=f"norm{i}",
            )(h, valid)
            h = _act(cfg.activation)(h)
            if cfg.skip_connections_agg:
                if residual.shape[-1] != dim:
                    residual = nn.Conv(
                        features=dim, kernel_size=(1,), use_bias=False,
                        dtype=cfg.dtype, name=f"rproj{i}",
                    )(residual)
                h = (h + residual) * math.sqrt(cfg.residual_scale)
            x = h
        return x


@register_model("wav2vec")
class Wav2VecModel(nn.Module):
    """CPC pretraining model (reference: wav2vec.py:163 Wav2VecModel).

    __call__(source, lengths, deterministic) ->
      {"cpc_logits": (B, T', steps, 1+N) f32,
       "cpc_valid":  (B, T', steps) bool — scores where t+offset+i < frames,
       "infonce", "balanced_classes", "num_negatives": loss routing info}
    """

    cfg: Wav2VecConfig

    def setup(self):
        cfg = self.cfg
        self.feature_extractor = ConvFeatureExtractorV1(
            cfg, name="feature_extractor"
        )
        self.feature_aggregator = ConvAggregator(cfg, name="feature_aggregator")
        c_feat = cfg.conv_feature_layers[-1][0]
        vq_dim = cfg.vq_dim if cfg.vq_dim > 0 else c_feat
        if cfg.vq_type == "gumbel":
            from s2t_tpu.models.wav2vec2 import GumbelVectorQuantizer

            self.vq = GumbelVectorQuantizer(
                c_feat, cfg.vq_vars, cfg.vq_groups, vq_dim, cfg.dtype,
                name="vq",
            )
        elif cfg.vq_type == "kmeans":
            from s2t_tpu.modules.vq import KmeansVectorQuantizer

            self.vq = KmeansVectorQuantizer(
                c_feat, cfg.vq_vars, cfg.vq_groups, vq_dim,
                gamma=cfg.vq_gamma, dtype=cfg.dtype, name="vq",
            )
        self.drop_feats = _FastDropout(cfg.dropout_features)
        self.drop_agg = _FastDropout(cfg.dropout_agg)
        c_in = cfg.conv_aggregator_layers[-1][0]
        c_out = cfg.conv_feature_layers[-1][0]
        # ConvTranspose2d(c_in, c_out, (1, steps)) == per-step linear maps
        self.step_proj = self.param(
            "step_proj",
            nn.initializers.lecun_normal(),
            (c_in, cfg.prediction_steps, c_out),
        )
        self.step_bias = self.param(
            "step_bias", nn.initializers.zeros, (cfg.prediction_steps, c_out)
        )
        self.drop_pred = _FastDropout(cfg.dropout)

    def _frame_lengths(self, lengths: jnp.ndarray) -> jnp.ndarray:
        for _, k, s in self.cfg.conv_feature_layers:
            lengths = (lengths - k) // s + 1
        return lengths

    def __call__(
        self,
        source: jnp.ndarray,
        lengths: jnp.ndarray,
        deterministic: bool = True,
        temp: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        feats = self.feature_extractor(
            source, deterministic, lengths=lengths
        )  # (B, T', C)
        extra = {}
        if cfg.vq_type == "gumbel":
            # gumbel quantization of the targets; ``temp`` is the annealed
            # temperature passed in as data each step (same contract as
            # wav2vec2 — the task/trainer computes the schedule).  Defaults
            # to the schedule start (reference wav2vec.py:302-307).
            if temp is None:
                temp = jnp.asarray(cfg.vq_temp[0], jnp.float32)
            feats, prob_ppl, code_ppl = self.vq(feats, temp, deterministic)
            extra = {
                "prob_perplexity": prob_ppl,
                "code_perplexity": code_ppl,
                "num_vars": cfg.vq_vars * cfg.vq_groups,
            }
        elif cfg.vq_type == "kmeans":
            q = self.vq(feats)
            feats = q["x"]
            extra = {
                "kmeans_loss": q["kmeans_loss"],
                "code_perplexity": q["code_perplexity"],
                "num_vars": q["num_vars"],
            }
        # CPC targets are the PRE-dropout (post-VQ) features — the reference
        # scores predictions against the clean features (wav2vec.py:308-313);
        # dropout applies only on the aggregator input
        y = feats
        from s2t_tpu.utils.masking import lengths_to_mask as _l2m

        agg_valid = _l2m(self._frame_lengths(lengths), feats.shape[1])
        x = self.drop_feats(feats, deterministic=deterministic)
        x = self.feature_aggregator(x, deterministic=deterministic,
                                    valid=agg_valid)
        x = self.drop_agg(x, deterministic=deterministic)

        B, T, C = y.shape
        frames = self._frame_lengths(lengths)
        offset = cfg.effective_offset
        steps = cfg.prediction_steps
        N = cfg.num_negatives
        Nx = cfg.cross_sample_negatives

        # per-step predictions: (B, T, steps, C)
        preds = (
            jnp.einsum("btc,csd->btsd", x, self.step_proj.astype(x.dtype))
            + self.step_bias.astype(x.dtype)[None, None]
        )
        preds = self.drop_pred(preds, deterministic=deterministic)

        # negatives: (B, T, N(+Nx), C) gathered with self-exclusion
        rng = self.make_rng("dropout") if not deterministic else jax.random.PRNGKey(0)
        parts = []
        # negatives come from VALID frames only: padded-tail features are
        # content-free and would be trivially separable negatives (the
        # reference batches cropped pad-free waveforms, wav2vec.py:518-560)
        if N > 0:
            hi = jnp.maximum(frames - 1, 1).astype(jnp.float32)  # (B,)
            u = jax.random.uniform(rng, (B, T, N))
            idx = jnp.floor(u * hi[:, None, None]).astype(jnp.int32)
            idx = jnp.where(idx >= jnp.arange(T)[None, :, None], idx + 1, idx)
            idx = jnp.minimum(idx, jnp.maximum(frames - 1, 0)[:, None, None])
            parts.append(jnp.take_along_axis(y[:, :, None], idx[..., None], axis=1))
        if Nx > 0:
            k1, k2 = jax.random.split(jax.random.fold_in(rng, 1))
            yf = y.reshape(B * T, C)
            bsel = jax.random.randint(k1, (B, T, Nx), 0, B)
            # full valid range of the DONOR utterance (self-collisions are
            # shifted below; an off-by-one here starved utterance-final
            # frames, code-review r3)
            hi_b = jnp.maximum(frames[bsel], 1).astype(jnp.float32)
            tsel = jnp.floor(
                jax.random.uniform(k2, (B, T, Nx)) * hi_b
            ).astype(jnp.int32)
            # skip self: if the draw lands on (b, t) itself, shift the frame
            same = (bsel == jnp.arange(B)[:, None, None]) & (
                tsel == jnp.arange(T)[None, :, None]
            )
            tsel = jnp.where(same, tsel + 1, tsel)
            tsel = jnp.minimum(tsel, jnp.maximum(frames[bsel] - 1, 0))
            cidx = bsel * T + tsel
            parts.append(yf[cidx.reshape(-1)].reshape(B, T, Nx, C))
        negs = jnp.concatenate(parts, axis=2) if parts else None

        # targets: positive frame first, then negatives -> (B, T, 1+N, C)
        targets = y[:, :, None]
        if negs is not None:
            targets = jnp.concatenate([targets, negs], axis=2)

        # dense scores: step i scores x_i[b, t] against targets[b, t+offset+i]
        t_idx = jnp.arange(T)
        logits = []
        valid = []
        for i in range(steps):
            off = offset + i
            shifted = jnp.roll(targets, -off, axis=1)  # rows >= T-off are junk
            li = jnp.einsum(
                "btc,btnc->btn", preds[:, :, i], shifted,
                preferred_element_type=jnp.float32,
            )
            logits.append(li)
            valid.append(t_idx[None, :] + off < frames[:, None])
        cpc_logits = jnp.stack(logits, axis=2)  # (B, T, steps, 1+N)
        cpc_valid = jnp.stack(valid, axis=2)  # (B, T, steps)

        return {
            "cpc_logits": cpc_logits,
            "cpc_valid": cpc_valid,
            "infonce": cfg.infonce,
            "balanced_classes": cfg.balanced_classes,
            "num_negatives": N + Nx,
            **extra,
        }


@register_model_architecture("wav2vec", "wav2vec")
def wav2vec_base(**kw) -> Wav2VecConfig:
    return Wav2VecConfig().replace(**kw)


@register_model_architecture("wav2vec", "wav2vec_large")
def wav2vec_large(**kw) -> Wav2VecConfig:
    # wav2vec-large (reference examples/wav2vec/README: larger receptive field)
    return Wav2VecConfig(
        conv_aggregator_layers=tuple((512, k, 1) for k in range(2, 15)),
        skip_connections_agg=True,
        activation="gelu",
    ).replace(**kw)

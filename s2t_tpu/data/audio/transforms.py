"""Feature transforms: CMVN and SpecAugment, as jittable on-device functions.

Replaces the reference's numpy per-utterance transform pipeline
(reference: fairseq/data/audio/feature_transforms/{utterance_cmvn,global_cmvn,
specaugment}.py) with batched, static-shape device transforms that compose
into the jitted train step — masked frames never contaminate statistics.

Registry-compatible: each transform is built from a dict config like the
reference's CompositeAudioFeatureTransform (feature_transforms/__init__.py:7-55).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.registry import FEATURE_TRANSFORMS, register_feature_transform
from s2t_tpu.utils.masking import lengths_to_mask


@register_feature_transform("utterance_cmvn")
class UtteranceCMVN:
    """Per-utterance mean/var normalisation over valid frames only
    (reference: feature_transforms/utterance_cmvn.py:9)."""

    def __init__(self, norm_means: bool = True, norm_vars: bool = True):
        self.norm_means, self.norm_vars = norm_means, norm_vars

    @classmethod
    def from_config_dict(cls, cfg: Optional[Dict] = None):
        cfg = cfg or {}
        return cls(cfg.get("norm_means", True), cfg.get("norm_vars", True))

    def __call__(self, feats: jnp.ndarray, lengths: jnp.ndarray, rng=None) -> jnp.ndarray:
        # feats: (B, T, D); lengths: (B,)
        mask = lengths_to_mask(lengths, feats.shape[1])[..., None]  # (B, T, 1)
        n = jnp.maximum(lengths[:, None, None].astype(feats.dtype), 1.0)
        mean = jnp.sum(jnp.where(mask, feats, 0.0), axis=1, keepdims=True) / n
        out = feats
        if self.norm_means:
            out = out - mean
        if self.norm_vars:
            var = (
                jnp.sum(jnp.where(mask, (feats - mean) ** 2, 0.0), axis=1, keepdims=True)
                / n
            )
            out = out / jnp.sqrt(var + 1e-10)
        return jnp.where(mask, out, 0.0)


@register_feature_transform("global_cmvn")
class GlobalCMVN:
    """Dataset-level mean/std from precomputed stats npz
    (reference: feature_transforms/global_cmvn.py:9)."""

    def __init__(self, mean: np.ndarray, std: np.ndarray):
        self.mean = jnp.asarray(mean, dtype=jnp.float32)
        self.std = jnp.asarray(std, dtype=jnp.float32)

    @classmethod
    def from_config_dict(cls, cfg: Optional[Dict] = None):
        cfg = cfg or {}
        stats = np.load(cfg["stats_npz_path"])
        return cls(stats["mean"], stats["std"])

    def __call__(self, feats: jnp.ndarray, lengths: jnp.ndarray, rng=None) -> jnp.ndarray:
        mask = lengths_to_mask(lengths, feats.shape[1])[..., None]
        return jnp.where(mask, (feats - self.mean) / self.std, 0.0)


@register_feature_transform("specaugment")
class SpecAugment:
    """SpecAugment (Park et al. 2019): time warp + frequency/time masking.

    (reference: feature_transforms/specaugment.py:13-131 uses a cv2/sparse
    image warp; the paper's warp is 1-D along time, so here it is the exact
    piecewise-linear time resample — a center frame c in [W, len-W) is moved
    by w ~ U[-W, W] and the two segments are linearly re-sampled with a
    gather + lerp.  W=0 (the recipe default) disables it.)
    """

    def __init__(
        self,
        time_warp_w: int = 0,
        freq_mask_n: int = 2,
        freq_mask_f: int = 27,
        time_mask_n: int = 2,
        time_mask_t: int = 100,
        time_mask_p: float = 1.0,
        mask_value: Optional[float] = None,
    ):
        self.time_warp_w = time_warp_w
        self.freq_mask_n = freq_mask_n
        self.freq_mask_f = freq_mask_f
        self.time_mask_n = time_mask_n
        self.time_mask_t = time_mask_t
        self.time_mask_p = time_mask_p
        self.mask_value = mask_value  # None -> per-utterance mean

    @classmethod
    def from_config_dict(cls, cfg: Optional[Dict] = None):
        cfg = cfg or {}
        return cls(
            time_warp_w=cfg.get("time_warp_W", 0),
            freq_mask_n=cfg.get("freq_mask_N", 2),
            freq_mask_f=cfg.get("freq_mask_F", 27),
            time_mask_n=cfg.get("time_mask_N", 2),
            time_mask_t=cfg.get("time_mask_T", 100),
            time_mask_p=cfg.get("time_mask_p", 1.0),
            mask_value=cfg.get("mask_value", None),
        )

    def __call__(
        self, feats: jnp.ndarray, lengths: jnp.ndarray, rng=None
    ) -> jnp.ndarray:
        if rng is None:
            # train-only augmentation (reference: transforms composed with
            # train-only filtering); a '*' all-splits transforms key reaches
            # here at eval with no rng — no-op instead of crashing
            return feats
        B, T, D = feats.shape
        if self.time_warp_w > 0:
            rng, k_w = jax.random.split(rng)
            feats = self._time_warp(feats, lengths, k_w)
        valid = lengths_to_mask(lengths, T)[..., None]
        n = jnp.maximum(lengths[:, None, None].astype(feats.dtype), 1.0)
        fill = (
            jnp.sum(jnp.where(valid, feats, 0.0), axis=(1, 2), keepdims=True)
            / (n * D)
            if self.mask_value is None
            else jnp.full((B, 1, 1), self.mask_value, feats.dtype)
        )
        keep = jnp.ones((B, T, D), dtype=bool)

        k_f, k_t = jax.random.split(rng)
        # frequency masks: mask [f0, f0+f) with f ~ U[0, F]
        for i in range(self.freq_mask_n):
            k_f, k1, k2 = jax.random.split(k_f, 3)
            f = jax.random.randint(k1, (B, 1), 0, self.freq_mask_f + 1)
            f0 = (
                jax.random.uniform(k2, (B, 1)) * jnp.maximum(D - f, 1)
            ).astype(jnp.int32)
            d = jnp.arange(D)[None, :]
            keep &= ~((d >= f0) & (d < f0 + f))[:, None, :]
        # time masks: t ~ U[0, min(T_mask, p*len)]
        max_t = jnp.minimum(
            self.time_mask_t, (self.time_mask_p * lengths).astype(jnp.int32)
        )[:, None]
        for i in range(self.time_mask_n):
            k_t, k1, k2 = jax.random.split(k_t, 3)
            t = (jax.random.uniform(k1, (B, 1)) * (max_t + 1)).astype(jnp.int32)
            t0 = (
                jax.random.uniform(k2, (B, 1))
                * jnp.maximum(lengths[:, None] - t, 1)
            ).astype(jnp.int32)
            ts = jnp.arange(T)[None, :]
            keep &= ~((ts >= t0) & (ts < t0 + t))[:, :, None]

        out = jnp.where(keep, feats, fill)
        return jnp.where(valid, out, feats)

    def _time_warp(self, feats, lengths, rng):
        """Piecewise-linear time warp: map [0, c] -> [0, c+w] and
        [c, len) -> [c+w, len) and resample by linear interpolation."""
        B, T, D = feats.shape
        W = self.time_warp_w
        k1, k2 = jax.random.split(rng)
        L = lengths.astype(jnp.float32)[:, None]  # (B, 1)
        # rows shorter than 2W+2 keep identity (the reference skips them too)
        ok = (lengths >= 2 * W + 2)[:, None]
        c = W + jax.random.uniform(k1, (B, 1)) * jnp.maximum(L - 2 * W, 1.0)
        w = jax.random.uniform(k2, (B, 1), minval=-W, maxval=W + 1.0)
        w = jnp.floor(w)
        cw = c + w
        t = jnp.arange(T, dtype=jnp.float32)[None, :]  # (B, T) broadcast
        # inverse map: output position t reads source position src(t)
        left = t * (c / jnp.maximum(cw, 1.0))
        right = c + (t - cw) * (L - 1 - c) / jnp.maximum(L - 1 - cw, 1.0)
        src = jnp.where(t <= cw, left, right)
        src = jnp.where(ok, src, t)
        src = jnp.clip(src, 0.0, L - 1.0)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, T - 1)
        frac = (src - lo.astype(jnp.float32))[..., None].astype(feats.dtype)
        f_lo = jnp.take_along_axis(feats, lo[..., None], axis=1)
        f_hi = jnp.take_along_axis(feats, hi[..., None], axis=1)
        warped = f_lo * (1 - frac) + f_hi * frac
        # padded tail stays untouched
        pad = t >= L
        return jnp.where(pad[..., None], feats, warped)


class CompositeTransform:
    """Compose transforms from a data-config dict, per split
    (reference: CompositeAudioFeatureTransform, feature_transforms/__init__.py)."""

    def __init__(self, transforms: List):
        self.transforms = transforms

    @classmethod
    def from_config_dict(cls, names_and_cfg: Optional[Dict] = None):
        names_and_cfg = names_and_cfg or {}
        names = names_and_cfg.get("transforms", [])
        ts = []
        for name in names:
            t_cls = FEATURE_TRANSFORMS.get(name)
            ts.append(t_cls.from_config_dict(names_and_cfg.get(name)))
        return cls(ts)

    def __call__(self, feats, lengths, rng=None):
        for i, t in enumerate(self.transforms):
            sub = None
            if rng is not None:
                rng, sub = jax.random.split(rng)
            feats = t(feats, lengths, sub)
        return feats

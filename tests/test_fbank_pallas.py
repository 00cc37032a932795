"""Fused Pallas fbank kernel parity tests (interpret mode on CPU; the same
kernel compiles and runs on TPU — see bench notes in the kernel docstring)."""

import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.data.audio.fbank import fbank_numpy
from s2t_tpu.ops.fbank_pallas import fbank_pallas


class TestFbankPallas:
    def test_matches_numpy_oracle(self, rng):
        lens = [8000, 24000]
        waves = np.zeros((2, 24000), np.float32)
        for i, L in enumerate(lens):
            waves[i, :L] = rng.normal(scale=2000.0, size=L)
        feats, flens = fbank_pallas(
            jnp.asarray(waves), jnp.asarray(lens), interpret=True
        )
        feats = np.asarray(feats)
        for i, L in enumerate(lens):
            ref = fbank_numpy(waves[i, :L])
            assert int(flens[i]) == ref.shape[0]
            np.testing.assert_allclose(
                feats[i, : ref.shape[0]], ref, atol=5e-4, rtol=1e-4
            )

    def test_non_multiple_block_length(self, rng):
        # frame count not a multiple of BLOCK exercises the pad/trim path
        L = 400 + 160 * 37  # 38 frames
        wave = rng.normal(scale=1000.0, size=(1, L)).astype(np.float32)
        feats, flens = fbank_pallas(
            jnp.asarray(wave), jnp.asarray([L]), interpret=True
        )
        ref = fbank_numpy(wave[0])
        assert int(flens[0]) == 38 == ref.shape[0]
        np.testing.assert_allclose(
            np.asarray(feats)[0, :38], ref, atol=5e-4, rtol=1e-4
        )

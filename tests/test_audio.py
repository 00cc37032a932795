"""fbank + feature transform tests.

torchaudio is not available in this image, so the host numpy implementation is
validated analytically (tone peak location, framing math, DC/preemph effects)
and the JAX device path is parity-tested against it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.data.audio.fbank import (
    fbank_jax,
    fbank_numpy,
    kaldi_mel_banks,
    mel_scale,
    num_frames,
    povey_window,
    speed_perturb_numpy,
)
from s2t_tpu.data.audio.transforms import (
    CompositeTransform,
    SpecAugment,
    UtteranceCMVN,
)


def tone(freq, sr=16000, dur=0.5, amp=10000.0):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestFbankNumpy:
    def test_shapes(self):
        w = tone(440)
        f = fbank_numpy(w)
        assert f.shape == (num_frames(len(w)), 80)
        assert f.shape[0] == 1 + (len(w) - 400) // 160

    def test_tone_peak_bin(self):
        # a pure tone's energy should peak at the mel bin containing its freq
        sr, nbins = 16000, 80
        banks = kaldi_mel_banks(nbins, 512, float(sr))
        for freq in [300.0, 1000.0, 3000.0]:
            f = fbank_numpy(tone(freq, sr))
            peak_bin = int(np.mean(np.argmax(f, axis=1)))
            # expected bin: mel position of freq within [mel(20), mel(8000)]
            mel_lo, mel_hi = mel_scale(20.0), mel_scale(8000.0)
            expect = (mel_scale(freq) - mel_lo) / (mel_hi - mel_lo) * (nbins + 1) - 1
            assert abs(peak_bin - expect) <= 1.5, (freq, peak_bin, expect)

    def test_dc_removed(self):
        # constant signal has (almost) no energy after DC removal
        w = np.full(16000, 5000.0, dtype=np.float32)
        f = fbank_numpy(w)
        assert np.all(f < 0.0)  # log(eps)-ish everywhere

    def test_povey_window(self):
        w = povey_window(400)
        assert w[0] == 0.0 and abs(w[200] - ((0.5 - 0.5 * np.cos(2 * np.pi * 200 / 399)) ** 0.85)) < 1e-6

    def test_mel_banks_rows_sum_positive(self):
        banks = kaldi_mel_banks(80, 512, 16000.0)
        assert banks.shape == (257, 80)
        assert np.all(banks.sum(axis=0) > 0)
        assert np.all(banks[-1] == 0)  # nyquist column zero


class TestFbankJax:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        sr = 16000
        lens = [8000, 12000, 16000]
        N = max(lens)
        waves = np.zeros((3, N), dtype=np.float32)
        for i, L in enumerate(lens):
            waves[i, :L] = rng.normal(scale=2000.0, size=L).astype(np.float32)
        feats, flens = fbank_jax(jnp.asarray(waves), jnp.asarray(lens))
        feats, flens = np.asarray(feats), np.asarray(flens)
        for i, L in enumerate(lens):
            ref = fbank_numpy(waves[i, :L])
            assert flens[i] == ref.shape[0]
            np.testing.assert_allclose(feats[i, : flens[i]], ref, rtol=1e-3, atol=1e-2)

    def test_speed_perturb_length(self):
        w = tone(440, dur=1.0)
        fast = speed_perturb_numpy(w, 1.1)
        slow = speed_perturb_numpy(w, 0.9)
        assert abs(len(fast) - len(w) / 1.1) < 10
        assert abs(len(slow) - len(w) / 0.9) < 10
        assert speed_perturb_numpy(w, 1.0) is w


class TestTransforms:
    def test_utterance_cmvn(self):
        rng = np.random.default_rng(1)
        feats = jnp.asarray(rng.normal(3.0, 2.0, size=(2, 20, 8)).astype(np.float32))
        lengths = jnp.asarray([20, 10])
        out = np.asarray(UtteranceCMVN()(feats, lengths))
        # valid region is normalised
        assert abs(out[0].mean()) < 1e-5
        assert abs(out[0].std() - 1.0) < 1e-2
        assert abs(out[1, :10].mean()) < 1e-5
        # padding is zeroed
        assert np.all(out[1, 10:] == 0)

    def test_specaugment_masks_something(self):
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.normal(size=(2, 50, 40)).astype(np.float32) + 5.0)
        lengths = jnp.asarray([50, 30])
        sa = SpecAugment(freq_mask_n=2, freq_mask_f=10, time_mask_n=2, time_mask_t=20)
        out = np.asarray(sa(feats, lengths, jax.random.PRNGKey(0)))
        assert out.shape == feats.shape
        changed = np.mean(out != np.asarray(feats))
        assert 0.01 < changed < 0.9
        # padding region untouched
        np.testing.assert_array_equal(out[1, 30:], np.asarray(feats)[1, 30:])

    def test_specaugment_jits(self):
        sa = SpecAugment()
        f = jax.jit(lambda x, l, k: sa(x, l, k))
        out = f(jnp.ones((2, 30, 20)), jnp.asarray([30, 15]), jax.random.PRNGKey(1))
        assert out.shape == (2, 30, 20)

    def test_composite_from_config(self):
        ct = CompositeTransform.from_config_dict(
            {
                "transforms": ["utterance_cmvn", "specaugment"],
                "specaugment": {"freq_mask_N": 1, "time_mask_N": 1},
            }
        )
        assert len(ct.transforms) == 2
        out = ct(jnp.ones((1, 10, 4)), jnp.asarray([10]), jax.random.PRNGKey(0))
        assert out.shape == (1, 10, 4)


class TestTimeWarp:
    """SpecAugment's W>0 time warp (1-D piecewise-linear resample — the
    exact form of the paper's warp; reference specaugment.py uses a cv2
    sparse image warp with the same endpoints)."""

    def _sa(self, W):
        from s2t_tpu.data.audio.transforms import SpecAugment

        return SpecAugment(time_warp_w=W, freq_mask_n=0, time_mask_n=0)

    def test_warp_zero_is_identity(self):
        import jax, jax.numpy as jnp
        feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 40, 8)),
                            jnp.float32)
        lengths = jnp.asarray([40, 25])
        out = self._sa(0)(feats, lengths, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(feats))

    def test_warp_moves_content_keeps_padding_and_range(self):
        import jax, jax.numpy as jnp
        rng = np.random.default_rng(1)
        feats = jnp.asarray(rng.normal(size=(3, 60, 8)), jnp.float32)
        lengths = jnp.asarray([60, 40, 10])
        sa = self._sa(5)
        out = np.asarray(sa(feats, lengths, jax.random.PRNGKey(3)))
        f = np.asarray(feats)
        # something moved on long rows
        assert np.abs(out[0, :60] - f[0, :60]).max() > 1e-6
        # padded tail untouched
        np.testing.assert_allclose(out[1, 40:], f[1, 40:])
        # too-short rows (len < 2W+2) stay identity
        np.testing.assert_allclose(out[2], f[2])
        # linear interpolation never leaves the convex hull per feature dim
        assert out[0].max() <= f[0].max() + 1e-5
        assert out[0].min() >= f[0].min() - 1e-5

    def test_warp_endpoints_fixed(self):
        """Frame 0 maps to source 0 (the warp pins sequence endpoints)."""
        import jax, jax.numpy as jnp
        feats = jnp.asarray(np.random.default_rng(2).normal(size=(1, 50, 4)),
                            jnp.float32)
        lengths = jnp.asarray([50])
        out = np.asarray(self._sa(4)(feats, lengths, jax.random.PRNGKey(1)))
        np.testing.assert_allclose(out[0, 0], np.asarray(feats)[0, 0],
                                   rtol=1e-5)

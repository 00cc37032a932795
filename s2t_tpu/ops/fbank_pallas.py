"""Fused Kaldi-fbank Pallas kernel.

The north-star kernel (BASELINE.json): framing → DC removal → preemphasis →
povey window → DFT → power spectrum → mel projection → log, fused in VMEM.

Formulation: every per-frame step before the power is LINEAR, so
DC-removal (I - J/400), preemphasis (banded P), and the window fold into the
DFT bases:  real_eff = Cᵀ Pᵀ diag(w) F_real  (400×257).  A 400-sample frame
with shift 160 decomposes into three contiguous 160/160/80-sample row views
of the waveform, so the whole feature pipeline becomes

    re = A @ real_eff[0:160] + B @ real_eff[160:320] + C @ real_eff[320:400]
    im =  (same with imag_eff)
    out = log(max((re² + im²) @ mel, eps))

— six MXU matmuls and a log, no dynamic slicing, no host round-trips.  The
row views A/B/C are built outside with XLA reshapes (one copy of the wave
each); the kernel tiles (BLOCK, ·) frames per grid step.

Parity: tested against fbank_numpy in interpret mode and on TPU.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s2t_tpu.data.audio.fbank import EPSILON, kaldi_mel_banks, povey_window

WS = 400  # window size (25 ms @ 16 kHz)
SH = 160  # shift (10 ms)
NFFT = 512
BLOCK = 128  # frames per program


@functools.lru_cache(maxsize=2)
def _effective_bases(n_mels: int):
    """Fold DC-removal, preemphasis and the povey window into the DFT bases."""
    k = np.arange(NFFT // 2 + 1)
    n = np.arange(WS)
    ang = -2.0 * math.pi * np.outer(n, k) / NFFT
    f_real = np.cos(ang)
    f_imag = np.sin(ang)
    w = povey_window(WS).astype(np.float64)
    # P: y[i] = x[i] - 0.97 x[i-1], first sample uses itself
    P = np.eye(WS) - 0.97 * np.eye(WS, k=-1)
    P[0, 0] = 1.0 - 0.97
    M = P.T @ np.diag(w)  # row-vector form: frame @ M @ F (no DC fold)
    real_eff = (M @ f_real).astype(np.float32)
    imag_eff = (M @ f_imag).astype(np.float32)
    # DC removal handled analytically: DFT(x - m·1) = DFT(x) - m·DFT(1);
    # folding it into the bases loses ~2 decimal digits to cancellation
    dc_re = (np.ones(WS) @ M @ f_real).astype(np.float32)
    dc_im = (np.ones(WS) @ M @ f_imag).astype(np.float32)
    mel = kaldi_mel_banks(n_mels, NFFT, 16000.0)
    return real_eff, imag_eff, dc_re[None, :], dc_im[None, :], mel


def _fbank_kernel(
    a_ref, b_ref, c_ref, r1, r2, r3, i1, i2, i3, dc_re, dc_im, mel_ref, out_ref
):
    # HIGHEST forces true-f32 MXU passes: int16-scale samples × 400-term DFT
    # sums lose ~2 digits under the default bf16-pass matmul
    dot = lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    c = c_ref[...].astype(jnp.float32)
    # per-frame mean for DC removal
    ws = a.shape[1] + b.shape[1] + c.shape[1]
    m = (
        jnp.sum(a, axis=1, keepdims=True)
        + jnp.sum(b, axis=1, keepdims=True)
        + jnp.sum(c, axis=1, keepdims=True)
    ) / ws
    re = dot(a, r1[...]) + dot(b, r2[...]) + dot(c, r3[...]) - m * dc_re[...]
    im = dot(a, i1[...]) + dot(b, i2[...]) + dot(c, i3[...]) - m * dc_im[...]
    power = re * re + im * im
    melspec = dot(power, mel_ref[...])
    out_ref[...] = jnp.log(jnp.maximum(melspec, EPSILON))


def fbank_pallas(
    waveforms: jnp.ndarray,
    lengths: jnp.ndarray,
    num_mel_bins: int = 80,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused fbank: (B, N) int16-scale waveforms -> (B, T, n_mels) features.

    Same contract as fbank_jax; frames beyond frame_lengths carry garbage.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = waveforms.shape
    T = 1 + (N - WS) // SH if N >= WS else 0
    n_blocks = max((T + BLOCK - 1) // BLOCK, 1)
    T_pad = n_blocks * BLOCK
    n_rows = T_pad + 2  # frame f = rows f, f+1, f+2[:80]
    need = n_rows * SH
    wave = waveforms.astype(jnp.float32)
    if need > N:
        wave = jnp.pad(wave, ((0, 0), (0, need - N)))
    else:
        wave = wave[:, :need]
    rows = wave.reshape(B, n_rows, SH)
    A = rows[:, :T_pad].reshape(B * T_pad, SH)
    Bv = rows[:, 1 : T_pad + 1].reshape(B * T_pad, SH)
    Cv = rows[:, 2 : T_pad + 2, : WS - 2 * SH].reshape(B * T_pad, WS - 2 * SH)

    real_eff, imag_eff, dc_re, dc_im, mel = _effective_bases(num_mel_bins)
    r1, r2, r3 = real_eff[:SH], real_eff[SH : 2 * SH], real_eff[2 * SH :]
    i1, i2, i3 = imag_eff[:SH], imag_eff[SH : 2 * SH], imag_eff[2 * SH :]

    def tile(cols):
        return pl.BlockSpec((BLOCK, cols), lambda t: (t, 0), memory_space=pltpu.VMEM)

    def full(arr):
        return pl.BlockSpec(arr.shape, lambda t: (0, 0), memory_space=pltpu.VMEM)

    consts = [jnp.asarray(x) for x in (r1, r2, r3, i1, i2, i3, dc_re, dc_im, mel)]
    out = pl.pallas_call(
        _fbank_kernel,
        grid=(B * T_pad // BLOCK,),
        in_specs=[tile(SH), tile(SH), tile(WS - 2 * SH)] + [full(c) for c in consts],
        out_specs=pl.BlockSpec(
            (BLOCK, num_mel_bins), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * T_pad, num_mel_bins), jnp.float32),
        interpret=interpret,
    )(A, Bv, Cv, *consts)

    out = out.reshape(B, T_pad, num_mel_bins)
    feats = out[:, :T] if T > 0 else out[:, :0]
    frame_lengths = jnp.where(lengths >= WS, 1 + (lengths - WS) // SH, 0).astype(
        jnp.int32
    )
    return feats, frame_lengths

"""Legacy speech/text modules kept for reference-surface parity.

(reference: fairseq/modules/vggblock.py:38-116 — VGG conv blocks for the
vggtransformer front-end; fairseq/modules/location_attention.py:11-83 —
location-aware attention of Chorowski et al. 2015 used by espnet-style
recurrent decoders; fairseq/modules/character_token_embedder.py:23-214 —
char-CNN + highway word embedder.)

All three are small, shape-static flax modules; the torch originals'
in-place masking / cached projections become pure function arguments.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG = -1e9


class VGGBlock(nn.Module):
    """num_conv_layers x (conv3x3 + [layernorm] + relu) + ceil-mode maxpool
    over (time, freq) NHWC input (reference vggblock.py:38-116)."""

    in_channels: int
    out_channels: int
    conv_kernel_size: int = 3
    pooling_kernel_size: int = 2
    num_conv_layers: int = 2
    input_dim: int = 80  # freq bins, for layer-norm shape / output_dim
    layer_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, F, C_in) -> (B, ceil(T/p), ceil(F/p), C_out)
        k = self.conv_kernel_size
        for i in range(self.num_conv_layers):
            x = nn.Conv(
                features=self.out_channels, kernel_size=(k, k),
                padding=[(k // 2, k // 2), (k // 2, k // 2)],
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            if self.layer_norm:
                x = nn.LayerNorm(dtype=self.dtype, name=f"norm{i}")(x)
            x = nn.relu(x)
        p = self.pooling_kernel_size
        if p and p > 1:
            # ceil mode: pad up to a multiple of p with -inf so edge windows
            # survive (torch MaxPool2d(ceil_mode=True))
            B, T, F, C = x.shape
            pt = (-T) % p
            pf = (-F) % p
            if pt or pf:
                x = jnp.pad(
                    x, ((0, 0), (0, pt), (0, pf), (0, 0)),
                    constant_values=-jnp.inf,
                )
            x = nn.max_pool(x, (p, p), strides=(p, p))
        return x

    @property
    def output_freq_dim(self) -> int:
        f = self.input_dim
        if self.pooling_kernel_size and self.pooling_kernel_size > 1:
            f = -(-f // self.pooling_kernel_size)
        return f

    @property
    def total_output_dim(self) -> int:
        return self.output_freq_dim * self.out_channels


class LocationAttention(nn.Module):
    """Location-aware additive attention (reference
    location_attention.py:11-83): the previous attention weights are
    convolved and added to the content score, biasing the new alignment to
    move locally."""

    attn_dim: int
    encoder_dim: int
    decoder_dim: int
    attn_state_kernel_size: int = 1  # rows of attention history fed to conv
    conv_dim: int = 10
    conv_kernel_size: int = 100
    scaling: float = 2.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.proj_enc = nn.Dense(self.attn_dim, dtype=self.dtype,
                                 name="proj_enc")
        self.proj_dec = nn.Dense(self.attn_dim, use_bias=False,
                                 dtype=self.dtype, name="proj_dec")
        self.proj_attn = nn.Dense(self.attn_dim, use_bias=False,
                                  dtype=self.dtype, name="proj_attn")
        self.conv = nn.Conv(
            features=self.conv_dim,
            kernel_size=(2 * self.conv_kernel_size + 1,),
            padding=[(self.conv_kernel_size, self.conv_kernel_size)],
            use_bias=False, dtype=self.dtype, name="conv",
        )
        self.proj_out = nn.Dense(1, dtype=self.dtype, name="proj_out")

    def __call__(
        self,
        encoder_out: jnp.ndarray,      # (B, T, D_enc)
        valid_mask: jnp.ndarray,       # (B, T) bool
        decoder_h: Optional[jnp.ndarray],  # (B, D_dec) or None (first step)
        attn_state: jnp.ndarray,       # (B, K, T) previous attention rows
        proj_enc_out: Optional[jnp.ndarray] = None,  # precomputed projection
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, _ = encoder_out.shape
        if proj_enc_out is None:
            proj_enc_out = self.project_encoder(encoder_out)
        # (B, K, T) -> conv over T with 'same' padding -> (B, T, conv_dim)
        h = self.conv(jnp.transpose(attn_state, (0, 2, 1)))
        h = self.proj_attn(h)
        if decoder_h is None:
            decoder_h = jnp.zeros((B, self.decoder_dim), encoder_out.dtype)
        dec = self.proj_dec(decoder_h)[:, None]
        score = self.proj_out(jnp.tanh(h + proj_enc_out + dec))[..., 0]
        score = jnp.where(valid_mask, score, NEG)
        w = jax.nn.softmax(self.scaling * score.astype(jnp.float32), axis=1)
        c = jnp.einsum("btd,bt->bd", encoder_out, w.astype(encoder_out.dtype))
        return c, w

    def project_encoder(self, encoder_out: jnp.ndarray) -> jnp.ndarray:
        """Cacheable encoder projection (the torch original memoises it on
        the module; here the caller holds it across decode steps)."""
        return self.proj_enc(encoder_out)


class Highway(nn.Module):
    """Highway layers (reference character_token_embedder.py Highway)."""

    dim: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            proj = nn.Dense(2 * self.dim, dtype=self.dtype, name=f"layer{i}")(x)
            h, gate = jnp.split(proj, 2, axis=-1)
            gate = jax.nn.sigmoid(gate)
            x = gate * x + (1 - gate) * nn.relu(h)
        return x


class CharacterTokenEmbedder(nn.Module):
    """Word embeddings composed from character CNNs + highway + projection
    (reference character_token_embedder.py:23-214).

    Input is (B, U, max_char_len) int32 char ids (0 = pad; the caller maps
    bytes+1 like the reference's 257-slot table).  Special symbols (eos/unk)
    use learned whole-word vectors selected by a flag row of all-zeros with
    char[0] in {1=eos, 2=unk} — TPU-static replacement for the reference's
    host-side vocab walk."""

    word_embed_dim: int
    char_embed_dim: int = 16
    filters: Sequence[Tuple[int, int]] = ((1, 64), (2, 128), (3, 192),
                                          (4, 256))  # (width, channels)
    highway_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, chars: jnp.ndarray) -> jnp.ndarray:
        B, U, L = chars.shape
        emb = nn.Embed(257, self.char_embed_dim, dtype=self.dtype,
                       name="char_embeddings")(chars)  # (B, U, L, C)
        x = emb.reshape(B * U, L, self.char_embed_dim)
        pools = []
        for width, channels in self.filters:
            h = nn.Conv(features=channels, kernel_size=(width,),
                        padding="VALID", dtype=self.dtype,
                        name=f"conv_w{width}")(x)
            # max over char positions; mask nothing — pad embeddings are
            # learned like the reference's padded conv input
            pools.append(jnp.max(nn.relu(h), axis=1))
        h = jnp.concatenate(pools, axis=-1)
        if self.highway_layers > 0:
            h = Highway(h.shape[-1], self.highway_layers, self.dtype,
                        name="highway")(h)
        out = nn.Dense(self.word_embed_dim, dtype=self.dtype,
                       name="projection")(h).reshape(B, U, self.word_embed_dim)
        # special symbols: rows whose char[0] is 1 (eos) or 2 (unk) AND the
        # rest zero use dedicated embeddings
        sym = self.param(
            "symbol_embeddings",
            nn.initializers.normal(self.word_embed_dim ** -0.5),
            (2, self.word_embed_dim),
        )
        only_first = jnp.sum(chars[..., 1:], axis=-1) == 0
        is_eos = (chars[..., 0] == 1) & only_first
        is_unk = (chars[..., 0] == 2) & only_first
        out = jnp.where(is_eos[..., None], sym[0].astype(out.dtype), out)
        out = jnp.where(is_unk[..., None], sym[1].astype(out.dtype), out)
        return out

"""wav2vec 2.0 — self-supervised speech pretraining, TPU-first.

(reference: fairseq/models/wav2vec/wav2vec2.py:37-909 — Wav2Vec2Model with
conv feature extractor, gumbel vector quantizer, span masking, negative
sampling and the contrastive InfoNCE head; fairseq/models/wav2vec/
wav2vec2_asr.py:133 Wav2VecCtc fine-tuning head.)

TPU re-design (static shapes end-to-end):
  * span masking is a jittable function: a *fixed* number of spans per row
    (from the static padded T), starts sampled within each row's valid
    length — replacing the numpy compute_mask_indices host roundtrip
    (reference: wav2vec2.py:346-383 + data_utils.compute_mask_indices)
  * masked positions form a dense (B, M) index array (M static), so target
    gathers, negative sampling, and the (1+N, B, M) contrastive logits are
    all fixed-shape tensor ops — no boolean-mask `.view` reshapes
  * negatives are sampled from the M masked positions of the same utterance
    (the reference default), via randint in [0, M-2] with a +1 shift past
    self — identical exclusion semantics to wav2vec2.py:389-414
  * the gumbel quantizer runs hard-ST in training with an annealed
    temperature passed in as data (no Python-side schedule in the graph)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2t_tpu.modules.layers import S2TEncoderLayer
from s2t_tpu.registry import register_model, register_model_architecture
from s2t_tpu.utils.masking import lengths_to_mask
from s2t_tpu.modules.dropout import Dropout as _FastDropout


@dataclass(frozen=True)
class Wav2Vec2Config:
    # conv feature extractor: (dim, kernel, stride) per layer
    # (reference default "[(512,10,5)] + [(512,3,2)]*4 + [(512,2,2)]*2")
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2),
    )
    extractor_mode: str = "default"  # default (group-norm 1st layer) | layer_norm
    conv_bias: bool = False
    feature_grad_mult: float = 0.1
    # encoder
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_layers: int = 12
    encoder_attention_heads: int = 12
    activation_fn: str = "gelu"
    layer_norm_first: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    dropout_input: float = 0.1
    dropout_features: float = 0.1
    # masking
    mask_prob: float = 0.65
    mask_length: int = 10
    min_masks: int = 2
    mask_channel_prob: float = 0.0
    mask_channel_length: int = 10
    # quantizer
    quantize_targets: bool = True
    latent_vars: int = 320
    latent_groups: int = 2
    latent_dim: int = 0
    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    # contrastive
    final_dim: int = 256
    num_negatives: int = 100
    logit_temp: float = 0.1
    normalize: bool = False  # dataset-side waveform normalisation flag
    dtype_str: str = "float32"

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32


def conv_out_lengths(lengths: jnp.ndarray, layers) -> jnp.ndarray:
    """Output lengths after the conv extractor (reference:
    wav2vec2.py:459-473 _get_feat_extract_output_lengths)."""
    for _, k, s in layers:
        lengths = (lengths - k) // s + 1
    return lengths


@jax.custom_vjp
def grad_multiply(x, scale):
    return x


def _gm_fwd(x, scale):
    return x, scale


def _gm_bwd(scale, g):
    return (g * scale, None)


grad_multiply.defvjp(_gm_fwd, _gm_bwd)


class ConvFeatureExtractor(nn.Module):
    """Raw waveform → frame features (reference: wav2vec2.py:639-718).

    default mode: group-norm (per-channel over time) after the first conv;
    layer_norm mode: layer norm after every conv.  GELU throughout.
    """

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T_samples) → (B, T_frames, C)
        h = x[..., None]
        for i, (dim, k, s) in enumerate(self.cfg.conv_feature_layers):
            h = nn.Conv(
                features=dim, kernel_size=(k,), strides=(s,), padding="VALID",
                use_bias=self.cfg.conv_bias, dtype=self.cfg.dtype, name=f"conv{i}",
            )(h)
            if self.cfg.extractor_mode == "layer_norm":
                h = nn.LayerNorm(dtype=self.cfg.dtype, name=f"norm{i}")(h)
            elif i == 0:  # default: group norm on the first layer only
                h = nn.GroupNorm(
                    num_groups=dim, dtype=self.cfg.dtype, name="group_norm"
                )(h)
            h = nn.gelu(h, approximate=False)
        return h


class ConvPositionalEmbedding(nn.Module):
    """Grouped conv relative positional embedding (reference:
    wav2vec2.py:734-747 pos_conv: k=128 groups=16 + SamePad + GELU)."""

    dim: int
    kernel: int = 128
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel // 2
        h = nn.Conv(
            features=self.dim, kernel_size=(self.kernel,),
            padding=[(pad, pad)], feature_group_count=self.groups,
            dtype=self.dtype, name="conv",
        )(x)
        if self.kernel % 2 == 0:  # SamePad: drop the trailing frame
            h = h[:, : x.shape[1]]
        return nn.gelu(h, approximate=False)


class GumbelVectorQuantizer(nn.Module):
    """Gumbel-softmax vector quantizer (reference:
    fairseq/modules/gumbel_vector_quantizer.py, used at wav2vec2.py:289-299).

    Returns (quantized (B, T, vq_dim), prob_perplexity, code_perplexity).
    """

    input_dim: int
    num_vars: int = 320
    groups: int = 2
    vq_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temp: jnp.ndarray, deterministic: bool = True
    ):
        B, T, _ = x.shape
        G, V = self.groups, self.num_vars
        logits = nn.Dense(G * V, dtype=self.dtype, name="weight_proj")(x)
        logits = logits.reshape(B, T, G, V).astype(jnp.float32)

        probs_avg = jax.nn.softmax(logits, axis=-1).reshape(B * T, G, V).mean(0)
        prob_ppl = jnp.sum(
            jnp.exp(-jnp.sum(probs_avg * jnp.log(probs_avg + 1e-7), axis=-1))
        )
        hard_idx = jnp.argmax(logits, axis=-1)
        hard_onehot = jax.nn.one_hot(hard_idx, V, dtype=jnp.float32)
        code_avg = hard_onehot.reshape(B * T, G, V).mean(0)
        code_ppl = jnp.sum(
            jnp.exp(-jnp.sum(code_avg * jnp.log(code_avg + 1e-7), axis=-1))
        )

        if deterministic:
            q = hard_onehot
        else:
            g = -jnp.log(
                -jnp.log(
                    jax.random.uniform(
                        self.make_rng("dropout"), logits.shape,
                        minval=1e-6, maxval=1.0 - 1e-6,
                    )
                )
            )
            y_soft = jax.nn.softmax((logits + g) / temp, axis=-1)
            y_hard = jax.nn.one_hot(jnp.argmax(y_soft, -1), V, dtype=jnp.float32)
            q = y_hard + y_soft - jax.lax.stop_gradient(y_soft)  # straight-through

        # codebook: (G, V, vq_dim // G)
        vars_ = self.param(
            "vars", nn.initializers.uniform(1.0), (G, V, self.vq_dim // G),
        )
        out = jnp.einsum("btgv,gvd->btgd", q, vars_.astype(jnp.float32))
        out = out.reshape(B, T, self.vq_dim).astype(x.dtype)
        return out, prob_ppl, code_ppl


def sample_mask_spans(
    rng: jnp.ndarray, B: int, T: int, lengths: jnp.ndarray,
    mask_prob: float, mask_length: int, min_masks: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample masked positions: (positions (B, M) int32, mask (B, T) bool).

    M = n_spans * mask_length is static (derived from padded T).  Span starts
    are uniform in [0, valid_len - mask_length] per row (reference:
    data_utils.compute_mask_indices "static" policy).
    """
    n_spans = max(min_masks, int(mask_prob * T / float(mask_length)))
    max_start = jnp.maximum(lengths - mask_length, 1)
    u = jax.random.uniform(rng, (B, n_spans))
    starts = (u * max_start[:, None].astype(jnp.float32)).astype(jnp.int32)
    positions = (starts[:, :, None] + jnp.arange(mask_length)[None, None, :]).reshape(
        B, n_spans * mask_length
    )
    positions = jnp.minimum(positions, T - 1)
    mask = jnp.zeros((B, T), bool)
    mask = mask.at[jnp.arange(B)[:, None], positions].set(True)
    return positions, mask


@register_model("wav2vec2")
class Wav2Vec2Model(nn.Module):
    """Pretraining model: returns contrastive logits + penalties.

    __call__(source, lengths, deterministic, temp, features_only)
      features_only=True → {"x": (B,T,D), "lengths": (B,)} for fine-tuning.
      otherwise → {"logits": (1+N, B, M), "prob_perplexity", "num_vars",
                   "features_pen", "mask_positions"}.
    """

    cfg: Wav2Vec2Config

    def setup(self):
        cfg = self.cfg
        self.feature_extractor = ConvFeatureExtractor(cfg, name="feature_extractor")
        self.embed = cfg.conv_feature_layers[-1][0]
        self.post_norm = nn.LayerNorm(dtype=cfg.dtype, name="layer_norm")
        if self.embed != cfg.encoder_embed_dim:
            self.post_extract_proj = nn.Dense(
                cfg.encoder_embed_dim, dtype=cfg.dtype, name="post_extract_proj"
            )
        final_dim = cfg.final_dim if cfg.final_dim > 0 else cfg.encoder_embed_dim
        if cfg.quantize_targets:
            vq_dim = cfg.latent_dim if cfg.latent_dim > 0 else final_dim
            self.quantizer = GumbelVectorQuantizer(
                self.embed, cfg.latent_vars, cfg.latent_groups, vq_dim,
                cfg.dtype, name="quantizer",
            )
        self.project_q = nn.Dense(final_dim, dtype=cfg.dtype, name="project_q")
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(1.0), (cfg.encoder_embed_dim,)
        )
        self.pos_conv = ConvPositionalEmbedding(
            cfg.encoder_embed_dim, cfg.conv_pos, cfg.conv_pos_groups, cfg.dtype,
            name="pos_conv",
        )
        self.encoder_norm = nn.LayerNorm(dtype=cfg.dtype, name="encoder_norm")
        self.layers = [
            S2TEncoderLayer(
                cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim,
                cfg.encoder_attention_heads, cfg.dropout, cfg.attention_dropout,
                cfg.activation_dropout, cfg.activation_fn,
                cfg.layer_norm_first, "abs", False, False, 31, cfg.dtype,
                name=f"layer{i}",
            )
            for i in range(cfg.encoder_layers)
        ]
        self.final_proj = nn.Dense(final_dim, dtype=cfg.dtype, name="final_proj")
        self.drop_input = _FastDropout(cfg.dropout_input)
        self.drop_features = _FastDropout(cfg.dropout_features)
        self.encoder_drop = _FastDropout(cfg.dropout)

    def _encode(self, x, valid, deterministic):
        from s2t_tpu.modules.attention import padding_bias

        x = x + self.pos_conv(x)
        if not self.cfg.layer_norm_first:
            x = self.encoder_norm(x)
        x = self.encoder_drop(x, deterministic=deterministic)
        bias = padding_bias(valid, x.dtype)
        for layer in self.layers:
            x = layer(x, valid, bias, None, deterministic)
        if self.cfg.layer_norm_first:
            x = self.encoder_norm(x)
        return x

    def _features(self, source, lengths):
        feats = self.feature_extractor(source)
        if self.cfg.feature_grad_mult != 1.0:
            feats = grad_multiply(feats, self.cfg.feature_grad_mult)
        out_lengths = conv_out_lengths(lengths, self.cfg.conv_feature_layers)
        return feats, out_lengths

    def __call__(
        self,
        source: jnp.ndarray,
        lengths: jnp.ndarray,
        deterministic: bool = True,
        temp: float = 0.5,
        features_only: bool = False,
        apply_mask: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        feats, out_lengths = self._features(source, lengths)
        features_pen = jnp.mean(feats.astype(jnp.float32) ** 2)
        feats = self.post_norm(feats)
        unmasked = feats
        if self.embed != cfg.encoder_embed_dim:
            x = self.post_extract_proj(feats)
        else:
            x = feats
        x = self.drop_input(x, deterministic=deterministic)
        unmasked = self.drop_features(unmasked, deterministic=deterministic)

        B, T, _ = x.shape
        valid = lengths_to_mask(out_lengths, T)

        if features_only:
            if apply_mask and not deterministic:
                # fine-tuning regulariser: same span masking as pretraining
                # (reference: wav2vec2_asr.py Wav2VecCtc apply_mask)
                rng = self.make_rng("dropout")
                _, mask = sample_mask_spans(
                    rng, B, T, out_lengths, cfg.mask_prob, cfg.mask_length,
                    cfg.min_masks,
                )
                x = jnp.where(
                    mask[..., None], self.mask_emb.astype(x.dtype)[None, None], x
                )
            x = self._encode(x, valid, deterministic)
            return {"x": x, "lengths": out_lengths}

        rng = self.make_rng("dropout")
        positions, mask = sample_mask_spans(
            rng, B, T, out_lengths, cfg.mask_prob, cfg.mask_length, cfg.min_masks
        )
        x = jnp.where(mask[..., None], self.mask_emb.astype(x.dtype)[None, None], x)
        x = self._encode(x, valid, deterministic)

        # targets at masked positions: (B, M, C)
        y_src = jnp.take_along_axis(unmasked, positions[..., None], axis=1)
        prob_ppl = code_ppl = None
        if cfg.quantize_targets:
            y, prob_ppl, code_ppl = self.quantizer(
                y_src, jnp.asarray(temp, jnp.float32), deterministic
            )
        else:
            y = y_src
        y = self.project_q(y)

        # negatives from the same utterance's masked positions
        M = positions.shape[1]
        nrng = self.make_rng("dropout") if not deterministic else jax.random.PRNGKey(0)
        neg_idx = jax.random.randint(
            nrng, (B, M, cfg.num_negatives), 0, max(M - 1, 1)
        )
        self_idx = jnp.arange(M)[None, :, None]
        neg_idx = jnp.where(neg_idx >= self_idx, neg_idx + 1, neg_idx)
        neg_idx = jnp.minimum(neg_idx, M - 1)
        negs = jnp.take_along_axis(
            y[:, None], neg_idx[..., None], axis=2
        )  # y (B,1,M,C) gathered at (B,M,N,1) -> (B,M,N,C)

        cx = self.final_proj(jnp.take_along_axis(x, positions[..., None], axis=1))

        # cosine-similarity logits: (1+N, B, M) (reference compute_preds :444)
        targets = jnp.concatenate([y[:, :, None], negs], axis=2)  # (B,M,1+N,C)
        cxf = cx.astype(jnp.float32)
        tf = targets.astype(jnp.float32)
        cos = jnp.sum(cxf[:, :, None] * tf, -1) / (
            jnp.linalg.norm(cxf, axis=-1)[:, :, None] * jnp.linalg.norm(tf, axis=-1)
            + 1e-8
        )
        logits = cos / cfg.logit_temp  # (B, M, 1+N)
        neg_is_pos = jnp.all(targets[:, :, 1:] == y[:, :, None], axis=-1)
        logits = logits.at[:, :, 1:].set(
            jnp.where(neg_is_pos, -jnp.inf, logits[:, :, 1:])
        )
        logits = jnp.transpose(logits, (2, 0, 1))  # (1+N, B, M)

        out = {
            "logits": logits,
            "features_pen": features_pen,
            "mask_positions": positions,
            "mask_valid": jnp.take_along_axis(valid, positions, axis=1),
        }
        if prob_ppl is not None:
            out["prob_perplexity"] = prob_ppl
            out["code_perplexity"] = code_ppl
            out["num_vars"] = cfg.latent_vars * cfg.latent_groups
        return out

    def extract_features(self, source, lengths, deterministic: bool = True,
                         apply_mask: bool = False):
        out = self(source, lengths, deterministic, features_only=True,
                   apply_mask=apply_mask)
        return out["x"], out["lengths"]


@dataclass(frozen=True)
class Wav2VecCtcConfig(Wav2Vec2Config):
    vocab_size: int = 32
    final_dropout: float = 0.0


@register_model("wav2vec_ctc")
class Wav2VecCtc(nn.Module):
    """Fine-tuning: w2v2 encoder + CTC head over characters/BPE
    (reference: fairseq/models/wav2vec/wav2vec2_asr.py:133 Wav2VecCtc)."""

    cfg: Wav2VecCtcConfig

    def setup(self):
        self.w2v = Wav2Vec2Model(self.cfg, name="w2v")
        self.proj = nn.Dense(self.cfg.vocab_size, dtype=self.cfg.dtype, name="proj")
        self.final_drop = _FastDropout(self.cfg.final_dropout)

    def __call__(self, source, lengths, deterministic: bool = True):
        # span masking stays active as a fine-tuning regulariser in training
        x, out_lengths = self.w2v.extract_features(
            source, lengths, deterministic, apply_mask=not deterministic
        )
        x = self.final_drop(x, deterministic=deterministic)
        logits = self.proj(x)
        return {
            "encoder_out": x,
            "ctc_logits": logits,
            "encoder_lengths": out_lengths,
            "inter_ctc_logits": (),
            "xctc_logits": None,
            "inter_xctc_logits": (),
            "mixup": None,
        }


@dataclass(frozen=True)
class Wav2VecSeq2SeqConfig(Wav2Vec2Config):
    vocab_size: int = 10000
    decoder_embed_dim: int = 768
    decoder_ffn_embed_dim: int = 3072
    decoder_layers: int = 6
    decoder_attention_heads: int = 4
    decoder_dropout: float = 0.1
    decoder_attention_dropout: float = 0.1
    decoder_activation_dropout: float = 0.0
    decoder_learned_pos: bool = False
    decoder_normalize_before: bool = False
    share_decoder_input_output_embed: bool = False
    max_target_positions: int = 2048
    final_dropout: float = 0.0
    pad_id: int = 1


@register_model("wav2vec_seq2seq")
class Wav2VecSeq2Seq(nn.Module):
    """Fine-tuning: w2v2 encoder + autoregressive transformer decoder
    (reference: fairseq/models/wav2vec/wav2vec2_asr.py:226
    Wav2Vec2Seq2SeqModel — the seq2seq alternative to the CTC head,
    trained with label-smoothed CE).  The batch interface matches the
    speech_to_text task (features = raw waveform here), so the standard
    trainer, criterion, and beam generator drive it unchanged."""

    cfg: Wav2VecSeq2SeqConfig

    def setup(self):
        from s2t_tpu.models.transformer_decoder import TransformerDecoder

        cfg = self.cfg
        self.w2v = Wav2Vec2Model(cfg, name="w2v")
        if cfg.encoder_embed_dim != cfg.decoder_embed_dim:
            self.enc_proj = nn.Dense(
                cfg.decoder_embed_dim, dtype=cfg.dtype, name="enc_proj"
            )
        self.final_drop = _FastDropout(cfg.final_dropout)
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size,
            embed_dim=cfg.decoder_embed_dim,
            ffn_dim=cfg.decoder_ffn_embed_dim,
            num_layers=cfg.decoder_layers,
            num_heads=cfg.decoder_attention_heads,
            dropout=cfg.decoder_dropout,
            attention_dropout=cfg.decoder_attention_dropout,
            activation_dropout=cfg.decoder_activation_dropout,
            normalize_before=cfg.decoder_normalize_before,
            share_input_output_embed=cfg.share_decoder_input_output_embed,
            learned_pos=cfg.decoder_learned_pos,
            max_positions=cfg.max_target_positions,
            pad_id=cfg.pad_id,
            dtype=cfg.dtype,
            name="decoder",
        )

    def _encode_w2v(self, source, lengths, deterministic):
        x, out_lengths = self.w2v.extract_features(
            source, lengths, deterministic, apply_mask=not deterministic
        )
        x = self.final_drop(x, deterministic=deterministic)
        if self.cfg.encoder_embed_dim != self.cfg.decoder_embed_dim:
            x = self.enc_proj(x)
        return x, out_lengths

    def __call__(self, source, lengths, prev_tokens, deterministic: bool = True,
                 **_unused):
        x, out_lengths = self._encode_w2v(source, lengths, deterministic)
        enc_mask = lengths_to_mask(out_lengths, x.shape[1])
        logits = self.decoder(prev_tokens, x, enc_mask, deterministic)
        return {
            "decoder_logits": logits,
            "encoder_out": x,
            "encoder_lengths": out_lengths,
            "ctc_logits": None,
            "inter_ctc_logits": (),
            "xctc_logits": None,
            "inter_xctc_logits": (),
            "mixup": None,
        }

    # --- inference-facing methods (same surface as S2TTransformerModel) ----
    def encode(self, source, lengths, deterministic: bool = True):
        x, out_lengths = self._encode_w2v(source, lengths, deterministic)
        return {"encoder_out": x, "encoder_lengths": out_lengths}

    def decode(self, prev_tokens, encoder_out, encoder_valid_mask):
        return self.decoder(prev_tokens, encoder_out, encoder_valid_mask, True)

    def decode_step(self, tokens, cache, index, encoder_out, encoder_valid_mask,
                    cross_kv=None):
        return self.decoder.step(tokens, cache, index, encoder_out,
                                 encoder_valid_mask, cross_kv=cross_kv)

    def precompute_cross(self, encoder_out):
        return self.decoder.precompute_cross(encoder_out)

    def init_cache(self, batch_size: int, max_len: int, kv_int8: bool = False):
        return self.decoder.init_cache(batch_size, max_len, kv_int8=kv_int8)


@register_model_architecture("wav2vec2", "wav2vec2_base")
def wav2vec2_base(**kw) -> Wav2Vec2Config:
    return Wav2Vec2Config().replace(**kw)


@register_model_architecture("wav2vec_seq2seq", "wav2vec_seq2seq")
def wav2vec_seq2seq_arch(**kw) -> Wav2VecSeq2SeqConfig:
    return Wav2VecSeq2SeqConfig().replace(**kw)


@register_model_architecture("wav2vec_ctc", "wav2vec_ctc")
def wav2vec_ctc_arch(**kw) -> Wav2VecCtcConfig:
    return Wav2VecCtcConfig().replace(**kw)


@register_model_architecture("wav2vec2", "wav2vec2_large")
def wav2vec2_large(**kw) -> Wav2Vec2Config:
    return Wav2Vec2Config(
        encoder_embed_dim=1024, encoder_ffn_embed_dim=4096, encoder_layers=24,
        encoder_attention_heads=16, final_dim=768, layer_norm_first=True,
        extractor_mode="layer_norm", feature_grad_mult=1.0,
    ).replace(**kw)

"""SequenceGenerator: encoder-once + jitted beam search over the decoder.

(reference: fairseq/sequence_generator.py:21-786.  The reference's per-step
Python loop with host-side CTC prefix numpy state (:355-386) is replaced by a
single compiled program per batch shape.)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger("s2t_tpu.generator")

from s2t_tpu.inference.beam_search import beam_search
from s2t_tpu.utils.masking import lengths_to_mask


def _expand_to_beam(x: jnp.ndarray, K: int) -> jnp.ndarray:
    """(B, ...) -> (B*K, ...) by repeat."""
    return jnp.repeat(x, K, axis=0)


class SequenceGenerator:
    def __init__(
        self,
        model,
        beam_size: int = 5,
        max_len_a: float = 0.0,
        max_len_b: int = 200,
        min_len: int = 1,
        lenpen: float = 1.0,
        temperature: float = 1.0,
        no_repeat_ngram_size: int = 0,
        eos_id: int = 2,
        pad_id: int = 1,
        # banned output index; the reference fork bans index 0 (CTC blank ==
        # <s> in fairseq dicts) in every decode (sequence_generator.py:74,401).
        # Set to -1 to allow it.
        blank_id: int = 0,
        max_target_positions: Optional[int] = None,
        input_keys: Tuple[str, str] = ("features", "feat_lengths"),
        infer_ctc_weight: float = 0.0,
        ctc_prune_k: int = 8,
        lm_model=None,
        lm_params=None,
        lm_weight: float = 0.0,
        sampling: bool = False,
        sampling_topk: int = -1,
        sampling_topp: float = -1.0,
        sampling_seed: int = 0,
        # optional (max_len, B*K) uniforms for a deterministic inverse-CDF
        # draw — parity/testing hook mirroring torch.multinomial's contract
        # (inference/sampling.py noise_uniforms)
        sampling_noise=None,
        prefix_size: int = 0,
        diverse_beam_groups: int = -1,
        diverse_beam_strength: float = 0.5,
        diversity_rate: float = -1.0,
        constraints_mode: Optional[str] = None,
        static_cross_kv: bool = True,
        kv_cache_dtype: str = "model",  # model dtype | "int8" (halves the
        # beam loop's cache-reorder bytes; modules/attention.py int8 branch)
        # keep the KV cache in place and select ancestor slots inside
        # attention instead of physically reordering per step.  Token-exact
        # (tests/test_lazy_reorder.py) but measured SLOWER at B=256 beam-5
        # on v5e (1321x vs 1613x): the (K, K)-shaped selection tensors pad
        # 5 -> 8 on both sublane dims and the extra VPU traffic outweighs
        # the saved reorder bytes.  Off by default; revisit for large-K or
        # long-output regimes where the reorder dominates harder.
        lazy_beam_reorder: bool = False,
        extra_models: Optional[list] = None,
    ):
        self.kv_int8 = kv_cache_dtype == "int8"
        self.lazy_beam_reorder = lazy_beam_reorder
        self.model = model
        self.beam_size = beam_size
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.min_len = min_len
        self.lenpen = lenpen
        self.temperature = temperature
        self.no_repeat_ngram_size = no_repeat_ngram_size
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.blank_id = blank_id
        self.max_target_positions = max_target_positions or getattr(
            model.cfg, "max_target_positions", 1024
        )
        self.input_keys = input_keys
        self.infer_ctc_weight = infer_ctc_weight
        self.ctc_prune_k = ctc_prune_k
        # shallow LM fusion (reference: sequence_generator.py lm_model/lm_weight)
        self.lm_model = lm_model
        self.lm_params = lm_params
        self.lm_weight = lm_weight
        self.sampling = sampling
        self.sampling_topk = sampling_topk
        self.sampling_topp = sampling_topp
        self.sampling_seed = sampling_seed
        self.sampling_noise = sampling_noise
        # --prefix-size target forcing (reference: sequence_generator.py:616)
        self.prefix_size = prefix_size
        # DiverseBeamSearch groups (reference: search.py:552)
        if diverse_beam_groups > 1 and beam_size % diverse_beam_groups != 0:
            # fail here with a clear message instead of an opaque reshape
            # error inside the compiled scan (fairseq raises the same way)
            raise ValueError(
                f"beam_size ({beam_size}) must be divisible by "
                f"diverse_beam_groups ({diverse_beam_groups})"
            )
        self.diverse_beam_groups = diverse_beam_groups
        self.diverse_beam_strength = diverse_beam_strength
        # DiverseSiblingsSearch rank penalty (reference: search.py:746,
        # selected by --diversity-rate > 0)
        self.diversity_rate = diversity_rate
        # lexically constrained decoding (reference: search.py:211; mode
        # "ordered" or "unordered"); constraints ride in via
        # batch["constraints"] as a (B, C, Lc) pad-padded id tensor
        self.constraints_mode = constraints_mode
        # beam-shared precomputed cross-attention K/V (see note in _build);
        # on by default — measured 1373x -> 1612x RTF on v5e (B=256 beam 5)
        self.static_cross_kv = static_cross_kv
        # true multi-model ensembling in probability space (reference:
        # EnsembleModel, sequence_generator.py:788-900); params for the extra
        # models ride in at generate() time
        self.extra_models = extra_models or []
        self._jitted = {}

    def _max_len_for(self, enc_T: int) -> int:
        return int(
            min(self.max_len_a * enc_T + self.max_len_b, self.max_target_positions - 1)
        )

    def _build(
        self, max_len: int, with_prefix: bool = False,
        with_constraints: bool = False,
    ):
        K = self.beam_size
        n_extra = len(self.extra_models)

        def run(params, features, feat_lengths, extra_params, prefix_tokens,
                constraints, lm_params):
            enc = self.model.apply(
                {"params": params}, features, feat_lengths, method=self.model.encode
            )
            enc_out = enc["encoder_out"]
            B = enc_out.shape[0]
            enc_mask = lengths_to_mask(enc["encoder_lengths"], enc_out.shape[1])
            enc_out_b = _expand_to_beam(enc_out, K)
            enc_mask_b = _expand_to_beam(enc_mask, K)
            # NOTE on cross-attention K/V: the reference caches PER-BEAM
            # static K/V; on TPU the decode loop is HBM-bandwidth-bound and
            # per-beam caching loses to per-step recompute (943x vs 1241x
            # RTF, B=64 beam 5 on v5e).  The winning form is BEAM-SHARED:
            # project K/V once per SENTENCE (B rows, not B*K) and group the
            # K beams against the shared rows inside attention
            # (MultiHeadAttention._grouped_cross) — 1/K of the projection
            # FLOPs and reads, measured 1373x -> 1612x RTF at B=256 beam 5.
            # static_cross_kv=False restores per-step recompute.
            cross_kv = None
            if self.static_cross_kv and hasattr(self.model, "precompute_cross"):
                cross_kv = self.model.apply(
                    {"params": params}, enc_out,
                    method=self.model.precompute_cross,
                )
            cache_kw = {}
            if self.kv_int8:
                import inspect as _inspect

                if "kv_int8" in _inspect.signature(
                        self.model.init_cache).parameters:
                    cache_kw = {"kv_int8": True}
                else:
                    logger.warning(
                        "%s.init_cache has no int8 cache mode; decoding at "
                        "full precision", type(self.model).__name__,
                    )
            cache = self.model.apply(
                {"params": params}, B * K, max_len, method=self.model.init_cache,
                **cache_kw,
            )
            use_lm = self.lm_model is not None and self.lm_weight != 0.0
            if use_lm:
                lm_cache = self.lm_model.apply(
                    {"params": lm_params}, B * K, max_len,
                    method=self.lm_model.init_cache,
                )
                cache = {"dec": cache, "lm": lm_cache}
            if n_extra:
                # ensemble: every member keeps its own encoder-out and cache
                extra_ctx = []
                extra_caches = {}
                for mi, (em, ep) in enumerate(zip(self.extra_models, extra_params)):
                    e_enc = em.apply(
                        {"params": ep}, features, feat_lengths, method=em.encode
                    )
                    e_mask = lengths_to_mask(
                        e_enc["encoder_lengths"], e_enc["encoder_out"].shape[1]
                    )
                    extra_ctx.append(
                        (_expand_to_beam(e_enc["encoder_out"], K),
                         _expand_to_beam(e_mask, K))
                    )
                    extra_caches[f"m{mi}"] = em.apply(
                        {"params": ep}, B * K, max_len, method=em.init_cache
                    )
                cache = {"dec": cache, **extra_caches} if not use_lm else {
                    **cache, **extra_caches
                }

            def decode_step(tokens, cache, index, ancestry=None):
                nested = use_lm or n_extra
                dec_cache = cache["dec"] if nested else cache
                kw = {} if cross_kv is None else {"cross_kv": cross_kv}
                if ancestry is not None:
                    kw["ancestry"] = ancestry
                logits, new_dec = self.model.apply(
                    {"params": params},
                    tokens,
                    dec_cache,
                    index,
                    enc_out_b,
                    enc_mask_b,
                    method=self.model.decode_step,
                    **kw,
                )
                logits = logits.astype(jnp.float32) / self.temperature
                lprobs = jax.nn.log_softmax(logits, axis=-1)
                new_cache = {"dec": new_dec} if nested else new_dec
                if n_extra:
                    # average in probability space (reference: EnsembleModel
                    # avg_probs, sequence_generator.py:860-900)
                    all_lp = [lprobs]
                    for mi, (em, ep) in enumerate(
                        zip(self.extra_models, extra_params)
                    ):
                        eo, emask = extra_ctx[mi]
                        lg, nc = em.apply(
                            {"params": ep}, tokens, cache[f"m{mi}"], index,
                            eo, emask, method=em.decode_step,
                        )
                        all_lp.append(
                            jax.nn.log_softmax(
                                lg.astype(jnp.float32) / self.temperature, -1
                            )
                        )
                        new_cache[f"m{mi}"] = nc
                    stacked = jnp.stack(all_lp)
                    lprobs = jax.nn.logsumexp(stacked, axis=0) - jnp.log(
                        float(len(all_lp))
                    )
                if use_lm:
                    lm_logits, new_lm = self.lm_model.apply(
                        {"params": lm_params}, tokens, cache["lm"], index,
                        method=self.lm_model.decode_step,
                    )
                    lm_lprobs = jax.nn.log_softmax(lm_logits.astype(jnp.float32), -1)
                    lprobs = lprobs + self.lm_weight * lm_lprobs
                    new_cache["lm"] = new_lm
                return lprobs, new_cache

            if self.sampling:
                from s2t_tpu.inference.sampling import sampling_decode

                tokens, scores = sampling_decode(
                    decode_step, cache, jax.random.PRNGKey(self.sampling_seed),
                    batch_size=B, num_samples=K, max_len=max_len,
                    eos_id=self.eos_id, pad_id=self.pad_id, bos_id=self.eos_id,
                    blank_id=self.blank_id,
                    temperature=1.0,  # decode_step already applies temperature
                    topk=self.sampling_topk, topp=self.sampling_topp,
                    min_len=self.min_len,
                    noise_uniforms=self.sampling_noise,
                )
                return tokens, scores, enc

            if with_constraints:
                from s2t_tpu.inference.constrained import constrained_beam_search

                tokens, scores = constrained_beam_search(
                    decode_step, cache, constraints,
                    batch_size=B, beam_size=K, max_len=max_len,
                    eos_id=self.eos_id, pad_id=self.pad_id, bos_id=self.eos_id,
                    blank_id=self.blank_id,
                    lenpen=self.lenpen, min_len=self.min_len,
                    ordered=self.constraints_mode == "ordered",
                )
                return tokens, scores, enc

            ctc_scorer = None
            if self.infer_ctc_weight > 0:
                # joint CTC rescoring from the encoder's CTC lattice
                # (XCTC — target-language CTC — when the model has one;
                # reference: sequence_generator.py:255-269)
                from s2t_tpu.inference.ctc_prefix import CTCPrefixScorer

                ctc_logits = enc.get("xctc_logits")
                if ctc_logits is None:
                    ctc_logits = enc.get("ctc_logits")
                if ctc_logits is not None:
                    ctc_scorer = CTCPrefixScorer(
                        jax.nn.log_softmax(ctc_logits.astype(jnp.float32), -1),
                        enc["encoder_lengths"],
                        beam_size=K,
                        # the lattice blank is index 0 regardless of whether
                        # the generator bans it as an output token
                        blank_id=self.blank_id if self.blank_id >= 0 else 0,
                        eos_id=self.eos_id,
                    )

            G = self.diverse_beam_groups
            # LAZY BEAM REORDER (plain single-model beam only): the KV cache
            # never moves; a (B, K, max_len) ancestry map rides in the cache
            # pytree and attention selects ancestor slots in place
            # (modules/attention.py cache_ancestry).  Token-identical to the
            # eager reorder (tests/test_lazy_reorder.py), and removes the
            # decode loop's single most expensive op (docs/serving.md).
            beam_step = decode_step
            reorder_fn = None
            import inspect

            lazy = (
                self.lazy_beam_reorder
                and not (use_lm or n_extra)
                and not self.kv_int8
                and K > 1
                and hasattr(self.model, "decode_step")
                and "ancestry"
                in inspect.signature(self.model.decode_step).parameters
            )
            if lazy:
                anc0 = jnp.zeros((B, K, max_len), jnp.int32)
                cache = {"dec_kv": cache, "anc": anc0}

                def beam_step(tokens, cache_l, index):
                    # one source of truth: the shared decode_step closure
                    # does all logits post-processing
                    lprobs, new_kv = decode_step(
                        tokens, cache_l["dec_kv"], index,
                        ancestry=cache_l["anc"],
                    )
                    return lprobs, {"dec_kv": new_kv, "anc": cache_l["anc"]}

                def reorder_fn(cache_l, idx, i):
                    anc = jnp.take_along_axis(
                        cache_l["anc"], idx[:, :, None], axis=1
                    )
                    anc = anc.at[:, :, i].set(idx)
                    return {"dec_kv": cache_l["dec_kv"], "anc": anc}

            tokens, scores = beam_search(
                beam_step,
                cache,
                reorder_fn=reorder_fn,
                batch_size=B,
                beam_size=K,
                max_len=max_len,
                eos_id=self.eos_id,
                pad_id=self.pad_id,
                bos_id=self.eos_id,  # fairseq seeds generation with EOS
                blank_id=self.blank_id,
                lenpen=self.lenpen,
                min_len=self.min_len,
                no_repeat_ngram_size=self.no_repeat_ngram_size,
                ctc_scorer=ctc_scorer,
                ctc_weight=self.infer_ctc_weight,
                ctc_prune_k=self.ctc_prune_k,
                prefix_tokens=prefix_tokens if with_prefix else None,
                diverse_groups=G if G and G > 1 else 1,
                diverse_strength=self.diverse_beam_strength,
                diverse_siblings_gamma=max(self.diversity_rate, 0.0),
            )
            return tokens, scores, enc

        return jax.jit(run)

    def generate(
        self, params, batch: Dict[str, Any], extra_params: Optional[list] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, Any]]:
        """Returns (tokens (B, K, L), scores (B, K), encoder_out dict).

        With ``prefix_size`` > 0, the first prefix_size target tokens from
        batch["target"] are forced (reference --prefix-size).  With
        ``extra_models``, pass their params via ``extra_params``.
        """
        features = batch[self.input_keys[0]]
        T = features.shape[1]
        # conservative encoder length (subsampling ratio from model config;
        # staged encoders like PDS expose their exact product as
        # downsample_ratio)
        enc_T = T
        ratio = getattr(self.model.cfg, "downsample_ratio", 0)
        if ratio > 1:
            # staged encoders pad T up to a stage-ratio multiple first
            mult = getattr(self.model.cfg, "pad_multiple", 1)
            enc_T = -(-(-(-T // mult) * mult) // ratio)
        else:
            for _ in range(getattr(self.model.cfg, "subsampling_layers", 2)):
                enc_T = (enc_T - 1) // getattr(self.model.cfg, "subsampling_stride", 2) + 1
        max_len = self._max_len_for(enc_T)
        if len(extra_params or ()) != len(self.extra_models):
            raise ValueError(
                f"ensemble needs params for all {len(self.extra_models)} extra "
                f"models, got {len(extra_params or ())}"
            )
        prefix = None
        if self.prefix_size > 0 and "target" in batch:
            prefix = jnp.asarray(batch["target"])[:, : self.prefix_size]
        cons = None
        if self.constraints_mode and "constraints" in batch:
            cons = jnp.asarray(batch["constraints"])
        key = (features.shape, max_len, prefix is not None,
               None if prefix is None else prefix.shape,
               None if cons is None else cons.shape)
        if key not in self._jitted:
            self._jitted[key] = self._build(
                max_len, with_prefix=prefix is not None,
                with_constraints=cons is not None,
            )
        return self._jitted[key](
            params, features, batch[self.input_keys[1]],
            tuple(extra_params or ()), prefix, cons, self.lm_params,
        )

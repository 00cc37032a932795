"""Non-autoregressive translation task (CMLM / Levenshtein training).

(reference: fairseq/tasks/translation_lev.py:27 — TranslationLevenshteinTask:
loads bitext, injects noise into targets to build the NAT decoder input
(random_mask / full_mask / random_delete / no_noise, :66-150), trains with
nat_loss, decodes with the IterativeRefinementGenerator.)

TPU twist: noise injection is a jittable function applied inside the
compiled train step (per-step rng), not a host-side tensor shuffle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from s2t_tpu.registry import register_task
from s2t_tpu.tasks.translation import TranslationTask


def random_mask(rng, tgt, pad=1, bos=0, eos=2, unk=3):
    """Mask a uniform-random fraction of maskable positions with <unk>
    (reference: translation_lev.py _random_mask — masks the k lowest-scoring
    positions where k ~ U(1, num_maskable))."""
    maskable = (tgt != pad) & (tgt != bos) & (tgt != eos)
    k1, k2 = jax.random.split(rng)
    score = jnp.where(maskable, jax.random.uniform(k1, tgt.shape), 2.0)
    n_maskable = jnp.sum(maskable, axis=1).astype(jnp.float32)
    k = n_maskable * jax.random.uniform(k2, (tgt.shape[0],)) + 1.0
    order = jnp.argsort(score, axis=1)
    rank = jnp.argsort(order, axis=1)
    masked = rank < k[:, None].astype(jnp.int32)
    masked = masked & maskable
    return jnp.where(masked, unk, tgt)


def full_mask(rng, tgt, pad=1, bos=0, eos=2, unk=3):
    maskable = (tgt != pad) & (tgt != bos) & (tgt != eos)
    return jnp.where(maskable, unk, tgt)


NOISERS = {"random_mask": random_mask, "full_mask": full_mask,
           "no_noise": lambda rng, tgt, **kw: tgt}


@register_task("translation_lev")
class TranslationLevTask(TranslationTask):
    def build_model(self):
        from s2t_tpu.models import build_model

        return build_model(
            self.cfg.arch or "cmlm_transformer",
            self.cfg.model,
            vocab_size=len(self.tgt_dict),
            src_vocab_size=len(self.src_dict),
            max_source_positions=self.cfg.dataset.max_source_positions,
            max_target_positions=self.cfg.dataset.max_target_positions,
        )

    def build_criterion(self):
        from s2t_tpu.criterions import build_criterion

        name = self.cfg.criterion or "nat_loss"
        return build_criterion(name, self.cfg.criterion_cfg)

    def forward_fn(self):
        noise_name = (self.cfg.task_cfg or {}).get("noise", "random_mask")
        noiser = NOISERS[noise_name]
        pad, bos, eos, unk = (
            self.tgt_dict.pad(), self.tgt_dict.bos(),
            self.tgt_dict.eos(), self.tgt_dict.unk(),
        )
        tau = (self.cfg.task_cfg or {}).get("insertion_tau", 1.0)
        vocab = len(self.tgt_dict)

        def fwd_insertion(model, params, batch, deterministic, rngs=None):
            # canvas subsampling + tree-weighted slot targets, all inside the
            # compiled step (reference: insertion_transformer.py training)
            from s2t_tpu.models.insertion_transformer import make_slot_targets

            tgt = batch["target"]
            core = jnp.where(tgt == eos, pad, tgt)  # eos is canvas framing
            if params is None:
                keep = jnp.zeros_like(core, bool)
                canvas, soft, valid = make_slot_targets(core, keep, pad, vocab, tau,
                    bos_id=bos, eos_id=eos)
                return model.init(
                    {"params": rngs["params"], "dropout": rngs["params"]},
                    batch["src_tokens"], batch["src_lengths"],
                    canvas, soft, valid, deterministic=True,
                )
            if deterministic or rngs is None:
                krng = jax.random.PRNGKey(0)
            else:
                krng = jax.random.fold_in(rngs["dropout"], 17)
            k1, k2 = jax.random.split(krng)
            rate = jax.random.uniform(k1, (core.shape[0], 1))
            keep = jax.random.uniform(k2, core.shape) < rate
            canvas, soft, valid = make_slot_targets(core, keep, pad, vocab, tau,
                    bos_id=bos, eos_id=eos)
            return model.apply(
                {"params": params}, batch["src_tokens"], batch["src_lengths"],
                canvas, soft, valid, deterministic=deterministic, rngs=rngs,
            )

        def fwd(model, params, batch, deterministic, rngs=None):
            from s2t_tpu.models.insertion_transformer import (
                InsertionTransformerModel,
            )

            if isinstance(model, InsertionTransformerModel):
                return fwd_insertion(model, params, batch, deterministic, rngs)
            tgt = batch["target"]
            if params is None:
                prev = jnp.full_like(tgt, unk)
                init_rngs = {"params": rngs["params"], "dropout": rngs["params"]}
                return model.init(
                    init_rngs, batch["src_tokens"], batch["src_lengths"],
                    prev, tgt, deterministic=True,
                )
            if deterministic or rngs is None:
                nrng = jax.random.PRNGKey(0)
                # LevT's internal roll-in still draws from "dropout" at eval
                rngs = {"dropout": jax.random.PRNGKey(0)}
            else:
                nrng = jax.random.fold_in(rngs["dropout"], 13)
            prev = noiser(nrng, tgt, pad=pad, bos=bos, eos=eos, unk=unk)
            return model.apply(
                {"params": params}, batch["src_tokens"], batch["src_lengths"],
                prev, tgt, deterministic=deterministic, rngs=rngs,
            )

        return fwd

    def build_generator(self, model, gen_cfg=None):
        from s2t_tpu.inference.iterative_refinement import (
            IterativeRefinementGenerator,
        )
        from s2t_tpu.models.insertion_transformer import (
            InsertionGenerator,
            InsertionTransformerModel,
        )

        g = gen_cfg or self.cfg.generation
        if isinstance(model, InsertionTransformerModel):
            return InsertionGenerator(
                model, max_iter=max(g.iter_decode_max_iter, 1),
                max_target_positions=min(
                    self.cfg.dataset.max_target_positions, 256
                ),
                bos_id=self.tgt_dict.bos(), pad_id=self.tgt_dict.pad(),
                eos_id=self.tgt_dict.eos(),
                pad_penalty=g.iter_decode_eos_penalty,
            )
        return IterativeRefinementGenerator(
            model,
            max_iter=max(g.iter_decode_max_iter, 1),
            max_target_positions=min(self.cfg.dataset.max_target_positions, 256),
            bos_id=self.tgt_dict.bos(), pad_id=self.tgt_dict.pad(),
            eos_id=self.tgt_dict.eos(), unk_id=self.tgt_dict.unk(),
        )

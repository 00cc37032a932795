"""Typed configuration tree with stacked-YAML merging and CLI overrides.

One config system replacing the reference's three (SURVEY §5.6):
  1. configargparse + stacked ``--train-configN`` YAMLs (options.py:95-145)
  2. hydra/omegaconf structured dataclasses (dataclass/configs.py:82-1030)
  3. per-dataset ``config.yaml`` (S2TDataConfig)

Design: plain Python dataclasses; YAML files are merged left-to-right
(later files win), then ``key.path=value`` CLI overrides are applied, then the
result is materialised into the dataclass tree with type coercion.  Unknown
keys raise, so typos fail fast.
"""

from __future__ import annotations

import dataclasses
import typing
from dataclasses import dataclass, field, fields, is_dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import yaml


# --------------------------------------------------------------------------- #
# dict utilities
# --------------------------------------------------------------------------- #


def deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``override`` into ``base`` (override wins)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_yaml_stack(paths: List[str | Path]) -> Dict[str, Any]:
    """Load and merge a stack of YAML files, later files winning.

    Mirrors the reference's ``--train-config`` .. ``--train-config9`` stacking
    (reference: fairseq/options.py:95-145) but with no fixed limit.
    """
    merged: Dict[str, Any] = {}
    for p in paths:
        with open(p) as f:
            d = yaml.safe_load(f) or {}
        if not isinstance(d, dict):
            raise ValueError(f"config file {p} must contain a mapping")
        merged = deep_merge(merged, d)
    return merged


def _coerce_scalar(text: str) -> Any:
    """Parse a CLI override value with YAML semantics ('true' -> True, etc.).

    Numeric parsing runs first: YAML 1.1 floats require a dot before the
    exponent, so ``lr=5e-3`` would otherwise silently become the STRING
    '5e-3' and blow up (or mistrain) far from the CLI."""
    t = text.strip()
    try:
        return int(t)
    except ValueError:
        pass
    try:
        return float(t)
    except ValueError:
        pass
    return yaml.safe_load(text)


def apply_overrides(cfg_dict: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Apply ``a.b.c=value`` style overrides onto a nested dict."""
    out = dict(cfg_dict)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key.path=value")
        key, _, val = ov.partition("=")
        parts = key.strip().split(".")
        node = out
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
            else:
                nxt = dict(nxt)
            node[p] = nxt
            node = nxt
        node[parts[-1]] = _coerce_scalar(val)
    return out


# --------------------------------------------------------------------------- #
# dataclass materialisation
# --------------------------------------------------------------------------- #


def _unwrap_optional(tp):
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return tp


def from_dict(cls, d: Dict[str, Any]):
    """Build dataclass ``cls`` from a (possibly nested) plain dict.

    Unknown keys raise; values are coerced to the annotated type where simple
    (int/float/str/bool/tuple/list), nested dataclasses recurse.
    """
    if d is None:
        d = {}
    if not is_dataclass(cls):
        return d
    hints = typing.get_type_hints(cls)
    known = {f.name for f in fields(cls)}
    unknown = set(d) - known
    if unknown:
        raise ValueError(
            f"unknown config key(s) for {cls.__name__}: {sorted(unknown)}"
        )
    kwargs = {}
    for f in fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        tp = _unwrap_optional(hints.get(f.name, Any))
        if is_dataclass(tp) and isinstance(v, dict):
            v = from_dict(tp, v)
        elif v is not None:
            origin = typing.get_origin(tp)
            if origin in (tuple, Tuple):
                v = tuple(v)
            elif origin in (list, List) and not isinstance(v, list):
                v = list(v)
            elif tp is float and isinstance(v, int):
                v = float(v)
            elif tp is int and isinstance(v, float) and v == int(v):
                v = int(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def to_dict(cfg) -> Dict[str, Any]:
    """Dataclass tree -> plain nested dict (for checkpointing / YAML dump)."""
    if is_dataclass(cfg) and not isinstance(cfg, type):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    if isinstance(cfg, dict):
        return {k: to_dict(v) for k, v in cfg.items()}
    return cfg


def replace(cfg, **updates):
    return dataclasses.replace(cfg, **updates)


# --------------------------------------------------------------------------- #
# config groups (reference: fairseq/dataclass/configs.py:82-1030)
# --------------------------------------------------------------------------- #


@dataclass
class CommonConfig:
    seed: int = 1
    log_interval: int = 100
    log_format: str = "simple"  # simple | json | none
    tensorboard_logdir: Optional[str] = None
    wandb_project: Optional[str] = None
    # log metrics to the ambient AzureML run when azureml-core is installed
    # (reference: --azureml-logging, logging/progress_bar.py:440)
    azureml_logging: bool = False
    dtype: str = "bfloat16"  # compute dtype: float32 | bfloat16
    param_dtype: str = "float32"  # parameter dtype
    profile: bool = False
    # jax.profiler trace window: [profile_start, profile_start+profile_steps)
    # updates written to <tensorboard_logdir or save_dir>/profile
    profile_start: int = 10
    profile_steps: int = 5
    user_dir: Optional[str] = None


@dataclass
class DistributedConfig:
    """Mesh-based parallelism (replaces the reference's five DDP wrappers,
    reference: models/distributed_fairseq_model.py:33-123, model_parallel/)."""

    data_parallel: int = -1  # -1: all remaining devices
    model_parallel: int = 1  # tensor parallel (Megatron equivalent)
    seq_parallel: int = 1  # sequence/context parallel (new capability)
    pipeline_parallel: int = 1
    fsdp: bool = False  # shard params over the data axis (ZeRO-3 equivalent)
    coordinator_address: Optional[str] = None
    num_processes: int = 1
    process_id: int = 0


@dataclass
class BMUFConfig:
    """Block-momentum model averaging (BMUF) / SlowMo periodic sync.

    (reference: fairseq/optim/bmuf.py:24-200 — --block-lr, --block-momentum,
    --global-sync-iter, --warmup-iterations, --use-nbm, --average-sync; and
    the fairscale SlowMo backend, models/distributed_fairseq_model.py:77-107.)

    ``active: true`` switches the Trainer to per-replica local optimization:
    each shard of the "data" mesh axis trains its own copy of the model
    (vmapped per-replica steps, no per-step gradient averaging) and every
    ``sync_interval`` updates the global model absorbs the averaged block
    delta with block momentum.  On multi-slice topologies the sync collective
    is the only cross-replica traffic, which is the point of BMUF — it rides
    DCN instead of per-step ICI all-reduces.
    """

    active: bool = False
    block_momentum: float = 0.875
    block_lr: float = 1.0
    sync_interval: int = 50
    # during warmup the replicas are plain-averaged every step (reference:
    # bmuf.py _warmup_sync), giving DP-equivalent early training
    warmup_iterations: int = 0
    use_nbm: bool = True  # Nesterov block momentum lookahead restart
    average_sync: bool = False  # also average optimizer state at syncs
    variant: str = "bmuf"  # "bmuf" | "slowmo" (slow-momentum outer update)
    slowmo_lr: float = 1.0


@dataclass
class DatasetConfig:
    data: str = ""
    train_subset: str = "train"
    valid_subset: str = "dev"
    gen_subset: str = "test"
    max_tokens: Optional[int] = 40000
    batch_size: Optional[int] = None
    max_source_positions: int = 6000
    max_target_positions: int = 1024
    skip_invalid_size_inputs: bool = True
    required_batch_size_multiple: int = 8
    num_buckets: int = 12  # static-shape bucket lattice (bounds XLA recompiles)
    num_workers: int = 4
    data_buffer_size: int = 8
    shuffle: bool = True


@dataclass
class OptimizationConfig:
    max_epoch: int = 0
    max_update: int = 0
    lr: float = 2e-3
    stop_min_lr: float = -1.0
    clip_norm: float = 0.0
    update_freq: int = 1  # gradient accumulation
    sentence_avg: bool = False
    optimizer: str = "adam"
    adam_betas: Tuple[float, float] = (0.9, 0.98)
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    lr_scheduler: str = "inverse_sqrt"
    warmup_updates: int = 10000
    warmup_init_lr: float = -1.0
    min_lr: float = 0.0
    patience: int = -1
    # per-param-group LR multipliers by top-level path prefix (0.0 = freeze);
    # the practical core of the reference's composite optimizer
    lr_groups: Dict[str, float] = field(default_factory=dict)
    # reduce_on_plateau controls (reference: reduce_lr_on_plateau.py)
    lr_shrink: float = 0.1
    lr_patience: int = 0
    # manual scheduler: update-boundary -> lr (reference: manual_lr_scheduler)
    lr_milestones: Dict[int, float] = field(default_factory=dict)
    # PRNG implementation for the training rng stream.  "rbg" uses the TPU
    # hardware RNG path — measured 13.3 -> 6.0 ms/step fwd+bwd for
    # s2t_transformer_s B=32 on v5e vs the default threefry, identical
    # statistics (different stream).  "threefry" restores JAX's default.
    rng_impl: str = "rbg"
    # quantization-noise training for iPQ ("Training with Quantization Noise
    # for Extreme Model Compression"; reference: fairseq/modules/
    # quant_noise.py + --quant-noise-pq): randomly drop block_size-wide
    # input-feature blocks of every weight kernel during training
    quant_noise_p: float = 0.0
    quant_noise_block_size: int = 8
    # loss scaling is unnecessary in bf16 (TPU native); kept for fp16 parity
    fp16_init_scale: float = 2.0**15


@dataclass
class CheckpointConfig:
    save_dir: str = "checkpoints"
    save_interval: int = 1  # epochs
    save_interval_updates: int = 0
    keep_last_epochs: int = -1
    keep_interval_updates: int = -1
    keep_best_checkpoints: int = -1
    best_checkpoint_metric: str = "loss"
    maximize_best_checkpoint_metric: bool = False
    no_save: bool = False
    no_save_optimizer_state: bool = False
    reset_optimizer: bool = False
    reset_dataloader: bool = False
    reset_meters: bool = False
    restore_file: str = "checkpoint_last"
    finetune_from_model: Optional[str] = None
    load_pretrained_encoder_from: Optional[str] = None
    load_pretrained_decoder_from: Optional[str] = None
    async_save: bool = True


@dataclass
class GenerationConfig:
    beam: int = 5
    max_len_a: float = 0.0
    max_len_b: int = 200
    min_len: int = 1
    lenpen: float = 1.0
    unkpen: float = 0.0
    temperature: float = 1.0
    no_repeat_ngram_size: int = 0
    sampling: bool = False
    sampling_topk: int = -1
    sampling_topp: float = -1.0
    diverse_beam_groups: int = -1
    diverse_beam_strength: float = 0.5
    diversity_rate: float = -1.0
    prefix_size: int = 0
    # lexically constrained decoding (reference: search.py:211,
    # --constraints ordered|unordered)
    constraints: Optional[str] = None
    # NAT iterative refinement (reference: GenerationConfig iter_decode_*)
    iter_decode_max_iter: int = 10
    iter_decode_eos_penalty: float = 0.0
    # CTC-drafted Jacobi decoding (inference/jacobi.py — no reference
    # equivalent): exact greedy output from parallel teacher-forced passes
    # seeded by the CTC draft; implies beam-1 semantics
    jacobi: bool = False
    # int8 KV cache for incremental decode: halves the per-step beam-reorder
    # gather traffic (the decode loop's dominant cost, docs/serving.md);
    # per-(position, head) absmax scales (modules/attention.py)
    kv_cache_dtype: str = "model"  # "model" | "int8"
    # S2T-fork CTC inference extras (reference: dataclass/configs.py:811-885)
    infer_ctc_weight: float = 0.0
    ctc_infer: bool = False
    ctc_self_ensemble: bool = False
    ctc_inter_logit: int = 0
    lm_path: Optional[str] = None
    lm_weight: float = 0.0
    scoring: str = "sacrebleu"
    post_process: Optional[str] = "sentencepiece"
    results_path: Optional[str] = None
    quiet: bool = False


@dataclass
class EvalConfig:
    """Validation-time metric generation (reference: tasks/speech_to_text.py:418-499)."""

    eval_bleu: bool = False
    eval_wer: bool = False
    eval_gen_beam: int = 1
    eval_gen_max_len_a: float = 0.0
    eval_gen_max_len_b: int = 200
    eval_tokenized_bleu: bool = False
    # CTC greedy WER/CER on every validation pass — how the reference
    # catches CTC regressions (criterions/ctc.py:1104+ logs wer/cer)
    eval_ctc_wer: bool = False
    # eval_lm: carry this many tokens of the previous block as unscored
    # context (reference: fairseq_cli/eval_lm.py --context-window +
    # data/lm_context_window_dataset.py)
    context_window: int = 0


@dataclass
class TrainConfig:
    """Root config (reference: FairseqConfig, dataclass/configs.py:1011-1030)."""

    task: str = "speech_to_text"
    arch: str = ""
    criterion: str = "label_smoothed_cross_entropy_with_ctc"
    common: CommonConfig = field(default_factory=CommonConfig)
    distributed: DistributedConfig = field(default_factory=DistributedConfig)
    bmuf: BMUFConfig = field(default_factory=BMUFConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    # free-form sections consumed by the task / model / criterion builders
    task_cfg: Dict[str, Any] = field(default_factory=dict)
    model: Dict[str, Any] = field(default_factory=dict)
    criterion_cfg: Dict[str, Any] = field(default_factory=dict)


def build_config(
    yaml_paths: List[str | Path] | None = None,
    overrides: List[str] | None = None,
    cls=TrainConfig,
):
    d = load_yaml_stack(yaml_paths or [])
    d = apply_overrides(d, overrides or [])
    return from_dict(cls, d)

"""Device mesh and sharding layer — the single parallelism abstraction.

Replaces the reference's five DDP wrappers + Megatron process groups
(reference: fairseq/models/distributed_fairseq_model.py:33-123,
fairseq/distributed/utils.py:241-485, fairseq/model_parallel/) with one
``jax.sharding.Mesh`` over axes ("data", "model", "seq"):

  * data  — batch sharding (DP); with ``fsdp=True`` parameters are also
            sharded over this axis (ZeRO-3 equivalent)
  * model — tensor parallelism (Megatron equivalent): attention heads / FFN
            columns sharded via param rules
  * seq   — sequence/context parallelism for long audio (new capability;
            the reference has none, SURVEY §5.7)
  * pipe  — pipeline stages (GPipe equivalent, reference:
            model_parallel/models/pipeline_parallel_transformer/): encoder
            layer blocks stacked on a leading stage axis, microbatches
            rotated through the stages (models/s2t_transformer.py
            _pipe_forward)

Collectives are inserted by XLA from sharding annotations (psum/all-gather
over ICI), never called explicitly in model code.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from s2t_tpu.config import DistributedConfig

AXES = ("data", "model", "seq", "pipe")


def make_mesh(cfg: Optional[DistributedConfig] = None, devices=None) -> Mesh:
    cfg = cfg or DistributedConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(cfg.model_parallel, 1)
    seq = max(cfg.seq_parallel, 1)
    pipe = max(cfg.pipeline_parallel, 1)
    data = cfg.data_parallel if cfg.data_parallel > 0 else n // (model * seq * pipe)
    if data * model * seq * pipe != n:
        raise ValueError(
            f"mesh {data}x{model}x{seq}x{pipe} != {n} devices; set "
            "data_parallel=-1 to auto-fill the data axis"
        )
    dev_array = np.asarray(devices).reshape(data, model, seq, pipe)
    return Mesh(dev_array, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors sharded over the data axis (leading dim)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, fsdp: bool = False) -> Any:
    """Default parameter sharding: replicated, or FSDP (largest dim over data).

    Tensor-parallel rules live with the models (parallel/tp_rules.py) and
    override this default per-path.
    """
    if not fsdp:
        return replicated(mesh)

    def spec_for(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return replicated(mesh)
        # shard the largest dim over "data" if divisible
        dims = [None] * x.ndim
        order = sorted(range(x.ndim), key=lambda i: -x.shape[i])
        for i in order:
            if x.shape[i] % mesh.shape["data"] == 0 and x.shape[i] >= mesh.shape["data"]:
                dims[i] = "data"
                break
        return NamedSharding(mesh, P(*dims))

    return spec_for


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh, sharded over "data"."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

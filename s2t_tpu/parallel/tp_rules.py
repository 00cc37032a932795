"""Tensor-parallel / FSDP parameter sharding rules.

The Megatron-equivalent (reference: fairseq/model_parallel/ — 2,541 LoC of
column/row-parallel module forks) expressed the TPU way: a *path-based rule
table* assigns every parameter a PartitionSpec; XLA GSPMD propagates the
shardings through the computation and inserts the all-reduces that Megatron
calls by hand.  Model code is untouched.

Column-parallel (output dim on "model"): q/k/v projections, FFN fc1, conv
pointwise-in.  Row-parallel (input dim on "model"): attention out_proj, FFN
fc2, pointwise-out.  Embeddings shard the feature dim.  FSDP shards the
largest remaining dim over "data" (ZeRO-3; reference:
fairseq/distributed/fully_sharded_data_parallel.py).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "fc1", "pointwise_conv1", "pos_proj")
ROW_PARALLEL = ("out_proj", "fc2", "pointwise_conv2")


def _spec_for(path: Tuple[str, ...], shape, mesh: Mesh, tp: bool, fsdp: bool):
    dims = [None] * len(shape)
    tp_size = mesh.shape.get("model", 1)
    dp_size = mesh.shape.get("data", 1)
    parent = path[-2] if len(path) >= 2 else ""
    leafname = path[-1]

    # pipeline stages: nn.vmap stacks stage params on a leading (S, ...)
    # axis — shard it over "pipe" so each stage's weights live on its own
    # devices (models/s2t_transformer.py PipeStageBlock)
    pp = "pipe_stages" in path and mesh.shape.get("pipe", 1) > 1 and len(shape) >= 1
    off = 0
    if pp:
        dims[0] = "pipe"
        off = 1  # TP rules apply to the per-stage trailing dims

    if tp and tp_size > 1 and len(shape) >= 1 + off:
        if leafname == "kernel" and len(shape) == 2 + off:
            if parent in COLUMN_PARALLEL and shape[1 + off] % tp_size == 0:
                dims[1 + off] = "model"
            elif parent in ROW_PARALLEL and shape[off] % tp_size == 0:
                dims[off] = "model"
        elif leafname == "bias" and parent in COLUMN_PARALLEL and len(shape) == 1 + off and shape[off] % tp_size == 0:
            dims[off] = "model"
        elif leafname == "embedding" and len(shape) == 2 + off and shape[1 + off] % tp_size == 0:
            dims[1 + off] = "model"

    if fsdp and dp_size > 1:
        # shard the largest still-unsharded dim over "data"
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if dims[i] is None and shape[i] % dp_size == 0 and shape[i] >= dp_size:
                dims[i] = "data"
                break

    return P(*dims)


def param_sharding_tree(param_shapes: Any, mesh: Mesh, tp: bool = False, fsdp: bool = False):
    """Map a param pytree (of ShapeDtypeStructs or arrays) to NamedShardings."""
    flat = traverse_util.flatten_dict(param_shapes)
    out = {}
    for path, leaf in flat.items():
        shape = tuple(getattr(leaf, "shape", ()))
        out[path] = NamedSharding(mesh, _spec_for(path, shape, mesh, tp, fsdp))
    return traverse_util.unflatten_dict(out)

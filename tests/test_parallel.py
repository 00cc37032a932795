"""Tensor-parallel / FSDP sharding tests on the 8-device CPU mesh.

The TPU-native answer to the reference's Megatron model-parallel stack
(reference: fairseq/model_parallel/): sharding rules + GSPMD instead of
forked column/row-parallel modules.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util
from jax.sharding import PartitionSpec as P

from s2t_tpu.config import DistributedConfig, OptimizationConfig
from s2t_tpu.criterions.build import build_criterion
from s2t_tpu.parallel.mesh import make_mesh
from s2t_tpu.parallel.tp_rules import param_sharding_tree
from s2t_tpu.trainer import Trainer
from tests.test_trainer import make_batch, tiny_model


def find_spec(specs, *needles):
    flat = traverse_util.flatten_dict(specs)
    for path, sharding in flat.items():
        joined = "/".join(path)
        if all(n in joined for n in needles):
            return sharding.spec
    raise KeyError(needles)


class TestTPRules:
    def test_column_row_specs(self):
        mesh = make_mesh(DistributedConfig(model_parallel=2))
        model = tiny_model()
        batch = make_batch(np.random.default_rng(0))
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), batch["features"], batch["feat_lengths"],
                batch["prev_tokens"],
            )["params"]
        )
        specs = param_sharding_tree(shapes, mesh, tp=True)
        assert find_spec(specs, "q_proj", "kernel") == P(None, "model")
        assert find_spec(specs, "out_proj", "kernel") == P("model", None)
        assert find_spec(specs, "fc1", "kernel") == P(None, "model")
        assert find_spec(specs, "fc2", "kernel") == P("model", None)

    def test_fsdp_shards_params(self):
        mesh = make_mesh(DistributedConfig())
        model = tiny_model()
        batch = make_batch(np.random.default_rng(0))
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), batch["features"], batch["feat_lengths"],
                batch["prev_tokens"],
            )["params"]
        )
        specs = param_sharding_tree(shapes, mesh, fsdp=True)
        # at least the big kernels are sharded over data
        spec = find_spec(specs, "ffn", "fc1", "kernel")
        assert "data" in (spec[0], spec[1])


class TestTPTraining:
    def test_tp2_train_step(self):
        mesh = make_mesh(DistributedConfig(model_parallel=2))
        assert mesh.shape["model"] == 2 and mesh.shape["data"] == 4
        model = tiny_model()
        criterion = build_criterion("label_smoothed_cross_entropy")
        trainer = Trainer(
            model, criterion, OptimizationConfig(lr=1e-3, warmup_updates=5),
            mesh=mesh, dist_cfg=DistributedConfig(model_parallel=2),
        )
        batch = make_batch(np.random.default_rng(1))
        state = trainer.init_state(batch)
        # verify params are actually laid out TP-sharded on the mesh
        flat = traverse_util.flatten_dict(state.params)
        q_kernels = [v for k, v in flat.items() if "q_proj" in "/".join(k) and k[-1] == "kernel"]
        assert any(
            v.sharding.spec == P(None, "model") for v in q_kernels
        ), [v.sharding for v in q_kernels[:2]]
        first = None
        for _ in range(6):
            state, metrics = trainer.train_step(state, batch)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first

    def test_fsdp_train_step(self):
        mesh = make_mesh(DistributedConfig())
        model = tiny_model()
        criterion = build_criterion("label_smoothed_cross_entropy")
        trainer = Trainer(
            model, criterion, OptimizationConfig(lr=1e-3, warmup_updates=5),
            mesh=mesh, dist_cfg=DistributedConfig(fsdp=True),
        )
        batch = make_batch(np.random.default_rng(2))
        state = trainer.init_state(batch)
        state, metrics = trainer.train_step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # optimizer state mirrors param shardings (memory actually saved)
        flat = traverse_util.flatten_dict(state.params)
        sharded = [
            v for k, v in flat.items()
            if any(ax is not None for ax in (v.sharding.spec or ()))
        ]
        assert len(sharded) > 0

"""BMUF periodic averaging + pipeline parallelism tests.

(reference behaviours: fairseq/optim/bmuf.py:200, model_parallel pipeline
transformer; the TPU designs live in optim/bmuf.py and parallel/pipeline.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import DistributedConfig
from s2t_tpu.parallel.mesh import make_mesh


class TestBMUF:
    def test_block_update_moves_toward_average(self):
        from s2t_tpu.optim.bmuf import BMUFConfig, bmuf_init, bmuf_sync

        cfg = BMUFConfig(block_momentum=0.5, block_lr=1.0)
        g = {"w": jnp.zeros(3)}
        g0, m0 = bmuf_init(g)
        avg_local = {"w": jnp.ones(3)}  # replicas drifted to 1.0
        g1, m1 = bmuf_sync(cfg, g0, avg_local, m0)
        # first sync: m = blr*(1-bm)*(avg-global) = 0.5; global = 0.5
        np.testing.assert_allclose(np.asarray(g1["w"]), 0.5)
        # momentum carries: next sync with the same drift accelerates
        g2, m2 = bmuf_sync(cfg, g1, {"w": jnp.full(3, 1.5)}, m1)
        assert float(g2["w"][0]) > float(g1["w"][0]) + 0.5 * (1.5 - 0.5) * 0.5

    def test_nbm_restart_lookahead(self):
        from s2t_tpu.optim.bmuf import (
            BMUFConfig, bmuf_init, bmuf_restart_point, bmuf_sync,
        )

        cfg = BMUFConfig(block_momentum=0.5, use_nbm=True)
        g, m = bmuf_init({"w": jnp.zeros(2)})
        g, m = bmuf_sync(cfg, g, {"w": jnp.ones(2)}, m)
        r = bmuf_restart_point(cfg, g, m)
        np.testing.assert_allclose(
            np.asarray(r["w"]), np.asarray(g["w"]) + 0.5 * np.asarray(m["w"])
        )


class TestPipeline:
    def test_matches_sequential(self):
        from s2t_tpu.parallel.pipeline import pipeline_apply

        mesh = make_mesh(DistributedConfig(model_parallel=4, data_parallel=2))
        S, M, Bmb, D = 4, 8, 2, 16
        rng = np.random.default_rng(0)
        # stage = affine + tanh
        W = jnp.asarray(rng.normal(size=(S, D, D)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32) * 0.1)
        params = {"w": W, "b": b}
        x = jnp.asarray(rng.normal(size=(M, Bmb, D)).astype(np.float32))

        def layer_fn(p, h):
            return jnp.tanh(h @ p["w"] + p["b"])

        out = pipeline_apply(layer_fn, params, x, mesh, axis="model")

        ref = x
        for s in range(S):
            ref = jnp.tanh(ref @ W[s] + b[s])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )

    def test_rejects_ragged_microbatches(self):
        from s2t_tpu.parallel.pipeline import pipeline_apply

        mesh = make_mesh(DistributedConfig(model_parallel=4, data_parallel=2))
        params = {"w": jnp.zeros((4, 4, 4))}
        x = jnp.zeros((6, 2, 4))  # 6 % 4 != 0
        with pytest.raises(AssertionError):
            pipeline_apply(lambda p, h: h, params, x, mesh, axis="model")

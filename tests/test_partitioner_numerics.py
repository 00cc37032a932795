"""Regression test for the Shardy strided-conv gradient miscompilation.

Observed with jax 0.9.0 (default partitioner = Shardy): the kernel gradient
of a strided convolution whose OUTPUT carries a sharding constraint is
multiplied by the size of a mesh axis the constraint does not mention, on
meshes with >= 3 axes.  In this framework that hit the conv subsampler
whenever sequence parallelism constrained encoder activations to
P("data", "seq") on a data x model x seq mesh: conv kernel grads came out
exactly model_parallel x too large (caught by __graft_entry__'s
dryrun_multichip single-device replay check).

s2t_tpu/__init__.py pins jax_use_shardy_partitioner=False as the
workaround.  This test encodes the repro: if it starts FAILING after a jax
upgrade with S2T_USE_SHARDY=1, the upstream bug is fixed and the pin can go.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import s2t_tpu  # noqa: F401  (applies the partitioner pin)


def test_strided_conv_grad_with_constrained_output_multiaxis_mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "model", "seq"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 40, 80)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 80, 16)).astype(np.float32))

    def loss(w, constrained):
        y = jax.lax.conv_general_dilated(
            x, w, (2,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
        )
        if constrained:
            y = jax.lax.with_sharding_constraint(
                y, NamedSharding(mesh, P("data", "seq", None))
            )
        return jnp.sum(y**2)

    g_ref = jax.jit(jax.grad(loss), static_argnums=1)(w, False)
    g_sharded = jax.jit(jax.grad(loss), static_argnums=1)(w, True)
    ratio = float(jnp.linalg.norm(g_sharded) / jnp.linalg.norm(g_ref))
    assert abs(ratio - 1.0) < 1e-5, (
        f"sharded conv kernel grad is {ratio:.3f}x the unsharded one — "
        "partitioner miscompilation (see module docstring)"
    )


def test_guarded_subsampler_grad_parity_on_dp_tp_sp_mesh():
    """The framework's subsampler-to-seq-sharded-stack boundary (with
    conv_grad_guard, as the encoder emits it) must produce identical conv
    kernel grads to the unsharded program.  The UNGUARDED pattern is wrong
    under at least one partitioner — which is why the guard exists."""
    from s2t_tpu.config import DistributedConfig
    from s2t_tpu.modules.subsampling import Conv1dSubsampling
    from s2t_tpu.parallel.context import constrain, conv_grad_guard, set_mesh
    from s2t_tpu.parallel.mesh import make_mesh

    sub = Conv1dSubsampling(2, 32, 16, 5, 2, "none", "glu", True, jnp.float32)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 40, 80)).astype(np.float32))
    lens = jnp.full((2,), 40, jnp.int32)
    params = sub.init(jax.random.PRNGKey(0), feats, lens)["params"]

    def loss(p, use_sp):
        y, _ = sub.apply({"params": p}, feats, lens)
        if use_sp:
            y = conv_grad_guard(y)
            y = constrain(y, "data", "seq", None)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(loss), static_argnums=1)(params, False)
    mesh = make_mesh(
        DistributedConfig(data_parallel=2, model_parallel=2, seq_parallel=2)
    )
    set_mesh(mesh)
    try:
        g_sh = jax.jit(jax.grad(loss), static_argnums=1)(params, True)
    finally:
        set_mesh(None)
    for k in g_ref:
        a = np.linalg.norm(np.asarray(g_sh[k]["kernel"]))
        b = np.linalg.norm(np.asarray(g_ref[k]["kernel"]))
        np.testing.assert_allclose(a, b, rtol=1e-5, err_msg=k)


def test_conformer_layer_grads_under_seq_parallel_tp_mesh():
    """A conformer (macaron + depthwise conv) seq-parallel encoder layer on
    a DPxTPxSP mesh: every param grad must match the unsharded layer (the
    depthwise conv is guarded inside the layer)."""
    from flax import traverse_util

    from s2t_tpu.config import DistributedConfig
    from s2t_tpu.modules.layers import S2TEncoderLayer
    from s2t_tpu.parallel.context import constrain, set_mesh
    from s2t_tpu.parallel.mesh import make_mesh
    from s2t_tpu.parallel.tp_rules import param_sharding_tree

    B, T, D = 2, 16, 16
    mk = lambda sp: S2TEncoderLayer(
        D, 32, 2, 0.0, 0.0, 0.0, "relu", True, "abs", True, True, 7,
        jnp.float32, sp, 1,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    valid = jnp.ones((B, T), bool)
    layer_ref, layer_sp = mk(False), mk(True)
    params = layer_ref.init(jax.random.PRNGKey(0), x, valid, None, None, True)[
        "params"
    ]

    def loss(layer, p, use_sp):
        h = constrain(x, "data", "seq", None) if use_sp else x
        y = layer.apply({"params": p}, h, valid, None, None, True)
        return jnp.sum(y**2)

    g_ref = jax.jit(lambda p: jax.grad(loss, argnums=1)(layer_ref, p, False))(
        params
    )
    mesh = make_mesh(
        DistributedConfig(data_parallel=2, model_parallel=2, seq_parallel=2)
    )
    set_mesh(mesh)
    try:
        specs = param_sharding_tree(params, mesh, tp=True)
        p_sh = jax.device_put(params, specs)
        g_sh = jax.jit(lambda p: jax.grad(loss, argnums=1)(layer_sp, p, True))(
            p_sh
        )
    finally:
        set_mesh(None)
    fr = traverse_util.flatten_dict(g_ref)
    fs = traverse_util.flatten_dict(g_sh)
    for path in fr:
        np.testing.assert_allclose(
            np.asarray(fs[path]), np.asarray(fr[path]), atol=2e-5,
            err_msg="/".join(path),
        )

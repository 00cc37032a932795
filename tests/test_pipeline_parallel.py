"""Pipeline parallelism: model-level wiring tests.

The PP primitive (parallel/pipeline.py) has its own tests; these cover the
*reachable* path the reference selects with --pipeline-balance/-devices
(reference: model_parallel/models/pipeline_parallel_transformer/model.py:80,
fairseq_cli/train.py:121-124): distributed.pipeline_parallel builds an
encoder whose layer stack is S vmap-stacked stage blocks sharded over the
mesh "pipe" axis, with microbatches rotated through the stages.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from s2t_tpu.config import DistributedConfig
from s2t_tpu.models.s2t_transformer import (
    S2TTransformerConfig,
    S2TTransformerEncoder,
)
from s2t_tpu.parallel.mesh import make_mesh

BASE = dict(
    encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=4,
    encoder_attention_heads=2, subsampling_filter=32,
    dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    use_ctc=True, vocab_size=11,
)
S, L = 2, 4


def stack_params(seq_params, pp_params):
    """Map sequential layer params (layer0..layerL-1) onto the PP model's
    stacked stage layout: pipe_stages/layer{j}[s] = layer{s*(L/S)+j}."""
    ps = traverse_util.flatten_dict(seq_params)
    pp = traverse_util.flatten_dict(pp_params)
    out = {}
    for path, leaf in pp.items():
        if path[0] == "pipe_stages":
            j = int(path[1].replace("layer", ""))
            stacked = np.stack(
                [ps[(f"layer{s * (L // S) + j}",) + path[2:]] for s in range(S)]
            )
            assert stacked.shape == leaf.shape
            out[path] = jnp.asarray(stacked)
        else:
            out[path] = ps[path]
    return traverse_util.unflatten_dict(out)


def make_models():
    cfg_seq = S2TTransformerConfig(**BASE)
    cfg_pp = S2TTransformerConfig(
        **BASE, pipeline_parallel=S, pipeline_microbatches=4
    )
    return S2TTransformerEncoder(cfg_seq), S2TTransformerEncoder(cfg_pp)


@pytest.fixture(scope="module")
def setup():
    enc_seq, enc_pp = make_models()
    rng = jax.random.PRNGKey(0)
    B, T, F = 8, 40, 80
    feats = jax.random.normal(rng, (B, T, F), jnp.float32)
    lengths = jnp.array([T, T, T - 5, T, T - 9, T, T, T - 1], jnp.int32)
    vs = enc_seq.init(rng, feats, lengths, deterministic=True)
    vp = enc_pp.init(rng, feats, lengths, deterministic=True)
    vp = {"params": stack_params(vs["params"], vp["params"])}
    return enc_seq, enc_pp, vs, vp, feats, lengths


class TestPipelineForward:
    def test_forward_equals_sequential(self, setup):
        enc_seq, enc_pp, vs, vp, feats, lengths = setup
        out_s = enc_seq.apply(vs, feats, lengths, deterministic=True)
        out_p = enc_pp.apply(vp, feats, lengths, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(out_s["encoder_out"], np.float32),
            np.asarray(out_p["encoder_out"], np.float32),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_s["ctc_logits"], np.float32),
            np.asarray(out_p["ctc_logits"], np.float32),
            atol=1e-5,
        )

    def test_grads_equal_sequential(self, setup):
        enc_seq, enc_pp, vs, vp, feats, lengths = setup

        def loss_seq(p):
            out = enc_seq.apply({"params": p}, feats, lengths, deterministic=True)
            return jnp.sum(out["encoder_out"] ** 2) + jnp.sum(out["ctc_logits"] ** 2)

        def loss_pp(p):
            out = enc_pp.apply({"params": p}, feats, lengths, deterministic=True)
            return jnp.sum(out["encoder_out"] ** 2) + jnp.sum(out["ctc_logits"] ** 2)

        gs = jax.grad(loss_seq)(vs["params"])
        gp = jax.grad(loss_pp)(vp["params"])
        gs_flat = traverse_util.flatten_dict(gs)
        gp_flat = traverse_util.flatten_dict(gp)
        for path, g in gp_flat.items():
            if path[0] == "pipe_stages":
                j = int(path[1].replace("layer", ""))
                for s in range(S):
                    ref = gs_flat[(f"layer{s * (L // S) + j}",) + path[2:]]
                    np.testing.assert_allclose(
                        np.asarray(g[s]), np.asarray(ref), atol=2e-4,
                        err_msg=str(path),
                    )
            else:
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(gs_flat[path]), atol=2e-4,
                    err_msg=str(path),
                )

    def test_sharded_execution_on_pipe_mesh(self, setup):
        """jit the PP forward on a data×pipe mesh with the stage params
        sharded over "pipe" (tp_rules) — the partitioned program must give
        the same result as the unsharded one."""
        from s2t_tpu.parallel.context import set_mesh
        from s2t_tpu.parallel.tp_rules import param_sharding_tree

        enc_seq, enc_pp, vs, vp, feats, lengths = setup
        mesh = make_mesh(
            DistributedConfig(data_parallel=4, pipeline_parallel=S)
        )
        assert dict(mesh.shape) == {"data": 4, "model": 1, "seq": 1, "pipe": S}
        specs = param_sharding_tree(vp["params"], mesh)
        flat = traverse_util.flatten_dict(specs)
        stage_spec = flat[
            ("pipe_stages", "layer0", "self_attn", "q_proj", "kernel")
        ]
        assert stage_spec.spec[0] == "pipe"
        set_mesh(mesh)
        try:
            params = jax.device_put(vp["params"], specs)
            out = jax.jit(
                lambda p, f, l: enc_pp.apply(
                    {"params": p}, f, l, deterministic=True
                )["encoder_out"]
            )(params, feats, lengths)
            ref = enc_seq.apply(vs, feats, lengths, deterministic=True)[
                "encoder_out"
            ]
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                atol=1e-5,
            )
        finally:
            set_mesh(None)


class TestPipelineTrainer:
    def test_train_step_loss_matches_dp(self):
        """First-step loss of a PP trainer (data=4 × pipe=2 mesh) equals the
        pure-DP trainer's on the same transplanted params and batch."""
        from s2t_tpu.criterions import build_criterion
        from s2t_tpu.config import OptimizationConfig
        from s2t_tpu.trainer import Trainer

        enc_seq, enc_pp = make_models()
        from s2t_tpu.models.s2t_transformer import S2TTransformerModel

        cfg_seq = S2TTransformerConfig(**BASE)
        cfg_pp = S2TTransformerConfig(
            **BASE, pipeline_parallel=S, pipeline_microbatches=4
        )
        model_seq = S2TTransformerModel(cfg=cfg_seq)
        model_pp = S2TTransformerModel(cfg=cfg_pp)
        crit = build_criterion(
            "label_smoothed_cross_entropy_with_ctc",
            {"label_smoothing": 0.1, "ctc": {"ctc_weight": 0.3}},
        )
        opt = OptimizationConfig(lr=1e-3, warmup_updates=4)
        rng = np.random.default_rng(0)
        B, T, U = 8, 40, 6
        batch = {
            "features": rng.normal(size=(B, T, 80)).astype(np.float32),
            "feat_lengths": np.full((B,), T, np.int32),
            "prev_tokens": rng.integers(2, 11, size=(B, U)).astype(np.int32),
            "target": rng.integers(2, 11, size=(B, U)).astype(np.int32),
            "target_lengths": np.full((B,), U, np.int32),
            "transcript": rng.integers(2, 11, size=(B, U)).astype(np.int32),
            "transcript_lengths": np.full((B,), U, np.int32),
            "ntokens": np.asarray(B * U, np.float32),
        }

        tr_dp = Trainer(
            model_seq, crit, opt,
            mesh=make_mesh(DistributedConfig(data_parallel=8)), seed=0,
        )
        st_dp = tr_dp.init_state(batch)

        tr_pp = Trainer(
            model_pp, crit, opt,
            mesh=make_mesh(
                DistributedConfig(data_parallel=4, pipeline_parallel=S)
            ),
            seed=0,
            dist_cfg=DistributedConfig(data_parallel=4, pipeline_parallel=S),
        )
        st_pp = tr_pp.init_state(batch)
        stacked = stack_params(
            jax.tree.map(np.asarray, st_dp.params)["encoder"],
            jax.tree.map(np.asarray, st_pp.params)["encoder"],
        )
        params = dict(jax.tree.map(np.asarray, st_dp.params))
        params["encoder"] = stacked
        st_pp = st_pp.replace(
            params=jax.device_put(
                jax.tree.map(jnp.asarray, params), tr_pp.param_specs
            )
        )

        from s2t_tpu.parallel.context import set_mesh

        set_mesh(tr_dp.mesh)
        _, m_dp = tr_dp.train_step(st_dp, batch)
        set_mesh(tr_pp.mesh)
        _, m_pp = tr_pp.train_step(st_pp, batch)
        set_mesh(None)
        np.testing.assert_allclose(
            float(m_dp["loss"]), float(m_pp["loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(m_dp["gnorm"]), float(m_pp["gnorm"]), rtol=1e-3
        )


class TestPipelineValidation:
    def test_incompatible_features_raise(self):
        cfg = S2TTransformerConfig(
            **BASE, pipeline_parallel=2, use_enc_dlcl=True
        )
        enc = S2TTransformerEncoder(cfg)
        with pytest.raises(ValueError, match="pipeline_parallel"):
            enc.init(
                jax.random.PRNGKey(0),
                jnp.zeros((2, 16, 80)), jnp.full((2,), 16, jnp.int32),
                deterministic=True,
            )

    def test_uneven_layer_split_raises(self):
        cfg = S2TTransformerConfig(
            **{**BASE, "encoder_layers": 5}, pipeline_parallel=2
        )
        enc = S2TTransformerEncoder(cfg)
        with pytest.raises(ValueError, match="divide"):
            enc.init(
                jax.random.PRNGKey(0),
                jnp.zeros((2, 16, 80)), jnp.full((2,), 16, jnp.int32),
                deterministic=True,
            )

    def test_cli_config_reaches_model(self):
        """distributed.pipeline_parallel must not be a dead field: the train
        CLI copies it into the model section, and an arch that doesn't
        support it fails loudly."""
        from s2t_tpu.models import build_model

        m = build_model(
            "s2t_transformer_xs",
            {"pipeline_parallel": 2, "encoder_layers": 4},
            vocab_size=11,
        )
        assert m.cfg.pipeline_parallel == 2
        with pytest.raises(ValueError, match="unknown model config key"):
            build_model("berard", {"pipeline_parallel": 2}, vocab_size=11)

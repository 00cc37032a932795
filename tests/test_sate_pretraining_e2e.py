"""SATE pretraining workflow e2e on the mustc/mt conf zoo.

The reference SATE recipe pretrains an MT model with egs/mustc/mt
(run.sh:38, conf/{basis,base}.yaml) and then builds SATE with
--load-pretrained-text-encoder-from pointing at it
(reference: s2t_sate.py:268-296 via
checkpoint_utils.load_pretrained_component_from_model:676-756).  This test
drives that exact chain through the repo's own pieces: train a (scaled-down)
MT model through cli/train USING THE ACTUAL egs/mustc/mt conf stack, then
transplant its trained encoder into a SATE model's textual encoder and
verify the weights arrived and the assembled model runs.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import TrainConfig, from_dict, load_yaml_stack

EGS_MT_CONF = Path(__file__).resolve().parents[1] / "egs" / "mustc" / "mt" / "conf"


def make_mt_corpus(root: Path, n=24):
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    src_lines, tgt_lines = [], []
    for _ in range(n):
        L = int(rng.integers(2, 5))
        toks = [vocab[int(rng.integers(len(vocab)))] for _ in range(L)]
        src_lines.append(" ".join(toks))
        tgt_lines.append(" ".join(t.upper() for t in toks))
    for split in ("train", "dev"):
        (root / f"{split}.en").write_text("\n".join(src_lines))
        (root / f"{split}.de").write_text("\n".join(tgt_lines))
    syms = vocab + [v.upper() for v in vocab]
    (root / "dict.txt").write_text("\n".join(f"{s} 5" for s in syms))
    (root / "config.yaml").write_text(
        "vocab_filename: dict.txt\nsrc_lang: en\ntgt_lang: de\n"
    )
    return root


SMALL = dict(
    encoder_embed_dim=32, encoder_ffn_embed_dim=64, encoder_layers=2,
    encoder_attention_heads=2, decoder_embed_dim=32, decoder_ffn_embed_dim=64,
    decoder_layers=1, decoder_attention_heads=2, dropout=0.0,
    attention_dropout=0.0, activation_dropout=0.0,
)


@pytest.mark.slow
def test_mt_pretrain_then_sate_transplant(tmp_path):
    from s2t_tpu.cli.train import main as train_main
    from s2t_tpu.models.build import build_model
    from s2t_tpu.utils.checkpoint import transplant_component

    data = make_mt_corpus(tmp_path / "data")

    # the REAL conf stack of the MT pretraining recipe, scaled down the way
    # run.sh overrides would (dims/epochs only — schedule, criterion,
    # pre-norm topology, share flags all come from the zoo YAMLs)
    d = load_yaml_stack([
        str(EGS_MT_CONF / "basis.yaml"), str(EGS_MT_CONF / "base.yaml")
    ])
    assert d["arch"] == "transformer"
    assert d["optimization"]["warmup_updates"] == 8000
    d["model"].update(SMALL)
    d["dataset"].update({
        "data": str(data), "max_tokens": 512, "max_source_positions": 32,
        "max_target_positions": 16, "num_buckets": 2,
        "required_batch_size_multiple": 2,
    })
    d["optimization"].update({
        "max_epoch": 20, "max_update": 0, "lr": 5e-3, "warmup_updates": 20,
        "warmup_init_lr": 1e-4, "patience": -1,
    })
    d["checkpoint"] = {"save_dir": str(tmp_path / "ckpt"), "async_save": False}
    d["eval"] = {}  # skip eval-BLEU generation in the tiny loop
    cfg = from_dict(TrainConfig, d)
    out = train_main(cfg)
    assert out["history"][-1]["loss"] < out["history"][0]["loss"]
    mt_params = out["state"].params
    assert "encoder" in mt_params

    # SATE assembled on the MT encoder (reference: s2t_sate.py:268-296)
    vocab_size = len(out["task"].tgt_dict)
    sate = build_model(
        "s2t_sate",
        {
            "adapter_type": "league", "text_encoder_layers": 2,
            "text_ffn_embed_dim": 64, "text_attention_heads": 2,
            "acoustic_subsampling_filter": 32,
            **{f"acoustic_{k}": v for k, v in SMALL.items()},
        },
        vocab_size=vocab_size, max_target_positions=64,
    )
    feats = jnp.zeros((2, 40, 80), jnp.float32)
    lens = jnp.full((2,), 40, jnp.int32)
    prev = jnp.zeros((2, 5), jnp.int32)
    variables = sate.init(jax.random.PRNGKey(0), feats, lens, prev)
    base_params = variables["params"]

    merged = transplant_component(
        base_params, mt_params, "encoder/textual",
        source_component="encoder", strict=False,
    )
    # the trained weights actually arrived (not a no-op deepcopy) ...
    before = jax.tree.leaves(base_params["encoder"]["textual"])
    after = jax.tree.leaves(merged["encoder"]["textual"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
    # ... and match the MT encoder where paths coincide
    np.testing.assert_allclose(
        np.asarray(merged["encoder"]["textual"]["layer0"]["ffn"]["fc1"]["kernel"]),
        np.asarray(mt_params["encoder"]["layer0"]["ffn"]["fc1"]["kernel"]),
    )
    # the rest of the tree is untouched
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(merged["decoder"])[0]),
        np.asarray(jax.tree.leaves(base_params["decoder"])[0]),
    )

    # assembled model runs
    out2 = sate.apply({"params": merged}, feats, lens, prev, deterministic=True)
    assert out2["decoder_logits"].shape == (2, 5, vocab_size)

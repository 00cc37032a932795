"""reduce_on_plateau / per-group LR / multilingual resampling tests.

(reference behaviours: optim/lr_scheduler/reduce_lr_on_plateau.py,
optim/composite.py, data/audio/speech_to_text_dataset.py:576.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.config import OptimizationConfig
from s2t_tpu.optim.builders import (
    ReduceOnPlateau,
    build_lr_schedule,
    build_optimizer,
    set_lr_scale,
)


class TestPlateau:
    def test_controller_shrinks_on_stall(self):
        c = ReduceOnPlateau(shrink=0.5, patience=1)
        assert c.step(1.0) == 1.0      # first value = best
        assert c.step(0.9) == 1.0      # improved
        assert c.step(0.95) == 1.0     # 1 bad <= patience
        assert c.step(0.95) == 0.5     # 2nd bad -> shrink
        assert c.step(0.5) == 0.5      # improvement resets
        assert c.step(0.6) == 0.5
        assert c.step(0.6) == 0.25

    def test_lr_scale_changes_update_magnitude(self):
        cfg = OptimizationConfig(lr=1.0, lr_scheduler="fixed", optimizer="sgd")
        tx = build_optimizer(cfg)
        params = {"w": jnp.ones((4,))}
        grads = {"w": jnp.ones((4,))}
        st = tx.init(params)
        up1, st1 = tx.update(grads, st, params)
        st_scaled = set_lr_scale(st, 0.1)
        up2, _ = tx.update(grads, st_scaled, params)
        np.testing.assert_allclose(
            np.asarray(up2["w"]), np.asarray(up1["w"]) * 0.1, rtol=1e-6
        )

    def test_triangular_schedule_cycles(self):
        cfg = OptimizationConfig(lr=1.0, min_lr=0.1, warmup_updates=10,
                                 lr_scheduler="triangular")
        sched = build_lr_schedule(cfg)
        lo, hi = float(sched(0)), float(sched(10))
        assert lo < hi
        np.testing.assert_allclose(float(sched(0)), float(sched(20)), rtol=1e-5)


class TestLRGroups:
    def test_freeze_and_scale_groups(self):
        cfg = OptimizationConfig(
            lr=1.0, lr_scheduler="fixed", optimizer="sgd",
            lr_groups={"encoder": 0.0, "decoder": 0.5},
        )
        tx = build_optimizer(cfg)
        params = {"encoder": {"w": jnp.ones(3)}, "decoder": {"w": jnp.ones(3)},
                  "other": {"w": jnp.ones(3)}}
        grads = jax.tree.map(jnp.ones_like, params)
        st = tx.init(params)
        up, _ = tx.update(grads, st, params)
        np.testing.assert_allclose(np.asarray(up["encoder"]["w"]), 0.0)
        np.testing.assert_allclose(np.asarray(up["decoder"]["w"]),
                                   np.asarray(up["other"]["w"]) * 0.5)


class TestMultilingualResampling:
    def test_size_ratios_match_reference_formula(self):
        from s2t_tpu.data.multilingual import get_size_ratios

        sizes = [1000, 100]
        r1 = get_size_ratios(sizes, alpha=1.0)
        np.testing.assert_allclose(r1, [1.0, 1.0])
        r = get_size_ratios(sizes, alpha=0.5)
        # low-resource upsampled, high-resource downsampled
        assert r[1] > 1.0 > r[0]
        # formula check: smoothed ∝ p^alpha
        p = np.asarray(sizes) / 1100
        sm = p**0.5 / (p**0.5).sum()
        np.testing.assert_allclose(r, sm / p, rtol=1e-6)

    def test_multilingual_dataset_routing_and_upsampling(self, tmp_path):
        from s2t_tpu.data.multilingual import MultilingualS2TDataset

        class FakeDS:
            def __init__(self, n, tag):
                self.n_frames = np.full(n, 10, np.int64)
                self.tag = tag

            def __len__(self):
                return len(self.n_frames)

            def __getitem__(self, i):
                return {"id": i, "tag": self.tag}

        big, small = FakeDS(100, "big"), FakeDS(10, "small")
        md = MultilingualS2TDataset([big, small], alpha=0.3)
        assert len(md) == 110
        assert md[105]["tag"] == "small"
        assert md[50]["tag"] == "big"
        order = md.ordered_indices(shuffle=True, seed=1, epoch=1)
        n_small = (order >= 100).sum()
        # alpha=0.3 upsamples the small set well beyond its raw share
        assert n_small > 20, n_small

    def test_lang_tag_prepend(self, tmp_path):
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from test_binaries import make_tiny_corpus

        from s2t_tpu.data.dataset import S2TDataConfig, SpeechToTextDataset
        from s2t_tpu.data.dictionary import Dictionary

        root = make_tiny_corpus(tmp_path / "d")
        # add tgt_lang column + lang tags in the dict
        tsv = (root / "train.tsv").read_text().split("\n")
        out = [tsv[0] + "\ttgt_lang"]
        for i, ln in enumerate(tsv[1:]):
            out.append(ln + "\t" + ("de" if i % 2 == 0 else "fr"))
        (root / "train.tsv").write_text("\n".join(out))
        with open(root / "dict.txt", "a") as f:
            f.write("\n<lang:de> 1\n<lang:fr> 1")
        cfg = S2TDataConfig(prepend_tgt_lang_tag=True)
        d = Dictionary.load(root / "dict.txt")
        ds = SpeechToTextDataset(root / "train.tsv", cfg, d, root=str(root))
        item0 = ds[0]
        item1 = ds[1]
        assert item0["target"][0] == d.index("<lang:de>")
        assert item1["target"][0] == d.index("<lang:fr>")


class TestManualAndPassThroughLR:
    def test_manual_milestones(self):
        """manual scheduler (reference: lr_scheduler/manual_lr_scheduler.py):
        piecewise-constant lr by update boundary."""
        import s2t_tpu.optim.builders  # noqa: F401 (registers)
        from s2t_tpu.config import OptimizationConfig
        from s2t_tpu.registry import LR_SCHEDULERS

        cfg = OptimizationConfig(
            lr=1e-3, lr_milestones={0: 1e-3, 100: 5e-4, 200: 1e-4}
        )
        s = LR_SCHEDULERS.get("manual")(cfg)
        assert abs(float(s(0)) - 1e-3) < 1e-9
        assert abs(float(s(99)) - 1e-3) < 1e-9
        assert abs(float(s(100)) - 5e-4) < 1e-9
        assert abs(float(s(500)) - 1e-4) < 1e-9

    def test_pass_through(self):
        import s2t_tpu.optim.builders  # noqa: F401
        from s2t_tpu.config import OptimizationConfig
        from s2t_tpu.registry import LR_SCHEDULERS

        cfg = OptimizationConfig(lr=1e-3)
        p = LR_SCHEDULERS.get("pass_through")(cfg)
        assert abs(float(p(123)) - 1e-3) < 1e-9

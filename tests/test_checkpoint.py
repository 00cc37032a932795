"""Checkpoint save/load/rotate/average/transplant tests
(reference behaviours: checkpoint_utils.py:29-152,676-756;
scripts/average_checkpoints.py)."""

import numpy as np
import pytest

from s2t_tpu.utils.checkpoint import (
    CheckpointManager,
    average_checkpoints,
    load_checkpoint,
    save_pytree,
    transplant_component,
)


def tree(val):
    return {
        "params": {
            "encoder": {"w": np.full((3, 3), val, np.float32)},
            "decoder": {"w": np.full((2,), val * 2, np.float32)},
        },
        "step": val,
    }


class TestManager:
    def test_save_and_last(self, tmp_path):
        mgr = CheckpointManager(tmp_path)
        mgr.save(tree(1), step=10, epoch=1, val_metric=0.5)
        t, meta = load_checkpoint(tmp_path / "checkpoint_last.pt")
        assert meta["step"] == 10
        assert t["params"]["encoder"]["w"][0][0] == 1

    def test_best_tracking_minimize(self, tmp_path):
        mgr = CheckpointManager(tmp_path, best_metric="loss")
        mgr.save(tree(1), 1, 1, val_metric=2.0)
        mgr.save(tree(2), 2, 2, val_metric=1.0)  # better
        mgr.save(tree(3), 3, 3, val_metric=3.0)  # worse
        t, meta = load_checkpoint(tmp_path / "checkpoint_best.pt")
        assert meta["val_metric"] == 1.0

    def test_best_tracking_maximize(self, tmp_path):
        mgr = CheckpointManager(tmp_path, best_metric="bleu", maximize_best=True)
        mgr.save(tree(1), 1, 1, val_metric=10.0)
        mgr.save(tree(2), 2, 2, val_metric=20.0)
        mgr.save(tree(3), 3, 3, val_metric=15.0)
        _, meta = load_checkpoint(tmp_path / "checkpoint_best.pt")
        assert meta["val_metric"] == 20.0

    def test_keep_last_epochs(self, tmp_path):
        mgr = CheckpointManager(tmp_path, keep_last_epochs=2)
        for e in range(1, 6):
            mgr.save(tree(e), e * 10, e)
        remaining = sorted(p.name for p in tmp_path.glob("checkpoint[0-9].pt"))
        assert remaining == ["checkpoint4.pt", "checkpoint5.pt"]

    def test_keep_best_k(self, tmp_path):
        mgr = CheckpointManager(tmp_path, keep_best_checkpoints=2, best_metric="loss")
        for e, m in enumerate([3.0, 1.0, 2.0, 0.5], 1):
            mgr.save(tree(e), e, e, val_metric=m)
        bests = mgr.best_checkpoints(10)
        assert len(bests) == 2
        scores = [p.name for p in bests]
        assert "0.5000" in scores[0] and "1.0000" in scores[1]


class TestAverageAndTransplant:
    def test_average(self, tmp_path):
        paths = []
        for i, v in enumerate([1.0, 3.0]):
            p = tmp_path / f"c{i}.pt"
            save_pytree(p, tree(v))
            paths.append(p)
        avg = average_checkpoints(paths)
        np.testing.assert_allclose(avg["encoder"]["w"], 2.0)
        np.testing.assert_allclose(avg["decoder"]["w"], 4.0)

    def test_transplant(self):
        tgt = tree(0.0)["params"]
        src = tree(7.0)["params"]
        out = transplant_component(tgt, src, "encoder")
        np.testing.assert_allclose(out["encoder"]["w"], 7.0)
        np.testing.assert_allclose(out["decoder"]["w"], 0.0)  # untouched

    def test_transplant_shape_mismatch(self):
        tgt = tree(0.0)["params"]
        src = {"encoder": {"w": np.zeros((4, 4), np.float32)}}
        with pytest.raises(KeyError, match="shape mismatch"):
            transplant_component(tgt, src, "encoder")

    def test_transplant_missing_path(self):
        tgt = tree(0.0)["params"]
        with pytest.raises(KeyError, match="missing"):
            transplant_component(tgt, {"nothing": {}}, "encoder")


class TestExtraMeta:
    def test_extra_meta_roundtrip(self, tmp_path):
        """Mid-epoch resume state (epoch_itr) rides the json sidecar
        (the save site in cli/train.py passes extra_meta)."""
        mgr = CheckpointManager(tmp_path)
        itr_state = {"epoch": 3, "consumed": 17, "seed": 1}
        mgr.save(tree(1), step=10, epoch=3, val_metric=0.5,
                 extra_meta={"epoch_itr": itr_state})
        _, meta = load_checkpoint(tmp_path / "checkpoint_last.pt")
        assert meta["epoch_itr"] == itr_state
        assert meta["step"] == 10  # core fields still present

    def test_epoch_itr_resume_via_manager(self, tmp_path):
        from s2t_tpu.data.iterators import EpochBatchIterator

        batches = [np.asarray([i]) for i in range(10)]
        itr = EpochBatchIterator(
            dataset=list(range(10)), batches_fn=lambda e: batches,
            collate_fn=lambda xs: xs, shuffle_batches=False,
        )
        it = itr.next_epoch_itr()
        for _ in range(4):
            next(it)
        mgr = CheckpointManager(tmp_path)
        mgr.save(tree(1), step=4, epoch=itr.epoch,
                 extra_meta={"epoch_itr": itr.state_dict()})
        _, meta = load_checkpoint(tmp_path / "checkpoint_last.pt")

        fresh = EpochBatchIterator(
            dataset=list(range(10)), batches_fn=lambda e: batches,
            collate_fn=lambda xs: xs, shuffle_batches=False,
        )
        fresh.load_state_dict(meta["epoch_itr"])
        remaining = list(fresh.next_epoch_itr())
        assert len(remaining) == 6
        assert remaining[0][0] == 4  # resumes exactly where it left off

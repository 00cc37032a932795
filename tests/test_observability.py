"""Observability tests: TB event writer format, NaN detector, metrics,
pretrained component loading through the train CLI."""

import struct
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2t_tpu.utils.metrics import MetricsAggregator, aggregate, log_scalar
from s2t_tpu.utils.nan_detector import check_grads_finite, find_nonfinite_intermediates
from s2t_tpu.utils.tensorboard import TensorBoardWriter, _masked_crc, crc32c


class TestTensorBoard:
    def test_crc32c_known_vectors(self):
        # RFC 3720 test vector: 32 bytes of zeros
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"123456789") == 0xE3069283

    def test_event_file_roundtrip(self, tmp_path):
        w = TensorBoardWriter(tmp_path)
        w.add_scalar("loss", 1.5, 10)
        w.add_scalar("lr", 2e-3, 10)
        w.close()
        files = list(Path(tmp_path).glob("events.out.tfevents.*"))
        assert len(files) == 1
        data = files[0].read_bytes()
        # walk the TFRecord framing and verify all CRCs
        off, records = 0, []
        while off < len(data):
            (length,) = struct.unpack("<Q", data[off : off + 8])
            (len_crc,) = struct.unpack("<I", data[off + 8 : off + 12])
            assert len_crc == _masked_crc(data[off : off + 8])
            payload = data[off + 12 : off + 12 + length]
            (crc,) = struct.unpack("<I", data[off + 12 + length : off + 16 + length])
            assert crc == _masked_crc(payload)
            records.append(payload)
            off += 16 + length
        assert len(records) == 3  # header + 2 scalars
        assert b"loss" in records[1]

    def test_progress_logger_writes_tb(self, tmp_path, capsys):
        from s2t_tpu.utils.progress import ProgressLogger

        p = ProgressLogger("json", str(tmp_path))
        p.log({"loss": 1.0}, 1, "train")
        p.log({"loss": 0.9}, 1, "valid")
        p.close()
        out = capsys.readouterr().out
        assert '"loss"' in out
        assert list((tmp_path / "train").glob("events.*"))
        assert list((tmp_path / "valid").glob("events.*"))


class TestNanDetector:
    def test_finds_nan_module(self):
        import flax.linen as nn

        class Bad(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(4, name="ok_layer")(x)
                x = jnp.log(-jnp.abs(x))  # NaN factory
                return nn.Dense(2, name="downstream")(x)

        m = Bad()
        params = m.init(jax.random.PRNGKey(0), jnp.ones((2, 3)))["params"]
        bad = find_nonfinite_intermediates(m, params, jnp.ones((2, 3)))
        assert any("downstream" in b for b in bad)

    def test_grads_check(self):
        ok, bad = check_grads_finite({"a": {"w": jnp.ones(3)}})
        assert ok and not bad
        ok, bad = check_grads_finite({"a": {"w": jnp.asarray([1.0, np.nan])}})
        assert not ok and bad == ["a/w"]


class TestMetrics:
    def test_aggregation_contexts(self):
        with aggregate() as agg:
            log_scalar("loss", 2.0, weight=2.0)
            log_scalar("loss", 4.0, weight=1.0)
        assert agg.avg("loss") == pytest.approx(8.0 / 3.0)

    def test_state_roundtrip(self):
        a = MetricsAggregator()
        a.log_scalar("x", 5.0)
        b = MetricsAggregator()
        b.load_state_dict(a.state_dict())
        assert b.avg("x") == 5.0


class TestPretrainedTransplant:
    def test_cli_loads_pretrained_encoder(self, tmp_path):
        from s2t_tpu.cli.train import main as train_main
        from s2t_tpu.utils.checkpoint import load_checkpoint
        from tests.test_binaries import make_tiny_corpus, tiny_train_cfg

        data = make_tiny_corpus(tmp_path / "data")
        # train once briefly to produce a checkpoint
        cfg1 = tiny_train_cfg(data, tmp_path / "ckpt1", max_epoch=2)
        out1 = train_main(cfg1)

        # new run loading the pretrained encoder (max_epoch=0: init only)
        cfg2 = tiny_train_cfg(data, tmp_path / "ckpt2", max_epoch=0)
        cfg2.optimization.max_epoch = -1
        cfg2.checkpoint.load_pretrained_encoder_from = str(
            tmp_path / "ckpt1" / "checkpoint_last.pt"
        )
        out2 = train_main(cfg2)
        tree, _ = load_checkpoint(tmp_path / "ckpt1" / "checkpoint_last.pt")
        from flax import serialization

        got = serialization.to_state_dict(out2["state"].params)["encoder"]
        want = tree["params"]["encoder"]

        def first_leaf(d):
            while isinstance(d, dict):
                d = d[sorted(d)[0]]
            return d

        np.testing.assert_allclose(
            np.asarray(first_leaf(got)), np.asarray(first_leaf(want)), atol=1e-6
        )

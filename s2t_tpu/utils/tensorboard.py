"""Minimal TensorBoard event-file writer with zero dependencies.

(reference: fairseq/logging/progress_bar.py TensorboardProgressBarWrapper —
which needs the tensorboard package; here the TFRecord framing (masked
crc32c) and the Event/Summary protobuf messages are encoded by hand, so
scalars are viewable in TensorBoard without TensorFlow in the image.)
"""

from __future__ import annotations

import os
import struct
import time
from pathlib import Path

_CRC_TABLE = None


def _crc32c_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table.append(c)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# -- tiny protobuf encoder ---------------------------------------------------


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_string(field: int, s: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(s)) + s


def _pb_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _pb_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _pb_int64(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _event(step: int, tag: str, value: float, wall_time: float) -> bytes:
    # Summary.Value { tag=1, simple_value=2 }
    sv = _pb_string(1, tag.encode()) + _pb_float(2, float(value))
    summary = _pb_string(1, sv)  # Summary { value=1 repeated }
    # Event { wall_time=1, step=2, summary=5 }
    return _pb_double(1, wall_time) + _pb_int64(2, step) + _pb_string(5, summary)


class TensorBoardWriter:
    def __init__(self, logdir: str | Path, subdir: str = ""):
        d = Path(logdir) / subdir if subdir else Path(logdir)
        d.mkdir(parents=True, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.s2t_tpu"
        self._f = open(d / fname, "ab")
        self._write_event(_event(0, "", 0.0, time.time()))  # file header event

    def _write_event(self, payload: bytes):
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))
        self._f.flush()

    def add_scalar(self, tag: str, value: float, step: int):
        self._write_event(_event(step, tag, value, time.time()))

    def add_scalars(self, scalars: dict, step: int, prefix: str = ""):
        for k, v in scalars.items():
            try:
                self.add_scalar(f"{prefix}{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        self._f.close()

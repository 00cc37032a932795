"""Hierarchical metric aggregation (reference: fairseq/logging/metrics.py:30-288
and meters.py:35-291 — sum-counter aggregation contexts with derived metrics).
"""

from __future__ import annotations

import math
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Callable, Dict, List, Optional


class Meter:
    def __init__(self):
        self.sum = 0.0
        self.weight = 0.0

    def update(self, value: float, weight: float = 1.0):
        self.sum += float(value) * float(weight)
        self.weight += float(weight)

    @property
    def avg(self) -> float:
        return self.sum / self.weight if self.weight > 0 else 0.0

    def state_dict(self):
        return {"sum": self.sum, "weight": self.weight}

    def load_state_dict(self, d):
        self.sum, self.weight = d["sum"], d["weight"]


class MetricsAggregator:
    def __init__(self):
        self.meters: Dict[str, Meter] = defaultdict(Meter)
        self.derived: Dict[str, Callable] = {}
        self._start = time.time()

    def log_scalar(self, key: str, value: float, weight: float = 1.0):
        self.meters[key].update(value, weight)

    def log_derived(self, key: str, fn: Callable[["MetricsAggregator"], float]):
        self.derived[key] = fn

    def avg(self, key: str) -> float:
        return self.meters[key].avg

    def sum(self, key: str) -> float:
        return self.meters[key].sum

    def get_smoothed_values(self) -> Dict[str, float]:
        out = {k: m.avg for k, m in self.meters.items()}
        for k, fn in self.derived.items():
            try:
                out[k] = fn(self)
            except (ZeroDivisionError, ValueError, OverflowError):
                pass
        return out

    def reset(self):
        self.meters.clear()
        self._start = time.time()

    def elapsed(self) -> float:
        return time.time() - self._start

    def state_dict(self):
        return {k: m.state_dict() for k, m in self.meters.items()}

    def load_state_dict(self, d):
        for k, s in d.items():
            self.meters[k].load_state_dict(s)


# global aggregation stack (reference: metrics.aggregate contexts)
_STACK: List[MetricsAggregator] = [MetricsAggregator()]


def root() -> MetricsAggregator:
    return _STACK[0]


@contextmanager
def aggregate(new_root: bool = False):
    agg = MetricsAggregator()
    _STACK.append(agg)
    try:
        yield agg
    finally:
        _STACK.pop()


def log_scalar(key: str, value: float, weight: float = 1.0):
    for agg in _STACK:
        agg.log_scalar(key, value, weight)


def perplexity(nll_sum: float, ntokens: float) -> float:
    if ntokens == 0:
        return float("inf")
    try:
        return min(math.exp(nll_sum / ntokens / math.log(2) * math.log(2)), 1e6)
    except OverflowError:
        return float("inf")

"""Structured metrics & logging.

Replaces the reference's print/tqdm-postfix loss strings
(gan-model/train_lipreading.py:194-199,255-260) with a metric dict +
pluggable writers. Writers are host-side; the train step returns a flat
``{name: scalar}`` dict which is logged after ``block_until_ready``-free
device-to-host transfer of already-computed scalars.
"""
from __future__ import annotations

import json
import sys
import time
from collections import defaultdict
from typing import Dict, Mapping, Optional, TextIO

import jax
import numpy as np


def to_host(metrics: Mapping) -> Dict[str, float]:
    """Pull a device metric dict to host floats."""
    return {k: float(np.asarray(v)) for k, v in jax.device_get(dict(metrics)).items()}


class MetricWriter:
    def write(self, step: int, metrics: Mapping[str, float]) -> None:  # pragma: no cover
        raise NotImplementedError

    def close(self) -> None:
        pass


class ConsoleWriter(MetricWriter):
    def __init__(self, stream: Optional[TextIO] = None, every: int = 1):
        self.stream = stream or sys.stderr
        self.every = max(1, every)

    def write(self, step: int, metrics: Mapping[str, float]) -> None:
        if step % self.every:
            return
        parts = ", ".join(f"{k}={v:.5g}" for k, v in sorted(metrics.items()))
        print(f"[step {step}] {parts}", file=self.stream, flush=True)


class JsonlWriter(MetricWriter):
    def __init__(self, path: str):
        self.f = open(path, "a")

    def write(self, step: int, metrics: Mapping[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()

    def close(self) -> None:
        self.f.close()


class RunningMean:
    """Streaming mean per metric, like the reference's running_* accumulators
    (train_lipreading.py:100-199) but without the eval-loop accounting bug
    (train_lipreading.py:83 averaged over the wrong denominator)."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    def update(self, metrics: Mapping[str, float]) -> None:
        for k, v in metrics.items():
            self.total[k] += float(v)
            self.count[k] += 1

    def means(self) -> Dict[str, float]:
        return {k: self.total[k] / max(1, self.count[k]) for k in self.total}

    def reset(self) -> None:
        self.total.clear()
        self.count.clear()


class Metrics:
    """Fan-out to several writers."""

    def __init__(self, *writers: MetricWriter):
        self.writers = list(writers)

    def write(self, step: int, metrics: Mapping) -> None:
        host = to_host(metrics)
        for w in self.writers:
            w.write(step, host)

    def close(self) -> None:
        for w in self.writers:
            w.close()

"""Profiling / timing harness.

The reference has no tracing or profiling (SURVEY.md §5) beyond thop FLOP
counters (video-generation/diffusion/unet.py:320-338) and tqdm. Here:
``annotate`` wraps ``jax.profiler.TraceAnnotation`` (visible in TPU
profiles), ``trace`` captures a full profiler session, and ``Timer`` is a
``block_until_ready``-correct wall-clock harness used by bench.py.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


@contextlib.contextmanager
def annotate(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Device-correct timing: syncs on a representative output."""

    def __init__(self):
        self.samples: list = []

    def measure(self, fn: Callable, *args, warmup: int = 2, iters: int = 10, **kw) -> Dict[str, float]:
        for _ in range(warmup):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args, **kw)
            jax.block_until_ready(out)
            self.samples.append(time.perf_counter() - t0)
        s = np.asarray(self.samples[-iters:])
        return {
            "mean_s": float(s.mean()),
            "median_s": float(np.median(s)),
            "min_s": float(s.min()),
            "std_s": float(s.std()),
        }


def flops_estimate_attention(b: int, h: int, s: int, d: int) -> int:
    """2·(QK^T) + 2·(PV) matmul FLOPs — the role of the reference's thop
    counters (unet.py:320-338)."""
    return 4 * b * h * s * s * d

"""Prefetching device feed: overlap host decode with device compute.

SURVEY.md §7 hard part #1: the reference's input path is serial (DataLoader
workers but per-frame predict calls, feature_extraction.py:78-88). Here a
background thread produces numpy batches while the device computes, and
batches are transferred ahead-of-time (double buffering) with sharded
placement on the mesh.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from ..parallel.mesh import MeshSpec, shard_batch


def prefetch_to_device(
    batch_fn: Callable[[], Dict[str, np.ndarray]],
    spec: Optional[MeshSpec] = None,
    depth: int = 2,
    num_batches: Optional[int] = None,
) -> Iterator:
    """Run ``batch_fn`` in a producer thread; yield device-resident batches.

    ``depth`` batches are kept in flight: while the device runs step N, the
    host is already decoding and transferring N+1.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def producer():
        produced = 0
        while not stop.is_set():
            if num_batches is not None and produced >= num_batches:
                break
            try:
                batch = batch_fn()
            except StopIteration:
                break
            q.put(batch)
            produced += 1
        q.put(None)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                break
            if spec is not None:
                yield shard_batch(spec, batch)
            else:
                yield jax.device_put(batch)
    finally:
        stop.set()
        # drain so the producer can exit
        while not q.empty():
            q.get_nowait()


def iterator_feed(it: Iterator[Dict[str, np.ndarray]]) -> Callable[[], Dict[str, np.ndarray]]:
    """Adapt an iterator of batches to the batch_fn protocol."""
    def fn():
        try:
            return next(it)
        except StopIteration:
            raise
    return fn


def host_prefetch(
    batch_fn: Callable[[], Dict[str, np.ndarray]],
    depth: int = 16,
) -> Iterator[Dict[str, np.ndarray]]:
    """Producer-thread iterator of HOST batches (no device transfer) — the
    feed side of the scan-chunked train loops: while the device runs a
    multi-step program, the producer refills the next chunk's batches.
    Ends cleanly when ``batch_fn`` raises StopIteration."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def producer():
        while not stop.is_set():
            try:
                batch = batch_fn()
            except StopIteration:
                break
            q.put(batch)
        q.put(None)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
    finally:
        stop.set()
        while not q.empty():
            q.get_nowait()


def take(it: Iterator, n: int) -> list:
    """Up to ``n`` items from ``it`` (fewer at feed end)."""
    out = []
    for _ in range(n):
        try:
            out.append(next(it))
        except StopIteration:
            break
    return out


def stack_batches(raws) -> Dict[str, np.ndarray]:
    """[{k: (B, ...)}] → {k: (N, B, ...)} step-stacked host tree for the
    scan-dispatch train loops."""
    return {k: np.stack([r[k] for r in raws]) for k in raws[0]}

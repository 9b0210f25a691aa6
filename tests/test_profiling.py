"""Profiling harness tests."""
import jax.numpy as jnp

from lipreading_video_generation_tpu.utils import profiling


def test_timer_measures_function():
    t = profiling.Timer()
    stats = t.measure(lambda x: x * 2.0, jnp.ones((64, 64)), warmup=1, iters=3)
    assert stats["mean_s"] > 0
    assert stats["min_s"] <= stats["median_s"]
    assert len(t.samples) == 3


def test_annotate_context():
    with profiling.annotate("test-span"):
        out = jnp.sum(jnp.ones(4))
    assert float(out) == 4.0


def test_flops_estimate():
    assert profiling.flops_estimate_attention(1, 1, 128, 64) == 4 * 128 * 128 * 64

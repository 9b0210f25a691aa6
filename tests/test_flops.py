"""MFU accounting (utils/flops.py): XLA cost-model FLOPs vs hand counts."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.utils import flops as F


def test_compiled_flops_matches_matmul_count():
    @jax.jit
    def f(a, b):
        return a @ b

    a = jnp.zeros((256, 128))
    b = jnp.zeros((128, 64))
    got = F.compiled_flops(f, a, b)
    assert got == pytest.approx(F.matmul_flops(256, 64, 128), rel=0.01)


def test_compiled_flops_counts_conv():
    @jax.jit
    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.zeros((2, 16, 16, 8))
    k = jnp.zeros((3, 3, 8, 32))
    got = F.compiled_flops(f, x, k)
    want = F.conv2d_flops(2, 16, 16, 8, 32, 3, 3)
    # XLA counts SAME-padded convs over the padded window; allow slack
    assert want * 0.8 <= got <= want * 1.3


def test_mfu_report_shape(monkeypatch):
    monkeypatch.setenv("LVG_PEAK_TFLOPS", "100")
    r = F.mfu_report(1e12, 0.1)   # 10 TF/s achieved on a 100 TF/s chip
    assert r["model_tflops"] == 1.0
    assert r["achieved_tflops_per_sec"] == pytest.approx(10.0)
    assert r["mfu"] == pytest.approx(0.1)


def test_mfu_report_handles_unknown():
    r = F.mfu_report(None, 0.1)
    assert r == {"model_tflops": None, "achieved_tflops_per_sec": None, "mfu": None}

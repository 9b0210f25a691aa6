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


def test_pallas_flash_attention_counted():
    """The HLO cost model scores pallas_call at 0 FLOPs; the jaxpr walk must
    supply the attention matmuls — model flops at logical dims, hardware
    flops at lane-padded dims with bwd recompute. Since round 4, d=64
    stays 64 on the lanes (ops/attention._head_dim_pad) so hw only exceeds
    model by the backward's recompute matmuls; a d=48 case checks the
    padded-lane accounting still kicks in (48 → 64)."""
    from lipreading_video_generation_tpu.ops.attention import (
        _head_dim_pad,
        flash_attention,
    )

    b, h, s, d = 2, 4, 256, 64
    assert _head_dim_pad(64) == 64 and _head_dim_pad(48) == 64
    assert _head_dim_pad(96) == 128 and _head_dim_pad(129) == 256

    @jax.jit
    def f(q):
        return jax.grad(lambda x: flash_attention(x, x, x).sum())(q).sum()

    q = jnp.zeros((b, h, s, d))
    model, hw = F.pallas_flops(f, q)
    bh = b * h
    # model: fwd 2 matmuls + bwd 4 matmuls, logical d
    assert model == pytest.approx(2.0 * 6 * bh * s * s * d)
    # hw: fwd 2 + dkv 4 + dq 3 matmuls at the padded (= logical, for 64) d
    assert hw == pytest.approx(2.0 * 9 * bh * s * s * _head_dim_pad(d))

    # d=48 pads to 64 on the lanes: hw counts the padded width
    q48 = jnp.zeros((b, h, s, 48))
    model48, hw48 = F.pallas_flops(f, q48)
    assert model48 == pytest.approx(2.0 * 6 * bh * s * s * 48)
    assert hw48 == pytest.approx(2.0 * 9 * bh * s * s * 64)
    detail = F.flops_detail(f, q)
    assert detail["model"] >= model
    assert detail["hw"] - detail["model"] == pytest.approx(hw - model)


def test_pallas_flops_scan_multiplies_by_length():
    from lipreading_video_generation_tpu.ops.attention import flash_attention

    q = jnp.zeros((1, 1, 256, 64))  # S > 128 so the Pallas path dispatches

    @jax.jit
    def f(q):
        def body(c, _):
            return flash_attention(c, c, c), None
        out, _ = jax.lax.scan(body, q, None, length=5)
        return out

    model, hw = F.pallas_flops(f, q)
    assert model == pytest.approx(5 * 2.0 * 2 * 256 * 256 * 64)


def test_scan_body_trip_count_restored():
    """XLA's cost model scores a scan body once regardless of length;
    flops_detail must restore the (length−1) missing repetitions (nested
    scans multiply)."""
    a = jnp.zeros((256, 256))

    @jax.jit
    def nested(a):
        def inner(c, _):
            return c @ a, None

        def outer(c, _):
            c2, _ = jax.lax.scan(inner, c, None, length=4)
            return c2, None

        out, _ = jax.lax.scan(outer, a, None, length=3)
        return out

    got = F.compiled_flops(nested, a)
    assert got == pytest.approx(12 * F.matmul_flops(256, 256, 256), rel=0.01)


def test_mfu_report_shape(monkeypatch):
    monkeypatch.setenv("LVG_PEAK_TFLOPS", "100")
    r = F.mfu_report(1e12, 0.1)   # 10 TF/s achieved on a 100 TF/s chip
    assert r["model_tflops"] == 1.0
    assert r["achieved_tflops_per_sec"] == pytest.approx(10.0)
    assert r["mfu"] == pytest.approx(0.1)


def test_mfu_report_handles_unknown():
    r = F.mfu_report(None, 0.1)
    assert r == {"model_tflops": None, "achieved_tflops_per_sec": None, "mfu": None}


def test_mfu_report_detail_dict_adds_hfu(monkeypatch):
    monkeypatch.setenv("LVG_PEAK_TFLOPS", "100")
    r = F.mfu_report({"model": 1e12, "hw": 2e12}, 0.1)
    assert r["mfu"] == pytest.approx(0.1)
    assert r["hw_tflops"] == 2.0
    assert r["hfu"] == pytest.approx(0.2)


def test_pallas_declared_cost_estimate_counted():
    """A pallas_call that declares its own pl.CostEstimate (the CLAHE
    kernel) is counted at the declared FLOPs — not the attention-shaped
    heuristic, which misreads its operand layout by orders of magnitude."""
    from lipreading_video_generation_tpu.ops.clahe_pallas import clahe_pallas

    img = jnp.zeros((2, 48, 48), jnp.uint8)
    fn = jax.jit(lambda x: clahe_pallas(x, interpret=True))
    got = F.pallas_flops(fn, img)
    assert got is not None
    m, h = got
    # declared: 2*b*(2*hp*wp*gh*gw*nbins + nbins^2*gh*gw), b=2 48x48 g8x8
    want = 2 * 2 * (2 * 48 * 48 * 64 * 256 + 256 * 256 * 64)
    assert m == pytest.approx(want, rel=1e-6)
    assert h == pytest.approx(want, rel=1e-6)

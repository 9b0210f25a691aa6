"""FLOP accounting + MFU for every bench surface.

The reference has no performance accounting at all (its only artifact is
thop counters inside AttentionBlock, video-generation/diffusion/
unet.py:320-338). Here every benchmark reports model FLOPs, achieved
TFLOP/s, and MFU against the chip's peak so "fast" is a hardware-utilization
claim, not a raw throughput number.

FLOPs come from XLA's own cost model over the exact compiled program
(``Compiled.cost_analysis()["flops"]``) — this counts what actually runs
(fwd+bwd+optimizer for a train step, after fusion) rather than a hand
model of what we think runs. ``analytic_*`` helpers cross-check the big
contributors (conv/matmul/attention) where a second opinion is useful.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

# bf16 peak TFLOP/s per chip by device_kind substring (public figures).
# Override with LVG_PEAK_TFLOPS for unlisted hardware.
_PEAK_TFLOPS_BF16 = {
    "v6e": 918.0,       # Trillium
    "v6": 918.0,
    "v5p": 459.0,
    "v5e": 197.0,
    "v5litepod": 197.0,
    "v5lite": 197.0,   # device_kind "TPU v5 lite" (v5e)
    "v4": 275.0,
    "v3": 123.0,
    "v2": 45.0,
}


def device_peak_tflops(device: Optional[jax.Device] = None) -> Optional[float]:
    """Peak bf16 TFLOP/s of one chip, or None if unknown (e.g. CPU)."""
    env = os.environ.get("LVG_PEAK_TFLOPS")
    if env:
        return float(env)
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower().replace(" ", "")
    for key, peak in _PEAK_TFLOPS_BF16.items():
        if key in kind:
            return peak
    return None


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """Total FLOPs of one dispatch of an already-jitted function on the
    given (concrete or ShapeDtypeStruct) args, from XLA's cost model over
    the lowered (pre-optimization) HLO — the algorithmic model-FLOP count.

    Runs client-side on the lowered module; no backend compile (a remote
    TPU compile can take minutes and ``Lowered.compile()`` bypasses the
    already-warm executable). Returns None when unavailable."""
    try:
        lowered = jitted_fn.lower(*args, **kwargs)
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        if flops > 0:
            return flops
    except Exception:
        return None
    # Some backends (the axon TPU relay) don't implement client cost
    # analysis — run XLA's HLO cost model through the host CPU client on
    # the same lowered module (FLOPs are platform-independent pre-opt).
    try:
        from jax._src.lib import xla_client as xc

        mod = lowered.compiler_ir("hlo").as_hlo_module()
        cpu_client = jax.local_devices(backend="cpu")[0].client
        props = xc._xla.hlo_module_cost_analysis(cpu_client, mod)
        flops = float(props.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def mfu_report(
    flops_per_step: Optional[float],
    sec_per_step: float,
    n_chips: int = 1,
) -> Dict[str, Any]:
    """{model_tflops, achieved_tflops_per_sec, mfu} for a bench record.
    MFU = achieved / (n_chips · peak); entries are None when unknown."""
    if not flops_per_step or sec_per_step <= 0:
        return {"model_tflops": None, "achieved_tflops_per_sec": None, "mfu": None}
    achieved = flops_per_step / sec_per_step / 1e12
    peak = device_peak_tflops()
    return {
        "model_tflops": round(flops_per_step / 1e12, 4),
        "achieved_tflops_per_sec": round(achieved, 2),
        "mfu": round(achieved / (peak * n_chips), 4) if peak else None,
    }


# ---------------------------------------------------------------------------
# analytic cross-checks (hand counts of the dominant terms)
# ---------------------------------------------------------------------------

def conv2d_flops(batch: int, out_h: int, out_w: int, cin: int, cout: int,
                 kh: int, kw: int) -> float:
    """2·MACs of a 2-D convolution."""
    return 2.0 * batch * out_h * out_w * cout * kh * kw * cin


def matmul_flops(m: int, n: int, k: int) -> float:
    return 2.0 * m * n * k


def attention_flops(batch: int, seq: int, dim: int) -> float:
    """QK^T + AV for one self-attention (softmax/elementwise ignored)."""
    return 2.0 * (2.0 * batch * seq * seq * dim)

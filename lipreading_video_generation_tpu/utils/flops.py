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
import re
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
    given (concrete or ShapeDtypeStruct) args: XLA's cost model over the
    lowered (pre-optimization) HLO **plus** the work inside Pallas kernels.

    The HLO cost model scores a ``pallas_call`` as an opaque zero-FLOP
    custom call, so any flash-attention-heavy surface (diffusion train is
    ~85% attention FLOPs) would be undercounted ~6× without the jaxpr-walk
    correction from ``pallas_flops``.

    Runs client-side on the lowered module; no backend compile (a remote
    TPU compile can take minutes and ``Lowered.compile()`` bypasses the
    already-warm executable). Returns the MODEL-flop count (see
    ``flops_detail`` for the hardware count too); None when unavailable."""
    detail = flops_detail(jitted_fn, *args, **kwargs)
    return detail["model"] if detail else None


def _hlo_flops_of_lowered(lowered) -> Optional[float]:
    """FLOPs from XLA's cost model over a Lowered's pre-opt HLO, with a
    CPU-client fallback for backends (the axon TPU relay) that don't
    implement client cost analysis."""
    try:
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        if flops > 0:
            return flops
    except Exception:
        pass
    try:
        from jax._src.lib import xla_client as xc

        mod = lowered.compiler_ir("hlo").as_hlo_module()
        cpu_client = jax.local_devices(backend="cpu")[0].client
        props = xc._xla.hlo_module_cost_analysis(cpu_client, mod)
        flops = float(props.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _scan_extra_hlo_flops(jaxpr, mult: float = 1.0) -> float:
    """The HLO cost model scores a ``scan``'s body ONCE, not × trip count
    (measured: a 10-step scanned matmul costs the same as one matmul) — a
    large undercount for scan-repped surfaces (multi-step train dispatch,
    50-step denoise segments, bench rep loops). This walks the jaxpr and
    adds the missing (length − 1) body repetitions, lowering each scan body
    standalone for its own cost analysis (client-side only, no compile)."""
    extra = 0.0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "scan":
            inner = eqn.params.get("jaxpr")
            length = float(eqn.params.get("length", 1))
            if inner is None:
                continue
            try:
                from jax._src.core import jaxpr_as_fun

                body_fn = jaxpr_as_fun(inner)
                shapes = [jax.ShapeDtypeStruct(v.aval.shape, v.aval.dtype)
                          for v in inner.jaxpr.invars]
                body_hlo = _hlo_flops_of_lowered(
                    jax.jit(body_fn).lower(*shapes)) or 0.0
            except Exception:
                body_hlo = 0.0
            extra += mult * (length - 1.0) * body_hlo
            extra += _scan_extra_hlo_flops(inner.jaxpr, mult * length)
            continue
        for v in eqn.params.values():
            if hasattr(v, "jaxpr") and hasattr(getattr(v, "jaxpr"), "eqns"):
                extra += _scan_extra_hlo_flops(v.jaxpr, mult)
            elif hasattr(v, "eqns"):
                extra += _scan_extra_hlo_flops(v, mult)
    return extra


def flops_detail(jitted_fn, *args, **kwargs) -> Optional[Dict[str, float]]:
    """{model, hw} FLOPs of one dispatch. ``model`` = HLO cost model
    (scan-body trip counts restored) + algorithmic Pallas attention matmuls
    (MFU numerator); ``hw`` adds the Pallas kernels' lane-padding and
    backward-recompute multiplies (HFU numerator)."""
    pm, ph = pallas_flops(jitted_fn, *args, **kwargs) or (0.0, 0.0)
    try:
        lowered = jitted_fn.lower(*args, **kwargs)
    except Exception:
        return None
    hlo = _hlo_flops_of_lowered(lowered)
    if hlo is None:
        return None
    try:
        traced = jitted_fn.trace(*args, **kwargs)
        hlo += _scan_extra_hlo_flops(traced.jaxpr.jaxpr)
    except Exception:
        pass
    return {"model": hlo + pm, "hw": hlo + ph}


_FLASH_NAME = re.compile(r"flash_(fwd|dkv|dq)_sq(\d+)_sk(\d+)_d(\d+)")

# per-kernel matmul counts × (2·bh·sq·sk·dim):
#   model = the algorithmic matmuls, logical head dim
#     fwd: QKᵀ + PV = 2;  dkv: dV + dK = 2;  dq: dP + dQ = 2
#     (total bwd = 4 = 2× fwd — the standard MFU convention)
#   hw    = what the kernel really multiplies, lane-PADDED head dim
#     fwd: 2;  dkv: S-recompute + dP + dV + dK = 4;  dq: S + dP + dQ = 3
_FLASH_MATMULS = {"fwd": (2.0, 2.0), "dkv": (2.0, 4.0), "dq": (2.0, 3.0)}

# fused small-MHA kernel (ops/attention.py:_small_mha_kernel): heads folded
# into the token axis, so the hardware computes the full (H·S_pad)² score
# block (cross-head terms included, masked before softmax) while the model
# only needed the H per-head (S, S) blocks.
_SMALL_MHA_NAME = re.compile(r"mha_small_s(\d+)_d(\d+)_h(\d+)")


def _eqn_pallas_flops(eqn) -> tuple:
    """(model_flops, hardware_flops) of one flash-attention ``pallas_call``.

    The kernels in ops/attention.py encode their LOGICAL dims in the kernel
    name (``flash_fwd_sq{s}_sk{s}_d{d}``) because the operand avals only
    show padded shapes — head dim lane-padded to 128, sequence padded to
    the block size. ``model`` counts the algorithmic attention matmuls at
    logical dims (the MFU numerator); ``hw`` counts every multiply the MXU
    performs, padding and backward recompute included (the HFU numerator —
    at head_dim 64 half the lane work is padding)."""
    shapes = [tuple(v.aval.shape) for v in eqn.invars]
    big = [s for s in shapes if len(s) == 3 and s[-1] > 1]
    if not big or len(big[0]) != 3:
        return 0.0, 0.0
    bh, sq_pad, d_pad = big[0]
    sk_pad = big[1][1] if len(big) > 1 else sq_pad
    m = _FLASH_NAME.search(str(eqn.params.get("name") or ""))
    if m:
        kind = m.group(1)
        sq, sk, d = (int(m.group(i)) for i in (2, 3, 4))
        n_model, n_hw = _FLASH_MATMULS[kind]
        return (2.0 * n_model * bh * sq * sk * d,
                2.0 * n_hw * bh * sq_pad * sk_pad * d_pad)
    m = _SMALL_MHA_NAME.search(str(eqn.params.get("name") or ""))
    if m:
        s, d, h = (int(m.group(i)) for i in (1, 2, 3))
        b, hs_pad, d_op = big[0]
        # model: QKᵀ + PV at logical per-head dims; hw: both matmuls over
        # the fused (hs_pad)² block with the contraction/output lane dim
        # padded to 128
        return (4.0 * b * h * s * s * d,
                4.0 * b * hs_pad * hs_pad * max(128.0, float(d_op)))
    # a kernel that declares its own pl.CostEstimate (e.g. the CLAHE
    # kernel) is authoritative — its matmuls are algorithmic work, so
    # model == hw; the shape heuristic below misreads non-attention
    # operand layouts by orders of magnitude
    cost = eqn.params.get("cost_estimate")
    declared = float(getattr(cost, "flops", 0) or 0)
    if declared > 0:
        return declared, declared
    # unnamed pallas_call fallback: padded-shape heuristic (fwd=2 matmuls,
    # 6-operand bwd kernels average 3.5)
    n = 2.0 if len(shapes) == 3 else (3.5 if len(shapes) >= 6 else 0.0)
    hw = 2.0 * n * bh * sq_pad * sk_pad * d_pad
    return hw, hw


def _walk_jaxpr_pallas(jaxpr, mult: float = 1.0) -> tuple:
    """Sum (model, hw) pallas FLOPs over a jaxpr, recursing into
    sub-jaxprs. ``scan`` bodies multiply by trip count; ``cond`` branches
    take the max; ``while`` bodies count one iteration (trip count
    unknowable)."""
    model = hw = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "pallas_call":
            m, h = _eqn_pallas_flops(eqn)
            model += mult * m
            hw += mult * h
            continue
        if name == "scan":
            inner = eqn.params.get("jaxpr")
            length = float(eqn.params.get("length", 1))
            if inner is not None:
                m, h = _walk_jaxpr_pallas(inner.jaxpr, mult * length)
                model += m
                hw += h
            continue
        if name == "cond":
            branches = eqn.params.get("branches", ())
            if branches:
                pairs = [_walk_jaxpr_pallas(b.jaxpr, mult) for b in branches]
                m, h = max(pairs, key=lambda p: p[1])
                model += m
                hw += h
            continue
        for v in eqn.params.values():
            sub = None
            if hasattr(v, "jaxpr") and hasattr(getattr(v, "jaxpr"), "eqns"):
                sub = v.jaxpr
            elif hasattr(v, "eqns"):
                sub = v
            if sub is not None:
                m, h = _walk_jaxpr_pallas(sub, mult)
                model += m
                hw += h
                continue
            if isinstance(v, (tuple, list)):
                for item in v:
                    if hasattr(item, "jaxpr") and hasattr(
                            getattr(item, "jaxpr"), "eqns"):
                        m, h = _walk_jaxpr_pallas(item.jaxpr, mult)
                        model += m
                        hw += h
    return model, hw


def pallas_flops(jitted_fn, *args, **kwargs) -> Optional[tuple]:
    """(model_flops, hardware_flops) inside Pallas kernels for one dispatch
    (see ``_eqn_pallas_flops``); None when tracing fails."""
    try:
        traced = jitted_fn.trace(*args, **kwargs)
        return _walk_jaxpr_pallas(traced.jaxpr.jaxpr)
    except Exception:
        return None


def mfu_report(
    flops_per_step: Optional[Any],
    sec_per_step: float,
    n_chips: int = 1,
) -> Dict[str, Any]:
    """{model_tflops, achieved_tflops_per_sec, mfu[, hw_tflops, hfu]} for a
    bench record. MFU = model flops / time / (n_chips · peak); HFU uses the
    hardware count (Pallas padding + bwd recompute included) when
    ``flops_per_step`` is a ``flops_detail`` dict. Entries None when
    unknown."""
    hw = None
    if isinstance(flops_per_step, dict):
        hw = flops_per_step.get("hw")
        flops_per_step = flops_per_step.get("model")
    if not flops_per_step or sec_per_step <= 0:
        return {"model_tflops": None, "achieved_tflops_per_sec": None, "mfu": None}
    achieved = flops_per_step / sec_per_step / 1e12
    peak = device_peak_tflops()
    out = {
        "model_tflops": round(flops_per_step / 1e12, 4),
        "achieved_tflops_per_sec": round(achieved, 2),
        "mfu": round(achieved / (peak * n_chips), 4) if peak else None,
    }
    if hw and hw > flops_per_step * 1.01:
        out["hw_tflops"] = round(hw / 1e12, 4)
        if peak:
            out["hfu"] = round(hw / sec_per_step / 1e12 / (peak * n_chips), 4)
    return out


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

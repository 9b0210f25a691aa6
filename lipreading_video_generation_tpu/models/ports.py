"""Pretrained-weight ports: torch ``.pth`` state dicts → framework params.

The reference's every real run rests on two pretrained perception nets:
S3FD ``s3fd.pth`` (loaded at gan-model/preprocessing/face_detection/
detection/sfd/sfd_detector.py:16-27) and imagenet DenseNet121
(lipreading/feature_extraction.py:23-28). This module is the end-to-end
port path: read the torch checkpoint on the host (torch is a port-time-only
dependency, never touched by the TPU compute path), convert layouts via the
model modules' converters, and save an Orbax artifact the serving/
preprocessing CLIs load with ``--s3fd-checkpoint`` / ``--densenet-checkpoint``.

Whole-model parity (not just per-layer numerics) is pinned by
tests/test_torch_parity.py: the reference's own ``net_s3fd.py`` definition
with seeded weights vs the converted Flax model — detection heads AND
boxes after NMS; a torchvision-layout DenseNet121 vs the Flax one —
pooled 1024-d features.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import os

import jax
import numpy as np


def _load_torch_state_dict(pth_path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into plain numpy (host-side, CPU-only).

    Accepts both a bare state_dict and the common ``{"state_dict": ...}``
    wrapper; strips DataParallel ``module.`` prefixes like the reference's
    load_checkpoint (gan-model/train_lipreading.py:285-305).
    """
    import torch

    obj = torch.load(pth_path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj and all(
        not hasattr(v, "numpy") for k, v in obj.items() if k != "state_dict"
    ):
        obj = obj["state_dict"]
    out: Dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# --------------------------------------------------------------------------
# S3FD
# --------------------------------------------------------------------------

def port_s3fd(pth_path: str, out_path: str) -> Any:
    """``s3fd.pth`` → Orbax ``{"s3fd": params}`` artifact; returns params."""
    from ..core.checkpoint import save_once
    from .s3fd import convert_torch_state_dict

    params = convert_torch_state_dict(_load_torch_state_dict(pth_path))
    _validate_against_init(params, _s3fd_template())
    save_once(out_path, {"s3fd": params})
    return params


def _s3fd_template():
    from .s3fd import S3FD

    return S3FD().init(
        jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32)
    )["params"]


def load_s3fd_params(checkpoint_path: str) -> Any:
    """Load ported S3FD params (port-s3fd --out artifact)."""
    from ..core.checkpoint import load_once

    return load_once(checkpoint_path, {"s3fd": _s3fd_template()})["s3fd"]


def s3fd_params_or_init(checkpoint_path: Optional[str], seed: int = 0) -> Any:
    """The serving-side switch: ported weights when a checkpoint is given,
    seeded random init otherwise (with a loud warning — a random detector
    emits garbage boxes and downstream falls back to whole-frame crops)."""
    if checkpoint_path:
        return load_s3fd_params(checkpoint_path)
    import sys

    from .s3fd import S3FD

    print(
        "warning: no --s3fd-checkpoint — face detector is RANDOM-INIT; "
        "detections will be garbage (run port-s3fd on s3fd.pth first)",
        file=sys.stderr,
    )
    return S3FD().init(
        jax.random.key(seed), np.zeros((1, 64, 64, 3), np.float32)
    )["params"]


# --------------------------------------------------------------------------
# DenseNet121
# --------------------------------------------------------------------------

def port_densenet(pth_path: str, out_path: str) -> Tuple[Any, Any]:
    """torchvision ``densenet121`` state_dict → Orbax
    ``{"params": ..., "batch_stats": ...}``; returns (params, batch_stats)."""
    from ..core.checkpoint import save_once
    from .densenet import convert_torch_state_dict

    params, stats = convert_torch_state_dict(_load_torch_state_dict(pth_path))
    tmpl_p, tmpl_s = _densenet_template()
    _validate_against_init(params, tmpl_p)
    _validate_against_init(stats, tmpl_s)
    save_once(out_path, {"params": params, "batch_stats": stats})
    return params, stats


def _densenet_template():
    from .densenet import DenseNet121

    variables = DenseNet121().init(
        jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32)
    )
    return variables["params"], variables["batch_stats"]


def load_densenet_variables(checkpoint_path: str) -> Dict[str, Any]:
    """Load ported DenseNet121 variables ready for ``model.apply``."""
    from ..core.checkpoint import load_once

    tmpl_p, tmpl_s = _densenet_template()
    restored = load_once(checkpoint_path, {"params": tmpl_p, "batch_stats": tmpl_s})
    return {"params": restored["params"], "batch_stats": restored["batch_stats"]}


def densenet_variables_or_init(checkpoint_path: Optional[str], seed: int = 0
                               ) -> Dict[str, Any]:
    """Ported imagenet weights when a checkpoint is given (port-densenet
    --out), seeded random init otherwise — random features are still a fixed
    projection the downstream transformer can learn against, but warn since
    the reference always uses imagenet features
    (lipreading/feature_extraction.py:23-28)."""
    if checkpoint_path:
        return load_densenet_variables(checkpoint_path)
    import sys

    from .densenet import DenseNet121

    print(
        "warning: no --densenet-checkpoint — frame embedder is RANDOM-INIT "
        "(run port-densenet on torchvision densenet121 weights for "
        "imagenet-quality features)",
        file=sys.stderr,
    )
    variables = DenseNet121().init(
        jax.random.key(seed), np.zeros((1, 32, 32, 3), np.float32)
    )
    return {"params": variables["params"], "batch_stats": variables["batch_stats"]}


# --------------------------------------------------------------------------
# shared validation
# --------------------------------------------------------------------------

def _validate_against_init(converted, template) -> None:
    """Converted tree must cover the init tree exactly (same paths, same
    shapes) — catches silently-dropped or misnamed torch keys at port time
    instead of at first garbage inference."""
    conv = {jax.tree_util.keystr(p): np.shape(v)
            for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    tmpl = {jax.tree_util.keystr(p): np.shape(v)
            for p, v in jax.tree_util.tree_flatten_with_path(template)[0]}
    missing = sorted(set(tmpl) - set(conv))
    extra = sorted(set(conv) - set(tmpl))
    if missing or extra:
        raise ValueError(
            f"port mismatch: missing={missing[:5]} extra={extra[:5]} "
            f"({len(missing)} missing / {len(extra)} extra total)"
        )
    bad = [k for k in tmpl if tmpl[k] != conv[k]]
    if bad:
        raise ValueError(
            f"port shape mismatch on {bad[:5]} "
            f"(e.g. {bad[0]}: want {tmpl[bad[0]]}, got {conv[bad[0]]})"
        )


# --------------------------------------------------------------------------
# AV-HuBERT video encoder (the frozen lipreading-expert weight port)
# --------------------------------------------------------------------------

def _load_fairseq_model_state(pth_path: str) -> Dict[str, np.ndarray]:
    """Read a fairseq-style checkpoint into plain numpy.

    Handles the layouts the reference's surgery touches
    (gan-model/avhubert_utils.py:39-68, 106-110): the pretraining
    ``{"model": state_dict, ...}`` wrapper, the fine-tuned seq2seq model
    whose encoder lives under ``encoder.w2v_model.``, and the
    ``HubertEncoderWrapper`` ``w2v_model.`` prefix. Non-tensor entries
    (cfg/task_state) are dropped.
    """
    import torch

    try:
        obj = torch.load(pth_path, map_location="cpu", weights_only=True)
    except Exception:
        # fairseq checkpoints pickle omegaconf objects alongside tensors
        obj = torch.load(pth_path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and isinstance(obj.get("model"), dict):
        obj = obj["model"]
    elif isinstance(obj, dict) and isinstance(obj.get("state_dict"), dict):
        obj = obj["state_dict"]
    out: Dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if not hasattr(v, "detach"):
            continue
        changed = True
        while changed:
            changed = False
            for pre in ("module.", "encoder.w2v_model.", "w2v_model."):
                if k.startswith(pre):
                    k = k[len(pre):]
                    changed = True
        out[k] = v.detach().cpu().numpy()
    return out


def _avhubert_template(cfg: Dict[str, int]):
    """(model, abstract params tree) without materializing the weights —
    base AV-HuBERT is ~100M params, so the template is eval_shape-only."""
    import jax.numpy as jnp

    from .avhubert import AVHubertVideoEncoder

    model = AVHubertVideoEncoder(**cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0),
                           jnp.zeros((1, 1, 88, 88, 1), jnp.float32)))
    return model, shapes["params"]


def port_avhubert(pth_path: str, out_path: str,
                  num_heads: Optional[int] = None,
                  pos_conv_groups: Optional[int] = None):
    """AV-HuBERT fairseq checkpoint → Orbax artifact + config sidecar.

    Returns (params, config, skipped_keys). Head count / conv groups are
    not recoverable from tensor shapes; defaults follow the base config
    (embed_dim // 64 heads, 16 groups) with CLI overrides for variants.
    """
    import json

    from ..core.checkpoint import save_once
    from .avhubert import convert_avhubert_state_dict

    sd = _load_fairseq_model_state(pth_path)
    params, cfg, skipped = convert_avhubert_state_dict(sd)
    if num_heads:
        cfg["num_heads"] = int(num_heads)
    if pos_conv_groups:
        cfg["pos_conv_groups"] = int(pos_conv_groups)
    _, tmpl = _avhubert_template(cfg)
    _validate_against_init(params, tmpl)
    save_once(out_path, {"avhubert": params})
    with open(os.path.join(os.path.abspath(out_path),
                           "avhubert.config.json"), "w") as f:
        json.dump(cfg, f)
    return params, cfg, skipped


# --------------------------------------------------------------------------
# Wav2Vec2 (the reference's pretrained diffusion audio conditioning)
# --------------------------------------------------------------------------

def _wav2vec2_template(cfg: Dict[str, Any]):
    """(model, abstract params tree) — eval_shape only (base is ~95M)."""
    import jax.numpy as jnp

    from .wav2vec2 import Wav2Vec2Encoder

    model = Wav2Vec2Encoder(**{k: (tuple(v) if isinstance(v, list) else v)
                               for k, v in cfg.items()})
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 4000), jnp.float32)))
    return model, shapes["params"]


def port_wav2vec2(pth_path: str, out_path: str,
                  num_heads: Optional[int] = None,
                  pos_conv_groups: Optional[int] = None):
    """HF wav2vec2 ``.pth``/``.bin`` state_dict (``Wav2Vec2Model`` or the
    ``Wav2Vec2ForCTC`` wrapper facebook/wav2vec2-base-960h ships as) →
    Orbax artifact + config sidecar. Returns (params, config, skipped).

    Reference surface: video-generation/diffusion/unet_audio.py:11-14 —
    the pretrained encoder the diffusion conditioning is built on."""
    import json

    from ..core.checkpoint import save_once
    from .wav2vec2 import convert_wav2vec2_state_dict

    sd = _load_torch_state_dict(pth_path)
    params, cfg, skipped = convert_wav2vec2_state_dict(
        sd, num_heads=num_heads, pos_conv_groups=pos_conv_groups)
    _, tmpl = _wav2vec2_template(cfg)
    _validate_against_init(params, tmpl)
    save_once(out_path, {"wav2vec2": params})
    with open(os.path.join(os.path.abspath(out_path),
                           "wav2vec2.config.json"), "w") as f:
        json.dump({k: list(v) if isinstance(v, tuple) else v
                   for k, v in cfg.items()}, f)
    return params, cfg, skipped


def load_wav2vec2_params(checkpoint_path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load a ``port-wav2vec2 --out`` artifact → (params, config)."""
    import json

    from ..core.checkpoint import load_once

    with open(os.path.join(os.path.abspath(checkpoint_path),
                           "wav2vec2.config.json")) as f:
        cfg = {k: (tuple(v) if isinstance(v, list) else v)
               for k, v in json.load(f).items()}
    _, tmpl = _wav2vec2_template(cfg)
    params = load_once(checkpoint_path, {"wav2vec2": tmpl})["wav2vec2"]
    return params, cfg


def diffusion_cfg_with_wav2vec2(diff_cfg: Any, w2v_cfg: Dict[str, Any]) -> Any:
    """DiffusionConfig rewritten so ``UNetAudio``'s audio-encoder submodule
    matches a ported wav2vec2's architecture exactly (the graft target
    template). Used by ``train-diffusion --wav2vec2-checkpoint``."""
    import dataclasses

    return dataclasses.replace(
        diff_cfg,
        audio_encoder="wav2vec2",
        audio_embed_dim=w2v_cfg["embed_dim"],
        w2v_num_layers=w2v_cfg["num_layers"],
        w2v_num_heads=w2v_cfg["num_heads"],
        w2v_ffn_dim=w2v_cfg["ffn_dim"],
        w2v_conv_dim=tuple(w2v_cfg["conv_dim"]),
        w2v_conv_kernel=tuple(w2v_cfg["conv_kernel"]),
        w2v_conv_stride=tuple(w2v_cfg["conv_stride"]),
        w2v_pos_conv_kernel=w2v_cfg["pos_conv_kernel"],
        w2v_pos_conv_groups=w2v_cfg["pos_conv_groups"],
    )


def graft_wav2vec2_into_diffusion(diff_params: Any, w2v_params: Any) -> Any:
    """Replace a ``UNetAudio`` state's ``audio_encoder`` subtree with ported
    wav2vec2 weights — the train-diffusion init path for
    ``--wav2vec2-checkpoint`` (requires DiffusionConfig(audio_encoder=
    "wav2vec2") so the subtree shapes line up; validated here)."""
    if "audio_encoder" not in diff_params:
        raise ValueError("diffusion params carry no audio_encoder subtree")
    _validate_against_init(w2v_params, diff_params["audio_encoder"])
    out = dict(diff_params)
    out["audio_encoder"] = w2v_params
    return out


def load_avhubert_expert(checkpoint_path: str):
    """Load a ``port-avhubert --out`` artifact → (model, params) — drops
    into ``train-gan`` as the frozen feature-matching lipreading expert
    (the reference's retrieve_avhubert role, train_lipreading.py:345-346)."""
    import json

    from ..core.checkpoint import load_once

    with open(os.path.join(os.path.abspath(checkpoint_path),
                           "avhubert.config.json")) as f:
        cfg = json.load(f)
    model, tmpl = _avhubert_template(cfg)
    params = load_once(checkpoint_path, {"avhubert": tmpl})["avhubert"]
    return model, params

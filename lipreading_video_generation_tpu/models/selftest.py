"""Port-path selftests: generate a torch-side checkpoint in-env, run the
FULL CLI port path on it, then run inference with the ported artifact.

The real pretrained binaries (`s3fd.pth`, torchvision densenet121, fairseq
AV-HuBERT — reference: gan-model/preprocessing/face_detection/detection/
sfd/sfd_detector.py:16-27, lipreading/feature_extraction.py:23-28,
gan-model/avhubert_utils.py:71-110) are unobtainable in this environment
(no network egress, no torchvision). The port converters are layout- and
numerics-pinned against torch in tests/test_torch_parity.py /
test_avhubert_port.py, but until a real artifact flows
``pth → Orbax → outputs``, "weight port" is a tested mechanism rather than
a demonstrated capability (VERDICT r3). ``port-* --selftest`` closes the
gap as far as this environment allows: it writes a REAL ``.pth`` file with
``torch.save`` (detector-like seeded statistics, exact torch tensor
layouts), drives the same ``port_*`` entry the CLI uses on a user-supplied
file, loads the Orbax artifact back through the serving loaders, and runs
the model — detection boxes / pooled features / encoder features — so the
whole binary-to-inference chain executes end to end. When the real binary
becomes available, the identical command minus ``--selftest`` ports it.

torch is a port-time-only dependency (never on the TPU compute path).
"""
from __future__ import annotations

import hashlib
import os
from typing import Any, Dict

import jax
import numpy as np


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


# ---------------------------------------------------------------------------
# S3FD
# ---------------------------------------------------------------------------

def make_s3fd_selftest_pth(pth_path: str, seed: int = 0) -> str:
    """Write an ``s3fd.pth``-layout checkpoint with detector-like seeded
    weights (same recipe the whole-model parity test uses): fan-in-scaled
    backbone so activations stay O(1), L2Norm scales at their published
    10/8/5, conf heads background-biased with enough spread that a handful
    of positions fire >0.5, loc heads small so boxes stay anchor-sized."""
    import torch

    from . import ports

    rng = np.random.default_rng(seed)
    conf_w = {"conv3_3_norm_mbox_conf": 3.5, "conv4_3_norm_mbox_conf": 3.5,
              "conv5_3_norm_mbox_conf": 2.1, "fc7_mbox_conf": 0.015,
              "conv6_2_mbox_conf": 0.015, "conv7_2_mbox_conf": 0.015}
    l2_scale = {"conv3_3_norm": 10.0, "conv4_3_norm": 8.0, "conv5_3_norm": 5.0}
    sd: Dict[str, Any] = {}
    for mod, leaves in ports._s3fd_template().items():
        for leaf, tmpl in leaves.items():
            shape = np.shape(tmpl)
            if leaf == "kernel":                       # (kh, kw, I, O) → (O, I, kh, kw)
                kh, kw, ci, _ = shape
                fan_in = kh * kw * ci
                if "mbox_conf" in mod:
                    w = rng.standard_normal(shape) * conf_w[mod] * (2.0 / fan_in) ** 0.5
                elif "mbox_loc" in mod:
                    w = rng.standard_normal(shape) * 0.02 * (2.0 / fan_in) ** 0.5
                else:
                    w = rng.standard_normal(shape) * (2.0 / fan_in) ** 0.5
                sd[f"{mod}.weight"] = torch.from_numpy(
                    w.astype(np.float32).transpose(3, 2, 0, 1).copy())
            elif leaf == "weight":                     # L2Norm scale
                w = l2_scale[mod] + 0.01 * rng.standard_normal(shape)
                sd[f"{mod}.weight"] = torch.from_numpy(w.astype(np.float32))
            else:                                      # bias
                if "mbox_conf" in mod:
                    b = np.full(shape, 1.2, np.float32)
                    b[-1] = -1.2
                    b += 0.1 * rng.standard_normal(shape).astype(np.float32)
                elif "mbox_loc" in mod:
                    b = 0.05 * rng.standard_normal(shape).astype(np.float32)
                else:
                    b = 0.01 * rng.standard_normal(shape).astype(np.float32)
                sd[f"{mod}.bias"] = torch.from_numpy(b.astype(np.float32))
    torch.save(sd, pth_path)
    return pth_path


def selftest_s3fd(out_path: str, seed: int = 0) -> Dict[str, Any]:
    """.pth → port-s3fd → load → jitted detection boxes on an image."""
    import jax.numpy as jnp

    from . import ports
    from . import s3fd as sf

    pth = os.path.abspath(out_path.rstrip("/")) + ".selftest_src.pth"
    os.makedirs(os.path.dirname(pth), exist_ok=True)
    make_s3fd_selftest_pth(pth, seed)
    ports.port_s3fd(pth, out_path)
    params = ports.load_s3fd_params(out_path)

    rng = np.random.default_rng(seed + 1)
    img = rng.uniform(0, 255, (1, 128, 128, 3)).astype(np.float32)
    boxes, scores, valid = sf.detect_faces(
        sf.S3FD(), params, jnp.asarray(img), max_faces=32)
    n = int(np.asarray(valid[0]).sum())
    if n < 1:
        raise RuntimeError(
            "port selftest FAILED: ported detector produced no detections "
            "(the seeded recipe is known to fire >0.5 at 128²)")
    kept = np.asarray(boxes[0])[np.asarray(valid[0])]
    return {
        "pth": pth, "pth_sha256": _sha256(pth), "artifact": out_path,
        "n_detections": n,
        "first_box": [round(float(v), 2) for v in kept[0]],
    }


# ---------------------------------------------------------------------------
# DenseNet121
# ---------------------------------------------------------------------------

def make_densenet_selftest_pth(pth_path: str, seed: int = 0) -> str:
    """Write a torchvision-``densenet121``-layout state_dict (key names per
    torchvision's features.denseblock{i}.denselayer{j}.* scheme) with
    seeded weights shaped from the Flax template — the exact inverse of
    ``models/densenet.convert_torch_state_dict``'s mapping."""
    import torch

    from . import ports

    rng = np.random.default_rng(seed)
    tmpl_p, tmpl_s = ports._densenet_template()

    def torch_name(mod: str, sub: str | None) -> str:
        if mod.startswith("block"):
            bi, li = mod[len("block"):].split("_layer")
            return f"features.denseblock{int(bi) + 1}.denselayer{int(li) + 1}.{sub}"
        if mod.startswith("transition"):
            return f"features.transition{int(mod[len('transition'):]) + 1}.{sub}"
        if mod == "norm_final":
            return "features.norm5"
        return f"features.{mod}"

    sd: Dict[str, Any] = {}

    def emit(tree: Dict) -> None:
        for mod, node in tree.items():
            # node is either {leaf: arr} or {sub: {leaf: arr}}
            flat = []
            for k, v in node.items():
                if isinstance(v, dict):
                    flat.extend(((k, leaf), arr) for leaf, arr in v.items())
                else:
                    flat.append(((None, k), v))
            for (sub, leaf), tmpl in flat:
                shape = np.shape(tmpl)
                base = torch_name(mod, sub)
                if leaf == "kernel":                   # (kh,kw,I,O) → (O,I,kh,kw)
                    kh, kw, ci, _ = shape
                    w = rng.standard_normal(shape) * (2.0 / (kh * kw * ci)) ** 0.5
                    sd[f"{base}.weight"] = torch.from_numpy(
                        w.astype(np.float32).transpose(3, 2, 0, 1).copy())
                elif leaf == "scale":
                    sd[f"{base}.weight"] = torch.from_numpy(
                        (1.0 + 0.05 * rng.standard_normal(shape)).astype(np.float32))
                elif leaf == "bias":
                    sd[f"{base}.bias"] = torch.from_numpy(
                        (0.05 * rng.standard_normal(shape)).astype(np.float32))
                elif leaf == "mean":
                    sd[f"{base}.running_mean"] = torch.from_numpy(
                        (0.1 * rng.standard_normal(shape)).astype(np.float32))
                elif leaf == "var":
                    sd[f"{base}.running_var"] = torch.from_numpy(
                        (0.5 + rng.uniform(0, 1, shape)).astype(np.float32))

    emit(tmpl_p)
    emit(tmpl_s)
    torch.save(sd, pth_path)
    return pth_path


def selftest_densenet(out_path: str, seed: int = 0) -> Dict[str, Any]:
    """.pth → port-densenet → load → pooled 1024-d features on an image."""
    import jax.numpy as jnp

    from . import ports
    from .densenet import DenseNet121

    pth = os.path.abspath(out_path.rstrip("/")) + ".selftest_src.pth"
    os.makedirs(os.path.dirname(pth), exist_ok=True)
    make_densenet_selftest_pth(pth, seed)
    ports.port_densenet(pth, out_path)
    variables = ports.load_densenet_variables(out_path)

    rng = np.random.default_rng(seed + 1)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    feats = np.asarray(DenseNet121().apply(variables, img))
    if not np.all(np.isfinite(feats)) or float(np.abs(feats).sum()) == 0.0:
        raise RuntimeError("port selftest FAILED: non-finite or all-zero features")
    return {
        "pth": pth, "pth_sha256": _sha256(pth), "artifact": out_path,
        "feature_shape": list(feats.shape),
        "feature_l2": round(float(np.linalg.norm(feats)), 4),
    }


# ---------------------------------------------------------------------------
# AV-HuBERT video encoder
# ---------------------------------------------------------------------------

def make_avhubert_selftest_pth(pth_path: str, seed: int = 0,
                               embed: int = 64, layers: int = 2,
                               base: int = 8, ffn: int = 128,
                               pos_kernel: int = 16) -> str:
    """Write a fairseq-AV-HuBERT-layout checkpoint (``{"model": sd}``
    wrapper, resnet.py ResEncoder + wav2vec2 TransformerEncoder key
    scheme) sized small enough to port+run in seconds."""
    import torch

    rng = np.random.default_rng(seed)

    def t(shape, scale=None):
        fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        s = scale if scale is not None else (2.0 / max(fan_in, 1)) ** 0.5
        return torch.from_numpy((rng.standard_normal(shape) * s).astype(np.float32))

    def bn(prefix, c, sd):
        sd[f"{prefix}.weight"] = t((c,), 0.0) + 1.0
        sd[f"{prefix}.bias"] = t((c,), 0.05)
        sd[f"{prefix}.running_mean"] = t((c,), 0.1)
        sd[f"{prefix}.running_var"] = torch.from_numpy(
            (0.5 + rng.uniform(0, 1, (c,))).astype(np.float32))
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(1000)

    sd: Dict[str, Any] = {}
    vp = "feature_extractor_video.resnet"
    sd[f"{vp}.frontend3D.0.weight"] = t((base, 1, 5, 7, 7))
    bn(f"{vp}.frontend3D.1", base, sd)
    sd[f"{vp}.frontend3D.2.weight"] = t((base,), 0.0) + 0.25   # PReLU alpha

    c_prev = base
    for li in range(1, 5):
        c = base * 2 ** (li - 1)
        for bi in range(2):
            tp = f"{vp}.trunk.layer{li}.{bi}"
            cin = c_prev if bi == 0 else c
            sd[f"{tp}.conv1.weight"] = t((c, cin, 3, 3))
            bn(f"{tp}.bn1", c, sd)
            sd[f"{tp}.relu1.weight"] = t((c,), 0.0) + 0.25
            sd[f"{tp}.conv2.weight"] = t((c, c, 3, 3))
            bn(f"{tp}.bn2", c, sd)
            sd[f"{tp}.relu2.weight"] = t((c,), 0.0) + 0.25
            if bi == 0 and li > 1:
                sd[f"{tp}.downsample.0.weight"] = t((c, cin, 1, 1))
                bn(f"{tp}.downsample.1", c, sd)
        c_prev = c

    sd["feature_extractor_video.proj.weight"] = t((embed, 8 * base))
    sd["feature_extractor_video.proj.bias"] = t((embed,), 0.01)
    sd["layer_norm.weight"] = t((2 * embed,), 0.0) + 1.0
    sd["layer_norm.bias"] = t((2 * embed,), 0.01)
    sd["post_extract_proj.weight"] = t((embed, 2 * embed))
    sd["post_extract_proj.bias"] = t((embed,), 0.01)

    groups = 16
    sd["encoder.pos_conv.0.weight_v"] = t((embed, embed // groups, pos_kernel))
    sd["encoder.pos_conv.0.weight_g"] = t((1, 1, pos_kernel), 0.0) + 1.0
    sd["encoder.pos_conv.0.bias"] = t((embed,), 0.01)
    sd["encoder.layer_norm.weight"] = t((embed,), 0.0) + 1.0
    sd["encoder.layer_norm.bias"] = t((embed,), 0.01)
    for i in range(layers):
        lp = f"encoder.layers.{i}"
        for p in ("q", "k", "v", "out"):
            sd[f"{lp}.self_attn.{p}_proj.weight"] = t((embed, embed))
            sd[f"{lp}.self_attn.{p}_proj.bias"] = t((embed,), 0.01)
        sd[f"{lp}.self_attn_layer_norm.weight"] = t((embed,), 0.0) + 1.0
        sd[f"{lp}.self_attn_layer_norm.bias"] = t((embed,), 0.01)
        sd[f"{lp}.fc1.weight"] = t((ffn, embed))
        sd[f"{lp}.fc1.bias"] = t((ffn,), 0.01)
        sd[f"{lp}.fc2.weight"] = t((embed, ffn))
        sd[f"{lp}.fc2.bias"] = t((embed,), 0.01)
        sd[f"{lp}.final_layer_norm.weight"] = t((embed,), 0.0) + 1.0
        sd[f"{lp}.final_layer_norm.bias"] = t((embed,), 0.01)
    # keys a real checkpoint carries that the converter must skip
    sd["final_proj.weight"] = t((embed, embed))
    sd["mask_emb"] = t((embed,), 0.02)

    torch.save({"model": sd}, pth_path)
    return pth_path


def make_wav2vec2_selftest_pth(pth_path: str, seed: int = 0):
    """Write a REAL HF checkpoint: a small ``Wav2Vec2ForCTC`` built with
    the in-env ``transformers`` (the same class facebook/wav2vec2-base-960h
    serializes — ``wav2vec2.``-prefixed encoder keys + ``lm_head``), saved
    with ``torch.save``. Returns (path, the live torch model) so the caller
    can pin ported outputs against the genuine HF forward — a stronger
    in-env demonstration than seeded-stat layouts."""
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    torch.manual_seed(seed)
    hf_cfg = Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=(24, 24, 24), conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=False,
        feat_extract_norm="group", conv_bias=False, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        vocab_size=32)
    model = Wav2Vec2ForCTC(hf_cfg).eval()
    torch.save(model.state_dict(), pth_path)
    return pth_path, model


def selftest_wav2vec2(out_path: str, seed: int = 0) -> Dict[str, Any]:
    """HF .pth → port-wav2vec2 → load → graft into UNetAudio → the full
    diffusion conditioning path (encode_condition + one denoise step), with
    the ported encoder's features pinned against the live HF forward."""
    import torch

    import jax.numpy as jnp

    from ..core.config import DiffusionConfig
    from . import ports
    from .unet_audio import UNetAudio

    pth = os.path.abspath(out_path.rstrip("/")) + ".selftest_src.pth"
    os.makedirs(os.path.dirname(pth), exist_ok=True)
    _, hf_model = make_wav2vec2_selftest_pth(pth, seed)
    # 64-wide model: heads not recoverable from shapes (default would be 1)
    ports.port_wav2vec2(pth, out_path, num_heads=4)
    w2v_params, w2v_cfg = ports.load_wav2vec2_params(out_path)

    # parity of the ported encoder vs the genuine HF forward
    rng = np.random.default_rng(seed + 1)
    wave = rng.standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model.wav2vec2(torch.from_numpy(wave)).last_hidden_state.numpy()
    model, _ = ports._wav2vec2_template(w2v_cfg)
    # pin full f32 matmul precision for the parity check: on TPU the
    # default contracts at bf16 grade, which is rounding noise (~1e-2),
    # not a layout error — the thing this check exists to catch
    with jax.default_matmul_precision("highest"):
        got = np.asarray(model.apply({"params": w2v_params}, jnp.asarray(wave)))
    err = float(np.abs(got - ref).max())
    if err > 5e-3:
        raise RuntimeError(
            f"port selftest FAILED: ported wav2vec2 diverges from the HF "
            f"forward (max abs err {err:.2e})")

    # the serving surface: graft into UNetAudio and run the conditioning +
    # denoise path the diffusion sampler drives
    cfg = ports.diffusion_cfg_with_wav2vec2(
        DiffusionConfig(im_size=16, base_channels=32, channel_mult=(1, 2),
                        num_res_blocks=1, attention_resolutions=(2,),
                        num_heads=2, time_embed_dim=64, audio_proj_dim=16,
                        im_cond_channels=8, audio_samples=1600,
                        num_timesteps=10, dtype="float32"),
        w2v_cfg)
    unet = UNetAudio(cfg)
    variables = unet.init(jax.random.key(seed),
                          jnp.zeros((1, 16, 16, 3)),
                          jnp.zeros((1, 16, 16, 3)),
                          jnp.zeros((1, cfg.audio_samples)),
                          jnp.zeros((1,), jnp.int32))
    grafted = ports.graft_wav2vec2_into_diffusion(
        dict(variables["params"]), w2v_params)
    cond = unet.apply({"params": grafted}, jnp.asarray(wave[:1]),
                      jnp.zeros((1, 16, 16, 3)),
                      method=UNetAudio.encode_condition)
    eps = unet.apply({"params": grafted}, jnp.zeros((1, 16, 16, 3)),
                     cond, jnp.zeros((1,), jnp.int32),
                     method=UNetAudio.denoise)
    if not (np.all(np.isfinite(np.asarray(cond)))
            and np.all(np.isfinite(np.asarray(eps)))):
        raise RuntimeError("port selftest FAILED: non-finite conditioning "
                           "or denoise output")
    return {
        "pth": pth, "pth_sha256": _sha256(pth), "artifact": out_path,
        "config": {k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in w2v_cfg.items()},
        "hf_parity_max_abs_err": err,
        "cond_map_shape": list(np.shape(cond)),
        "eps_shape": list(np.shape(eps)),
    }


def selftest_avhubert(out_path: str, seed: int = 0) -> Dict[str, Any]:
    """fairseq .pt → port-avhubert → load → encoder features on video."""
    import jax.numpy as jnp

    from . import ports

    pth = os.path.abspath(out_path.rstrip("/")) + ".selftest_src.pt"
    os.makedirs(os.path.dirname(pth), exist_ok=True)
    make_avhubert_selftest_pth(pth, seed)
    params, cfg, skipped = ports.port_avhubert(pth, out_path)
    model, loaded = ports.load_avhubert_expert(out_path)

    rng = np.random.default_rng(seed + 1)
    video = jnp.asarray(rng.standard_normal((1, 3, 88, 88, 1)).astype(np.float32))
    feats = np.asarray(model.apply({"params": loaded}, video))
    if not np.all(np.isfinite(feats)):
        raise RuntimeError("port selftest FAILED: non-finite encoder features")
    return {
        "pth": pth, "pth_sha256": _sha256(pth), "artifact": out_path,
        "config": cfg, "skipped_keys": len(skipped),
        "feature_shape": list(feats.shape),
        "feature_l2": round(float(np.linalg.norm(feats)), 4),
    }

"""WHOLE-MODEL torch↔Flax parity for the AV-HuBERT video-encoder port.

The reference's lipreading expert is a downloaded fairseq AV-HuBERT
ensemble (gan-model/avhubert_utils.py:71-110) — fairseq is not installed
here and the real checkpoint is a Google-Drive artifact, so (exactly like
the DenseNet121 parity test) the torch side is a hand-built model with the
fairseq state_dict key layout: ``feature_extractor_video.resnet.*`` for the
3-D stem + ResNet-18 trunk, ``encoder.pos_conv.0.{weight_g,weight_v}`` for
the weight-normed conv positional embedding, ``encoder.layers.N.*`` for the
post-norm transformer. Seeded random weights (with live BN running stats)
convert through the production port path and the Flax encoder must
reproduce the per-frame features end to end — including the folded-BN
rewrite and the video-only zero-filled audio slot.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lipreading_video_generation_tpu.models import avhubert as avh  # noqa: E402

# Tiny config: full architecture, scaled so XLA-CPU compiles stay in the
# slow-tier budget.
CFG = dict(embed_dim=64, num_layers=2, num_heads=4, ffn_dim=128,
           resnet_base=8, pos_conv_kernel=16, pos_conv_groups=4)


class _SamePad(torch.nn.Module):
    """fairseq SamePad: trim the trailing step an even-kernel conv adds."""

    def __init__(self, kernel):
        super().__init__()
        self.trim = 1 if kernel % 2 == 0 else 0

    def forward(self, x):
        return x[:, :, : -self.trim] if self.trim else x


class _TorchBasicBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.relu1 = torch.nn.PReLU(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.relu2 = torch.nn.PReLU(cout)
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = self.relu1(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return self.relu2(h + r)


class _TorchTrunk(torch.nn.Module):
    """ResNet-18 (PReLU variant), av_hubert resnet.py trunk layout."""

    def __init__(self, base):
        super().__init__()
        plan = [(base, base, 1), (base, 2 * base, 2),
                (2 * base, 4 * base, 2), (4 * base, 8 * base, 2)]
        for li, (cin, cout, stride) in enumerate(plan, start=1):
            self.add_module(f"layer{li}", torch.nn.Sequential(
                _TorchBasicBlock(cin, cout, stride),
                _TorchBasicBlock(cout, cout, 1)))

    def forward(self, x):
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)


class _TorchResEncoder(torch.nn.Module):
    def __init__(self, base):
        super().__init__()
        self.frontend3D = torch.nn.Sequential(
            torch.nn.Conv3d(1, base, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            torch.nn.BatchNorm3d(base),
            torch.nn.PReLU(base),
            torch.nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)))
        self.trunk = _TorchTrunk(base)

    def forward(self, x):          # (B, 1, T, H, W)
        x = self.frontend3D(x)
        b, c, t, h, w = x.shape
        x = x.transpose(1, 2).reshape(b * t, c, h, w)
        return self.trunk(x).view(b, t, -1)   # (B, T, 8·base)


class _TorchSubModel(torch.nn.Module):
    def __init__(self, base, embed):
        super().__init__()
        self.resnet = _TorchResEncoder(base)
        self.proj = torch.nn.Linear(8 * base, embed)


class _TorchEncoderLayer(torch.nn.Module):
    def __init__(self, embed, ffn, heads):
        super().__init__()
        self.heads = heads
        attn = torch.nn.Module()
        attn.q_proj = torch.nn.Linear(embed, embed)
        attn.k_proj = torch.nn.Linear(embed, embed)
        attn.v_proj = torch.nn.Linear(embed, embed)
        attn.out_proj = torch.nn.Linear(embed, embed)
        self.self_attn = attn
        self.self_attn_layer_norm = torch.nn.LayerNorm(embed)
        self.fc1 = torch.nn.Linear(embed, ffn)
        self.fc2 = torch.nn.Linear(ffn, embed)
        self.final_layer_norm = torch.nn.LayerNorm(embed)

    def forward(self, x):          # post-norm (layer_norm_first=False)
        b, t, e = x.shape
        d = e // self.heads

        def split(v):
            return v.view(b, t, self.heads, d).transpose(1, 2)

        q = split(self.self_attn.q_proj(x)) / d ** 0.5
        k, v = split(self.self_attn.k_proj(x)), split(self.self_attn.v_proj(x))
        a = torch.softmax(q @ k.transpose(-1, -2), dim=-1) @ v
        a = self.self_attn.out_proj(a.transpose(1, 2).reshape(b, t, e))
        x = self.self_attn_layer_norm(x + a)
        h = self.fc2(torch.nn.functional.gelu(self.fc1(x)))
        return self.final_layer_norm(x + h)


class _TorchAVHubertVideo(torch.nn.Module):
    """fairseq AVHubertModel key layout, video path only (audio slot
    zero-filled like fairseq's forward_features with audio=None)."""

    def __init__(self, embed=64, layers=2, heads=4, ffn=128, base=8,
                 pos_kernel=16, pos_groups=4):
        super().__init__()
        self.feature_extractor_video = _TorchSubModel(base, embed)
        self.layer_norm = torch.nn.LayerNorm(2 * embed)
        self.post_extract_proj = torch.nn.Linear(2 * embed, embed)
        enc = torch.nn.Module()
        pos = torch.nn.Conv1d(embed, embed, pos_kernel,
                              padding=pos_kernel // 2, groups=pos_groups)
        pos = torch.nn.utils.weight_norm(pos, name="weight", dim=2)
        enc.pos_conv = torch.nn.Sequential(pos, _SamePad(pos_kernel), torch.nn.GELU())
        enc.layers = torch.nn.ModuleList(
            [_TorchEncoderLayer(embed, ffn, heads) for _ in range(layers)])
        enc.layer_norm = torch.nn.LayerNorm(embed)
        self.encoder = enc

    def forward(self, video):      # (B, T, H, W, 1) normalized
        x = video.permute(0, 4, 1, 2, 3)           # → (B, 1, T, H, W)
        feats_v = self.feature_extractor_video.resnet(x)
        v = self.feature_extractor_video.proj(feats_v)
        fused = torch.cat([torch.zeros_like(v), v], dim=-1)
        x = self.post_extract_proj(self.layer_norm(fused))
        pos = self.encoder.pos_conv(x.transpose(1, 2)).transpose(1, 2)
        x = self.encoder.layer_norm(x + pos)
        for layer in self.encoder.layers:
            x = layer(x)
        return x


def _seeded_state_dict(model, seed=0):
    """Random-but-realistic weights: fan-in-scaled convs/linears, live BN
    running stats, PReLU slopes near 0.25, LN near identity."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for k, v in model.state_dict().items():
        if k.endswith("num_batches_tracked"):
            sd[k] = v
        elif k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        elif k.endswith("running_mean"):
            sd[k] = 0.1 * torch.randn(v.shape, generator=g)
        elif k.endswith("weight_g"):
            sd[k] = 0.5 + 0.5 * torch.rand(v.shape, generator=g)
        elif ("relu" in k or "prelu" in k.lower() or k.endswith("3D.2.weight")):
            sd[k] = 0.25 + 0.1 * torch.randn(v.shape, generator=g)
        elif "layer_norm" in k or "_norm" in k:
            sd[k] = ((torch.ones if k.endswith("weight") else torch.zeros)(v.shape)
                     + 0.05 * torch.randn(v.shape, generator=g))
        elif v.ndim >= 2:
            fan_in = int(np.prod(v.shape[1:]))
            sd[k] = torch.randn(v.shape, generator=g) * (2.0 / fan_in) ** 0.5
        else:
            sd[k] = 0.05 * torch.randn(v.shape, generator=g)
    return sd


def _torch_model_and_flax_params(seed=0):
    tm = _TorchAVHubertVideo()
    tm.load_state_dict(_seeded_state_dict(tm, seed))
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, cfg, skipped = avh.convert_avhubert_state_dict(sd)
    assert cfg["embed_dim"] == CFG["embed_dim"]
    assert cfg["num_layers"] == CFG["num_layers"]
    assert cfg["ffn_dim"] == CFG["ffn_dim"]
    assert cfg["resnet_base"] == CFG["resnet_base"]
    assert cfg["pos_conv_kernel"] == CFG["pos_conv_kernel"]
    return tm, params, skipped


@pytest.mark.slow
def test_avhubert_whole_model_feature_parity():
    tm, params, skipped = _torch_model_and_flax_params()
    assert skipped == []   # the video-only mirror has no extra keys

    rng = np.random.default_rng(0)
    # avhubert_video_transform-scale inputs: (x/255 - 0.421) / 0.165
    video = ((rng.random((2, 5, 88, 88, 1)).astype(np.float32) - 0.421) / 0.165)
    with torch.no_grad():
        want = tm(torch.from_numpy(video)).numpy()

    model = avh.AVHubertVideoEncoder(**CFG)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(video)))
    assert got.shape == want.shape == (2, 5, CFG["embed_dim"])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_avhubert_converter_rejects_layout_drift():
    tm = _TorchAVHubertVideo()
    tm.load_state_dict(_seeded_state_dict(tm))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd["encoder.layers.0.self_attn.rotary_emb.inv_freq"] = np.zeros((4,), np.float32)
    with pytest.raises(ValueError, match="unrecognized"):
        avh.convert_avhubert_state_dict(sd)


@pytest.mark.slow
def test_avhubert_converter_skips_nonvideo_keys():
    """Audio frontend / decoder / pretraining heads are skipped silently —
    they exist in every real AV-HuBERT checkpoint."""
    tm = _TorchAVHubertVideo()
    tm.load_state_dict(_seeded_state_dict(tm))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd["feature_extractor_audio.proj.weight"] = np.zeros((64, 104), np.float32)
    sd["mask_emb"] = np.zeros((64,), np.float32)
    sd["decoder.embed_tokens.weight"] = np.zeros((10, 64), np.float32)
    sd["final_proj.weight"] = np.zeros((64, 64), np.float32)
    _, _, skipped = avh.convert_avhubert_state_dict(sd)
    assert set(skipped) == {"feature_extractor_audio.proj.weight", "mask_emb",
                            "decoder.embed_tokens.weight", "final_proj.weight"}


@pytest.mark.slow
def test_port_avhubert_cli_roundtrip(tmp_path):
    """port-avhubert CLI on a fairseq-layout checkpoint (``{"model": sd}``
    wrapper AND the fine-tuned ``encoder.w2v_model.`` prefix), then
    load_avhubert_expert restores identical params + the right config."""
    from lipreading_video_generation_tpu import cli
    from lipreading_video_generation_tpu.models import ports

    tm = _TorchAVHubertVideo()
    tm.load_state_dict(_seeded_state_dict(tm))
    sd = {f"encoder.w2v_model.{k}": v for k, v in tm.state_dict().items()}
    sd["decoder.embed_tokens.weight"] = torch.zeros(10, 64)
    pth = tmp_path / "avhubert.pt"
    torch.save({"model": sd, "extra_state": {"epoch": 1}}, str(pth))

    out = tmp_path / "avhubert_orbax"
    assert cli.main(["port-avhubert", "--pth", str(pth), "--out", str(out),
                     "--num-heads", "4", "--pos-conv-groups", "4"]) == 0
    model, params = ports.load_avhubert_expert(str(out))
    assert model.embed_dim == 64 and model.num_layers == 2
    assert model.num_heads == 4 and model.pos_conv_groups == 4

    want, _, _ = avh.convert_avhubert_state_dict(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()})
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(want)[0],
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.slow
def test_gan_train_step_with_avhubert_expert():
    """A ported AV-HuBERT encoder drops into gan_train_step as the frozen
    lipreading expert: the feature-matching criterion runs (even when
    transcripts are present — the ported encoder has no text decoder) and
    gradients flow to the generator (retrieve_avhubert role,
    train_lipreading.py:128-133, 345-346)."""
    from lipreading_video_generation_tpu.core.config import GanConfig
    from lipreading_video_generation_tpu.data import datasets
    from lipreading_video_generation_tpu.pipelines import train_gan

    key = jax.random.key(0)
    expert = avh.AVHubertVideoEncoder(**CFG)
    expert_params = expert.init(key, jnp.zeros((1, 5, 88, 88, 1)))["params"]
    cfg = GanConfig(model_width=0.125, lip_weight=0.1, dtype="float32")
    state = train_gan.create_state(cfg, key, lip_expert_params=expert_params,
                                   lip_expert_model=expert)
    clips = datasets.synthetic_gan_clips(n_clips=2, frames=20, with_text=True)
    sampler = datasets.GanWindowSampler(clips, seed=0, with_text=True)
    batch = {k: jnp.asarray(v) for k, v in sampler.sample_batch(2).items()}
    before = jax.tree_util.tree_leaves(state.gen_params)[0].copy()
    state, metrics = train_gan.gan_train_step(state, batch, key, cfg)
    assert np.isfinite(float(metrics["loss/lip"]))
    assert float(metrics["loss/lip"]) > 0.0
    after = jax.tree_util.tree_leaves(state.gen_params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))

"""Wav2Vec2 weight-port: whole-model parity vs the in-env HF
``Wav2Vec2Model`` (transformers is a baked-in test dependency here — unlike
s3fd/densenet, the reference's exact source class is importable, so parity
is pinned against the genuine forward, not a re-implementation).

Reference surface: video-generation/diffusion/unet_audio.py:11-14 — the
pretrained facebook/wav2vec2-base-960h the diffusion conditioning is built
on (tokenizer at dataset.py:130).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lipreading_video_generation_tpu.models import ports  # noqa: E402
from lipreading_video_generation_tpu.models.wav2vec2 import (  # noqa: E402
    Wav2Vec2Encoder,
    convert_wav2vec2_state_dict,
    infer_config,
)


def _small_hf_model(seed=0, ctc=False):
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC, Wav2Vec2Model

    torch.manual_seed(seed)
    cfg = transformers.Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=(24, 24, 24), conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=False,
        feat_extract_norm="group", conv_bias=False, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        vocab_size=32)
    cls = Wav2Vec2ForCTC if ctc else Wav2Vec2Model
    return cls(cfg).eval()


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_wav2vec2_whole_model_parity():
    """Converted params through the Flax encoder must reproduce the HF
    ``last_hidden_state`` (feature extractor + projection + pos-conv +
    post-norm transformer, end to end)."""
    m = _small_hf_model()
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(wave)).last_hidden_state.numpy()
    params, cfg, skipped = convert_wav2vec2_state_dict(_sd(m), num_heads=4)
    assert skipped == ["masked_spec_embed"]
    assert cfg["pos_conv_groups"] == 4      # recovered from the weight shape
    out = np.asarray(Wav2Vec2Encoder(**cfg).apply(
        {"params": params}, jnp.asarray(wave)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_wav2vec2_forctc_prefix_and_head_skip():
    """The ForCTC layout -base-960h ships as: ``wav2vec2.``-prefixed
    encoder keys + an ``lm_head`` the converter must drop. Converted
    params must match the bare-layout conversion exactly."""
    m = _small_hf_model(ctc=True)
    sd_ctc = _sd(m)
    assert any(k.startswith("wav2vec2.") for k in sd_ctc)
    assert any(k.startswith("lm_head.") for k in sd_ctc)
    p_ctc, cfg_ctc, skipped = convert_wav2vec2_state_dict(sd_ctc, num_heads=4)
    assert any(k.startswith("lm_head.") for k in skipped)
    p_bare, cfg_bare, _ = convert_wav2vec2_state_dict(_sd(m.wav2vec2),
                                                      num_heads=4)
    assert cfg_ctc == cfg_bare
    for a, b in zip(jax.tree_util.tree_leaves(p_ctc),
                    jax.tree_util.tree_leaves(p_bare)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wav2vec2_both_weight_norm_layouts():
    """torch serializes weight_norm either as legacy ``weight_{g,v}`` (the
    published -base-960h .bin) or as ``parametrizations.weight.original
    {0,1}`` (this env's torch) — the converter must accept both and produce
    the identical composed kernel."""
    m = _small_hf_model()
    sd = _sd(m)
    base = "encoder.pos_conv_embed.conv"
    new_g = f"{base}.parametrizations.weight.original0"
    old_g = f"{base}.weight_g"
    alt = dict(sd)
    if new_g in sd:      # rewrite to the legacy layout
        alt[old_g] = alt.pop(new_g)
        alt[f"{base}.weight_v"] = alt.pop(
            f"{base}.parametrizations.weight.original1")
    else:                # rewrite to the new layout
        alt[new_g] = alt.pop(old_g)
        alt[f"{base}.parametrizations.weight.original1"] = alt.pop(
            f"{base}.weight_v")
    p1, c1, _ = convert_wav2vec2_state_dict(sd, num_heads=4)
    p2, c2, _ = convert_wav2vec2_state_dict(alt, num_heads=4)
    assert c1 == c2
    np.testing.assert_array_equal(np.asarray(p1["pos_conv"]["kernel"]),
                                  np.asarray(p2["pos_conv"]["kernel"]))


def test_wav2vec2_converter_rejects_layout_drift():
    m = _small_hf_model()
    sd = _sd(m)
    sd["encoder.layers.0.attention.rotary.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="unrecognized"):
        convert_wav2vec2_state_dict(sd, num_heads=4)
    with pytest.raises(ValueError, match="not a wav2vec2"):
        infer_config({"foo.weight": np.zeros((2, 2), np.float32)})


def test_wav2vec2_base_defaults_match_reference_config():
    """The Flax module's defaults are wav2vec2-base — the checkpoint the
    reference loads; head count defaults to embed//64 = 12 at base width."""
    enc = Wav2Vec2Encoder()
    assert (enc.embed_dim, enc.num_layers, enc.num_heads, enc.ffn_dim) == \
        (768, 12, 12, 3072)
    assert enc.conv_stride == (5, 2, 2, 2, 2, 2, 2)
    assert enc.pos_conv_kernel == 128 and enc.pos_conv_groups == 16


@pytest.mark.slow
def test_wav2vec2_port_to_diffusion_train_step(tmp_path):
    """The full production path: .pth → port_wav2vec2 → Orbax →
    create_state(wav2vec2_checkpoint=...) graft → one diffusion train step.
    The grafted encoder must actually change the conditioning (vs random
    init) and the step must run finite."""
    from lipreading_video_generation_tpu.core.config import DiffusionConfig
    from lipreading_video_generation_tpu.models.unet_audio import UNetAudio
    from lipreading_video_generation_tpu.pipelines import train_diffusion

    m = _small_hf_model(ctc=True)
    pth = str(tmp_path / "w2v.pth")
    torch.save(m.state_dict(), pth)
    art = str(tmp_path / "w2v_orbax")
    ports.port_wav2vec2(pth, art, num_heads=4)
    _, w2v_cfg = ports.load_wav2vec2_params(art)

    cfg = ports.diffusion_cfg_with_wav2vec2(
        DiffusionConfig(im_size=16, base_channels=32, channel_mult=(1, 2),
                        num_res_blocks=1, attention_resolutions=(2,),
                        num_heads=2, time_embed_dim=64, audio_proj_dim=16,
                        im_cond_channels=8, audio_samples=1600,
                        num_timesteps=10, dtype="float32"),
        w2v_cfg)
    key = jax.random.key(0)
    state = train_diffusion.create_state(cfg, key, wav2vec2_checkpoint=art)
    state_rand = train_diffusion.create_state(cfg, key)

    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((2, 1600)).astype(np.float32))
    img = jnp.zeros((2, 16, 16, 3))
    unet = UNetAudio(cfg)
    c_port = unet.apply({"params": state.params}, wave, img,
                        method=UNetAudio.encode_condition)
    c_rand = unet.apply({"params": state_rand.params}, wave, img,
                        method=UNetAudio.encode_condition)
    assert not np.allclose(np.asarray(c_port), np.asarray(c_rand))

    batch = {
        "cond_frame": jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3),
                                               dtype=np.uint8)),
        "target_frame": jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3),
                                                 dtype=np.uint8)),
        "audio": wave,
    }
    state2, metrics = train_diffusion.train_step(state, batch, key, cfg)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_graft_rejects_mismatched_encoder():
    """Grafting into a native-encoder state must fail loudly (shape/key
    mismatch), not silently produce a broken tree."""
    from lipreading_video_generation_tpu.core.config import DiffusionConfig
    from lipreading_video_generation_tpu.pipelines import train_diffusion

    cfg = DiffusionConfig(im_size=16, base_channels=32, channel_mult=(1, 2),
                          num_res_blocks=1, attention_resolutions=(2,),
                          num_heads=2, time_embed_dim=64, audio_embed_dim=64,
                          audio_proj_dim=16, im_cond_channels=8,
                          audio_samples=1600, num_timesteps=10,
                          dtype="float32")
    state = train_diffusion.create_state(cfg, jax.random.key(0))
    with pytest.raises(ValueError):
        ports.graft_wav2vec2_into_diffusion(
            dict(state.params), {"conv_0": {"kernel": np.zeros((10, 1, 24))}})

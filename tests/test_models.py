"""Shape/dtype tests for every model family (SURVEY.md §4 plan item (b))."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import DiffusionConfig, ViViTConfig
from lipreading_video_generation_tpu import models as M

KEY = jax.random.key(0)


def test_vivit_forward():
    cfg = ViViTConfig(num_classes=10, num_layers=2, dtype="float32")
    model = M.ViViT(cfg)
    clips = jnp.zeros((2, 5, 32, 32, 1))
    params = model.init(KEY, clips)["params"]
    logits = model.apply({"params": params}, clips)
    assert logits.shape == (2, 10)
    assert logits.dtype == jnp.float32


def test_vivit_token_count():
    # tubelet (1,8,8) on (5,32,32) → 5*4*4 = 80 tokens
    cfg = ViViTConfig(num_classes=4, num_layers=1, dtype="float32")
    model = M.ViViT(cfg)
    params = model.init(KEY, jnp.zeros((1, 5, 32, 32, 1)))["params"]
    assert params["pos_embedding"].shape == (1, 80, 256)


def test_feature_transformer():
    model = M.FeatureTransformer(num_classes=7)
    feats = jnp.zeros((3, 5, 1024))
    params = model.init(KEY, feats)["params"]
    out = model.apply({"params": params}, feats)
    assert out.shape == (3, 7)


@pytest.mark.slow
def test_generator_forward_windowed():
    model = M.TalkingFaceGenerator(width=0.125)
    mel = jnp.zeros((2, 5, 80, 16, 1))
    faces = jnp.zeros((2, 5, 96, 96, 6))
    params = model.init(KEY, mel, faces)["params"]
    out = model.apply({"params": params}, mel, faces)
    assert out.shape == (2, 5, 96, 96, 3)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()  # sigmoid output


def test_generator_forward_flat():
    model = M.TalkingFaceGenerator(width=0.125)
    mel = jnp.zeros((3, 80, 16, 1))
    faces = jnp.zeros((3, 96, 96, 6))
    params = model.init(KEY, mel, faces)["params"]
    out = model.apply({"params": params}, mel, faces)
    assert out.shape == (3, 96, 96, 3)


def test_discriminator_forward():
    model = M.Discriminator(width=0.125)
    faces = jnp.zeros((2, 5, 96, 96, 3))
    params = model.init(KEY, faces)["params"]
    out = model.apply({"params": params}, faces)
    assert out.shape == (10, 1)  # T folded into batch
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()


@pytest.mark.slow
def test_syncnet_embeddings():
    model = M.SyncNet(width=0.125)
    mel = jax.random.normal(KEY, (2, 80, 16, 1))
    faces = jax.random.uniform(KEY, (2, 48, 96, 15))
    params = model.init(KEY, mel, faces)["params"]
    a, f = model.apply({"params": params}, mel, faces)
    assert a.shape == (2, 64) and f.shape == (2, 64)  # 512·width
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f), axis=1), 1.0, rtol=1e-4)


def test_stack_window_lower_half():
    w = jnp.arange(2 * 5 * 96 * 96 * 3, dtype=jnp.float32).reshape(2, 5, 96, 96, 3)
    out = M.stack_window_lower_half(w)
    assert out.shape == (2, 48, 96, 15)
    # frame t, channel c of output == window[:, t, 48:, :, c]
    np.testing.assert_array_equal(np.asarray(out[..., 3 * 2 + 1]), np.asarray(w[:, 2, 48:, :, 1]))


def test_unet_small():
    model = M.UNetModel(
        out_channels=3, base_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), num_heads=2, time_embed_dim=64, dtype=jnp.float32,
        remat=False,
    )
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.asarray([0, 5])
    params = model.init(KEY, x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (2, 16, 16, 3)


def test_unet_zero_init_output():
    model = M.UNetModel(out_channels=3, base_channels=32, channel_mult=(1,),
                        num_res_blocks=1, attention_resolutions=(), num_heads=2,
                        time_embed_dim=64, remat=False)
    x = jax.random.normal(KEY, (1, 8, 8, 3))
    params = model.init(KEY, x, jnp.asarray([0]))["params"]
    out = model.apply({"params": params}, x, jnp.asarray([0]))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init final conv


def _tiny_diff_cfg():
    return DiffusionConfig(
        im_size=16, base_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), num_heads=2, time_embed_dim=64,
        audio_embed_dim=64, audio_proj_dim=16, im_cond_channels=8,
        audio_samples=800, dtype="float32",
    )


def test_unet_audio_conditioning():
    cfg = _tiny_diff_cfg()
    model = M.UNetAudio(cfg)
    xt = jnp.zeros((2, 16, 16, 3))
    cond_img = jnp.zeros((2, 20, 20, 3))
    wave = jnp.zeros((2, 800))
    t = jnp.asarray([1, 2])
    variables = model.init(KEY, xt, cond_img, wave, t)
    out = model.apply(variables, xt, cond_img, wave, t)
    assert out.shape == (2, 16, 16, 3)
    # split path: encode once, denoise twice — same result as joint call
    cond = model.apply(variables, wave, cond_img, method=M.UNetAudio.encode_condition)
    assert cond.shape == (2, 16, 16, 16 + 8)
    out2 = model.apply(variables, xt, cond, t, method=M.UNetAudio.denoise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_audio_feature_encoder():
    enc = M.AudioFeatureEncoder(embed_dim=64, num_layers=1, num_heads=4)
    wave = jnp.zeros((2, 1600))
    params = enc.init(KEY, wave)["params"]
    out = enc.apply({"params": params}, wave)
    assert out.shape[0] == 2 and out.shape[-1] == 64


def test_s3fd_head_shapes():
    model = M.S3FD()
    x = jnp.zeros((1, 256, 256, 3))
    params = model.init(KEY, x)["params"]
    outs = model.apply({"params": params}, x)
    assert len(outs) == 12
    assert outs[0].shape == (1, 64, 64, 2)   # stride 4, max-out applied
    assert outs[1].shape == (1, 64, 64, 4)
    assert outs[10].shape[-1] == 2 and outs[11].shape[-1] == 4


@pytest.mark.slow
def test_densenet_feature_dim():
    model = M.DenseNet121()
    x = jnp.zeros((2, 48, 48, 3))
    variables = model.init(KEY, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 1024)


def test_conformer_lip_encoder():
    enc = M.ConformerLipEncoder(embed_dim=64, num_layers=1, num_heads=4)
    video = jnp.zeros((2, 5, 88, 88, 1))
    params = enc.init(KEY, video)["params"]
    out = enc.apply({"params": params}, video)
    assert out.shape == (2, 5, 64)


def test_avhubert_video_transform():
    frames = jnp.full((1, 3, 96, 96, 3), 128, dtype=jnp.uint8)
    out = M.avhubert_video_transform(frames)
    assert out.shape == (1, 3, 88, 88, 1)
    # gray(128)/255 ≈ 0.502 → (0.502-0.421)/0.165 ≈ 0.49
    np.testing.assert_allclose(np.asarray(out).mean(), 0.49, atol=0.02)


def test_encoder_unet_head():
    model = M.EncoderUNetModel(num_out=5, base_channels=32, channel_mult=(1, 2),
                               num_res_blocks=1, attention_resolutions=(2,),
                               num_heads=2, time_embed_dim=64)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.asarray([0, 3])
    params = model.init(KEY, x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (2, 5)


def test_super_res_model():
    unet = M.UNetModel(out_channels=3, base_channels=32, channel_mult=(1, 2),
                       num_res_blocks=1, attention_resolutions=(), num_heads=2,
                       time_embed_dim=64, remat=False)
    model = M.SuperResModel(unet)
    x = jnp.zeros((1, 16, 16, 3))
    low = jnp.zeros((1, 8, 8, 3))
    t = jnp.asarray([1])
    params = model.init(KEY, x, low, t)["params"]
    out = model.apply({"params": params}, x, low, t)
    assert out.shape == (1, 16, 16, 3)

"""EncoderUNetModel classifier-guidance chain (VERDICT r3 #7): train the
noisy-image classifier, then verify its gradient actually steers the
reverse-diffusion trajectory toward the requested class."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import (
    ClassifierConfig,
    DiffusionConfig,
)
from lipreading_video_generation_tpu.pipelines import (
    sample_diffusion,
    train_classifier,
    train_diffusion,
)

DCFG = DiffusionConfig(
    im_size=16, base_channels=8, channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(2,), num_heads=2, time_embed_dim=16,
    audio_embed_dim=16, audio_proj_dim=4, im_cond_channels=4,
    audio_samples=800, num_timesteps=10, dtype="float32",
)
CCFG = ClassifierConfig(
    num_classes=4, base_channels=8, channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(2,), num_heads=2, time_embed_dim=16,
    batch_size=32, dtype="float32",
)


def _train_clf(steps=120):
    rng = np.random.default_rng(0)
    return train_classifier.train(
        CCFG, DCFG, lambda: train_classifier.synthetic_batch(rng, CCFG, DCFG),
        num_steps=steps, key=jax.random.key(0), log_every=0)


@pytest.fixture(scope="module")
def clf_state():
    return _train_clf()


def test_classifier_learns_noisy_quadrants(clf_state):
    """CE on q-sampled noisy images reaches well above chance (0.25)."""
    rng = np.random.default_rng(1)
    batch = train_classifier.synthetic_batch(rng, CCFG, DCFG)
    # evaluate at moderate noise (t = T//3)
    from lipreading_video_generation_tpu.models.schedulers import make_scheduler
    from lipreading_video_generation_tpu.ops import image as image_ops

    sch = make_scheduler(DCFG.scheduler, DCFG.num_timesteps,
                         DCFG.beta_start, DCFG.beta_end)
    x0 = image_ops.normalize_uint8(jnp.asarray(batch["image"]), symmetric=True)
    t = jnp.full((x0.shape[0],), DCFG.num_timesteps // 3, jnp.int32)
    xt = sch.add_noise(x0, jax.random.normal(jax.random.key(2), x0.shape), t)
    logits = train_classifier.make_classifier(CCFG).apply(
        {"params": clf_state.params}, xt, t)
    acc = float((jnp.argmax(logits, -1) == jnp.asarray(batch["label"])).mean())
    assert acc > 0.6, acc


@pytest.mark.parametrize("sampler_kw", [
    {},                                              # full DDPM chain
    {"num_inference_steps": 5},                      # DDIM few-step
    {"num_inference_steps": 5, "sampler": "dpmpp"},  # DPM-Solver++(2M)
])
def test_guidance_steers_all_samplers(clf_state, sampler_kw):
    """Guided sampling scores strictly higher under the classifier than
    unguided from the same seed, for every sampler family."""
    dstate = train_diffusion.create_state(DCFG, jax.random.key(3))
    rng = np.random.default_rng(4)
    cond = jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8))
    audio = jnp.asarray(rng.standard_normal((2, 800)).astype(np.float32))
    y = 2
    x_plain, _ = sample_diffusion.sample(
        dstate, cond, audio, jax.random.key(5), DCFG, **sampler_kw)
    x_guided, _ = sample_diffusion.sample(
        dstate, cond, audio, jax.random.key(5), DCFG,
        classifier_cfg=CCFG, classifier_params=clf_state.params,
        class_label=y, guidance_scale=10.0, **sampler_kw)

    def logp(x01):
        xs = x01 * 2.0 - 1.0                 # sample() returns [0,1]
        logits = train_classifier.make_classifier(CCFG).apply(
            {"params": clf_state.params}, xs,
            jnp.zeros((xs.shape[0],), jnp.int32))
        return jax.nn.log_softmax(logits, -1)[:, y]

    lp_plain = np.asarray(logp(x_plain))
    lp_guided = np.asarray(logp(x_guided))
    assert np.all(lp_guided > lp_plain), (lp_plain, lp_guided)


def test_guidance_targets_differ(clf_state):
    """Different labels pull the same-seed trajectory toward different
    classes: each guided sample scores higher on ITS OWN target than the
    sample guided toward the other label does."""
    dstate = train_diffusion.create_state(DCFG, jax.random.key(3))
    rng = np.random.default_rng(6)
    cond = jnp.asarray(rng.integers(0, 256, (1, 16, 16, 3), dtype=np.uint8))
    audio = jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32))
    lsm = {}
    for y in (0, 3):
        x, _ = sample_diffusion.sample(
            dstate, cond, audio, jax.random.key(7), DCFG,
            classifier_cfg=CCFG, classifier_params=clf_state.params,
            class_label=y, guidance_scale=10.0)
        logits = train_classifier.make_classifier(CCFG).apply(
            {"params": clf_state.params}, x * 2.0 - 1.0,
            jnp.zeros((1,), jnp.int32))
        lsm[y] = np.asarray(jax.nn.log_softmax(logits, -1)[0])
    assert lsm[0][0] > lsm[3][0], (lsm[0], lsm[3])   # to-0 sample beats to-3 on class 0
    assert lsm[3][3] > lsm[0][3], (lsm[0], lsm[3])   # and vice versa


def test_classifier_checkpoint_roundtrip(tmp_path, clf_state):
    train_classifier.save_classifier(str(tmp_path / "clf"), clf_state)
    loaded = train_classifier.load_classifier_params(
        str(tmp_path / "clf"), CCFG, DCFG)
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(clf_state.params)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_guidance_arg_validation(clf_state):
    dstate = train_diffusion.create_state(DCFG, jax.random.key(3))
    cond = jnp.zeros((1, 16, 16, 3), jnp.uint8)
    audio = jnp.zeros((1, 800))
    with pytest.raises(ValueError, match="class_label"):
        sample_diffusion.sample(
            dstate, cond, audio, jax.random.key(0), DCFG,
            classifier_cfg=CCFG, classifier_params=clf_state.params)
    with pytest.raises(ValueError, match="both"):
        sample_diffusion.sample(
            dstate, cond, audio, jax.random.key(0), DCFG, classifier_cfg=CCFG)


def test_sample_video_accepts_guidance(clf_state):
    """The whole-clip path (sample_video) forwards classifier guidance."""
    dstate = train_diffusion.create_state(DCFG, jax.random.key(3))
    rng = np.random.default_rng(8)
    cond = jnp.asarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    windows = jnp.asarray(rng.standard_normal((2, 800)).astype(np.float32))
    clip = sample_diffusion.sample_video(
        dstate, cond, windows, jax.random.key(9), DCFG,
        num_inference_steps=4,
        classifier_cfg=CCFG, classifier_params=clf_state.params,
        class_label=1, guidance_scale=5.0)
    assert clip.shape == (2, 16, 16, 3) and clip.dtype == np.uint8

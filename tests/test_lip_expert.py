"""Text-conditioned lipreading expert: tokenizer, seq2seq CE criterion,
trainability, and the GAN --lipreading integration
(reference: gan-model/train_lipreading.py:130-133, avhubert_utils.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import GanConfig
from lipreading_video_generation_tpu.data import datasets
from lipreading_video_generation_tpu.models import lip_expert as le
from lipreading_video_generation_tpu.pipelines import train_gan, train_lip_expert

KEY = jax.random.key(0)


def test_transcript_roundtrip():
    t = le.encode_transcript("Hello World", max_len=16)
    assert t.shape == (16,) and t.dtype == np.int32
    assert le.decode_tokens(t) == "hello world"
    # PAD fills the tail
    assert (t[11:] == le.PAD_ID).all()
    # unknown chars dropped
    assert le.decode_tokens(le.encode_transcript("a+b=c!", 8)) == "abc"


@pytest.mark.slow
def test_seq2seq_expert_loss_finite_and_differentiable():
    model = train_lip_expert.default_expert(max_text_len=12)
    video = jnp.zeros((2, 5, 88, 88, 1))
    tokens = jnp.asarray(np.stack([le.encode_transcript("hi", 12)] * 2))
    params = model.init(KEY, video, jnp.zeros((2, 12), jnp.int32))["params"]
    rgb = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 5, 96, 96, 3)).astype(np.float32))

    def loss_of(v):
        return le.seq2seq_expert_loss(model, params, v, tokens)

    loss, grad = jax.value_and_grad(loss_of)(rgb)
    assert np.isfinite(float(loss))
    # gradient flows into the video (i.e. would reach the generator)
    assert float(jnp.abs(grad).max()) > 0


@pytest.mark.slow
def test_expert_training_learns_text_and_rejects_wrong_text():
    """Train briefly to overfit one (window, transcript) pair; CE on the
    true transcript must end up below CE on a wrong transcript — the loss
    responds to text targets (VERDICT criterion)."""
    state = train_lip_expert.create_state(KEY, syncnet_T=5, learning_rate=3e-3,
                                          max_text_len=12)
    rng = np.random.default_rng(0)
    window = rng.integers(0, 256, (2, 5, 96, 96, 3), dtype=np.uint8)
    true_tokens = np.stack([le.encode_transcript("hello", 12)] * 2)
    batch = {"window": jnp.asarray(window), "text_tokens": jnp.asarray(true_tokens)}
    for _ in range(40):
        state, m = train_lip_expert.train_step(state, batch, KEY)
    assert np.isfinite(float(m["loss"]))
    model = train_lip_expert.default_expert(max_text_len=12)
    video = jnp.asarray(window.astype(np.float32))
    loss_true = float(le.seq2seq_expert_loss(model, state.params, video,
                                             jnp.asarray(true_tokens)))
    wrong_tokens = np.stack([le.encode_transcript("zzzzz", 12)] * 2)
    loss_wrong = float(le.seq2seq_expert_loss(model, state.params, video,
                                              jnp.asarray(wrong_tokens)))
    assert loss_true < loss_wrong


@pytest.mark.slow
def test_gan_train_step_consumes_transcripts():
    """gan_train_step with text_tokens in the batch runs the text-
    conditioned criterion (train_lipreading.py:130-133 role)."""
    cfg = GanConfig(model_width=0.125, lip_weight=0.1, dtype="float32")
    state = train_gan.create_state(cfg, KEY)
    clips = datasets.synthetic_gan_clips(n_clips=2, frames=20, with_text=True)
    sampler = datasets.GanWindowSampler(clips, seed=0, with_text=True)
    batch = {k: jnp.asarray(v) for k, v in sampler.sample_batch(2).items()}
    assert "text_tokens" in batch
    state, metrics = train_gan.gan_train_step(state, batch, KEY, cfg)
    assert np.isfinite(float(metrics["loss/lip"]))
    assert float(metrics["loss/lip"]) > 0.0  # CE of an untrained expert

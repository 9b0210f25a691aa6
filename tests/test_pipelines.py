"""Pipeline smoke tests: single-step training convergence + sampler
determinism (SURVEY.md §4 items (c), (d)) at tiny model sizes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import (
    AudioConfig,
    DiffusionConfig,
    GanConfig,
    ViViTConfig,
)
from lipreading_video_generation_tpu.data import datasets
from lipreading_video_generation_tpu.pipelines import (
    losses,
    sample_diffusion,
    train_diffusion,
    train_gan,
    train_syncnet,
    train_vivit,
)

KEY = jax.random.key(0)

TINY_GAN = GanConfig(model_width=0.125, batch_size=2)
TINY_DIFF = DiffusionConfig(
    im_size=16, base_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(2,), num_heads=2, time_embed_dim=64,
    audio_embed_dim=64, audio_proj_dim=16, im_cond_channels=8,
    audio_samples=800, num_timesteps=10, dtype="float32",
)


# --- losses ----------------------------------------------------------------

def test_bce_matches_formula():
    p = jnp.asarray([0.9, 0.1])
    y = jnp.asarray([1.0, 0.0])
    want = -np.mean([np.log(0.9), np.log(0.9)])
    np.testing.assert_allclose(float(losses.bce(p, y)), want, rtol=1e-5)


def test_generator_loss_weighting():
    total, m = losses.generator_loss(
        l1_recon=jnp.asarray(1.0), sync=jnp.asarray(2.0), perceptual=jnp.asarray(3.0),
        lip=jnp.asarray(0.0), syncnet_wt=jnp.asarray(0.03), disc_wt=0.07, lip_weight=0.0,
    )
    np.testing.assert_allclose(float(total), 0.03 * 2 + 0.07 * 3 + 0.9 * 1, rtol=1e-6)


def test_cosine_sync_loss_perfect_alignment():
    e = jnp.ones((4, 8)) / np.sqrt(8)
    assert float(losses.cosine_bce_sync_loss(e, e)) < 1e-5
    assert float(losses.cosine_bce_sync_loss(e, -e)) > 5.0


def test_cosine_sync_loss_matches_torch_bce():
    """Pin the loss numerics against the reference's exact torch formula
    BCELoss()(cosine_similarity(a, v), ones) — train_lipreading.py:70-89.
    Post-ReLU embeddings ⇒ sim ∈ [0, 1] ⇒ BCE(sim, 1) = −log(sim)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    a = np.abs(rng.normal(size=(6, 16))).astype(np.float32)  # post-ReLU-like
    v = np.abs(rng.normal(size=(6, 16))).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    d = torch.nn.functional.cosine_similarity(torch.tensor(a), torch.tensor(v))
    want = torch.nn.BCELoss()(d.unsqueeze(1), torch.ones(6, 1)).item()
    got = float(losses.cosine_bce_sync_loss(jnp.asarray(a), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # contrastive variant against BCE with mixed labels
    y = np.asarray([1, 0, 1, 0, 1, 0], np.float32)
    want_c = torch.nn.BCELoss()(d, torch.tensor(y)).item()
    got_c = float(losses.syncnet_contrastive_loss(jnp.asarray(a), jnp.asarray(v), jnp.asarray(y)))
    np.testing.assert_allclose(got_c, want_c, rtol=1e-5)


def test_psnr_identical_images():
    a = jnp.ones((2, 4, 4, 3)) * 0.5
    assert float(losses.psnr(a, a)) > 100


def test_ssim_matches_direct_windowed_formula():
    """losses.ssim (separable-conv moments) vs a literal sliding-window
    numpy evaluation of Wang et al. 2004."""
    rng = np.random.default_rng(0)
    a = rng.random((1, 16, 16, 1)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)

    r = np.arange(11) - 5.0
    w1 = np.exp(-(r**2) / (2 * 1.5**2))
    w1 /= w1.sum()
    w2 = np.outer(w1, w1)
    c1, c2 = 0.01**2, 0.03**2
    vals = []
    for i in range(16 - 10):
        for j in range(16 - 10):
            pa = a[0, i:i + 11, j:j + 11, 0]
            pb = b[0, i:i + 11, j:j + 11, 0]
            mu_a, mu_b = (w2 * pa).sum(), (w2 * pb).sum()
            va = (w2 * pa * pa).sum() - mu_a**2
            vb = (w2 * pb * pb).sum() - mu_b**2
            cov = (w2 * pa * pb).sum() - mu_a * mu_b
            vals.append(((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2)))
    want = np.mean(vals)
    got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssim_bounds_and_ordering():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.random((2, 3, 24, 24, 3)).astype(np.float32))  # video-shaped
    assert float(losses.ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    small = a + 0.02 * jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
    big = a + 0.3 * jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
    assert float(losses.ssim(a, big)) < float(losses.ssim(a, small)) < 1.0


# --- ViViT training --------------------------------------------------------

def _vivit_cfg(n=4):
    return ViViTConfig(num_classes=n, hidden_size=64, num_layers=2, num_heads=4,
                       mlp_dim=128, dtype="float32")


def test_vivit_train_step_reduces_loss():
    cfg = _vivit_cfg()
    state = train_vivit.create_state(cfg, KEY)
    clips, labels = datasets.synthetic_word_clips(n=32, num_classes=4, seed=0)
    s = datasets.WordClipSampler(clips, labels, max_frames=5)
    batch = next(s.batches(32, shuffle=False))
    first_loss = None
    for i in range(55):
        state, metrics = train_vivit.train_step(state, batch, KEY)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    # brightness-separable labels: loss must drop decisively
    assert float(metrics["loss"]) < first_loss * 0.5
    assert float(metrics["accuracy"]) > 0.5


def test_vivit_eval_and_predict():
    cfg = _vivit_cfg()
    state = train_vivit.create_state(cfg, KEY)
    clips, labels = datasets.synthetic_word_clips(n=16, num_classes=4)
    s = datasets.WordClipSampler(clips, labels, max_frames=5)
    stats = train_vivit.evaluate(state, s.batches(8, shuffle=False))
    assert 0 <= stats["accuracy"] <= 1
    batch = next(s.batches(8))
    logp = train_vivit.predict_step(state, jnp.asarray(batch["clips"]))
    assert logp.shape == (8, 4)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4)


# --- GAN training ----------------------------------------------------------

def _gan_batch(b=2):
    clips = datasets.synthetic_gan_clips(n_clips=2, frames=25)
    return datasets.GanWindowSampler(clips, seed=0).sample_batch(b)


def test_gan_prepare_batch_shapes():
    batch = {k: jnp.asarray(v) for k, v in _gan_batch().items()}
    prep = train_gan.prepare_batch(batch, TINY_GAN, AudioConfig())
    assert prep["x"].shape == (2, 5, 96, 96, 6)
    assert prep["gt"].shape == (2, 5, 96, 96, 3)
    assert prep["mel"].shape == (2, 80, 16, 1)
    assert prep["indiv_mels"].shape == (2, 5, 80, 16, 1)
    # masked half of x must be zero; reference half must not
    x = np.asarray(prep["x"])
    assert np.abs(x[..., 48:, :, :3]).max() == 0
    assert np.abs(x[..., 48:, :, 3:]).max() > 0


def test_gan_indiv_mels_offset_semantics():
    """indiv_mels[i] must be the mel window at frame start+i−1 (clamped):
    get_segmented_mels (dataset.py:81-94) 1-indexes (frame_id+1) then crops
    at i−2, so the effective offset is −1; start_idx = int(80·frame/fps)."""
    batch = {k: jnp.asarray(v) for k, v in _gan_batch().items()}
    prep = train_gan.prepare_batch(batch, TINY_GAN, AudioConfig())
    mel_full = np.asarray(
        __import__("lipreading_video_generation_tpu.ops.audio", fromlist=["melspectrogram"])
        .melspectrogram(batch["wav"], AudioConfig())
    )
    start = int(np.asarray(batch["start_frame"])[0])
    t_mel = mel_full.shape[-1]
    for i in range(TINY_GAN.syncnet_T):
        frame = max(0, start + i - 1)
        s = int(80.0 * frame / 25.0)
        s = min(max(s, 0), t_mel - 16)
        want = mel_full[0][:, s : s + 16]
        got = np.asarray(prep["indiv_mels"][0, i, :, :, 0])
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=f"window {i}")


@pytest.mark.slow
def test_gan_train_step_runs_and_updates():
    state = train_gan.create_state(TINY_GAN, KEY)
    batch = {k: jnp.asarray(v) for k, v in _gan_batch().items()}
    before = jax.tree_util.tree_leaves(state.gen_params)[0].copy()
    state, metrics = train_gan.gan_train_step(state, batch, KEY, TINY_GAN)
    assert int(state.step) == 1
    for k in ("loss/g_total", "loss/l1", "loss/sync", "loss/perceptual",
              "loss/d_real", "loss/d_fake"):
        assert np.isfinite(float(metrics[k])), k
    after = jax.tree_util.tree_leaves(state.gen_params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_gan_sync_gate():
    state = train_gan.create_state(TINY_GAN, KEY)
    assert float(state.syncnet_wt) == 0.0
    state2 = train_gan.maybe_open_sync_gate(state, eval_sync_loss=0.5, cfg=TINY_GAN)
    assert float(state2.syncnet_wt) == pytest.approx(0.03)
    # idempotent + no flip above threshold
    state3 = train_gan.maybe_open_sync_gate(state, eval_sync_loss=0.9, cfg=TINY_GAN)
    assert float(state3.syncnet_wt) == 0.0


def test_gan_eval_step_metrics():
    state = train_gan.create_state(TINY_GAN, KEY)
    batch = {k: jnp.asarray(v) for k, v in _gan_batch().items()}
    m = train_gan.gan_eval_step(state, batch, TINY_GAN)
    assert set(m) == {"eval/sync_loss", "eval/l1", "eval/psnr", "eval/ssim"}
    assert np.isfinite(float(m["eval/psnr"]))


def test_syncnet_train_step():
    state = train_syncnet.create_state(TINY_GAN, KEY)
    batch = {k: jnp.asarray(v) for k, v in _gan_batch().items()}
    state, metrics = train_syncnet.train_step(state, batch, KEY, TINY_GAN)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_gan_train_loop_gate_and_checkpoint(tmp_path):
    """train() loop: eval interval fires, gate flips when sync loss is low,
    checkpoints are written and resumable."""
    cfg = GanConfig(model_width=0.125, batch_size=2, eval_interval=2,
                    checkpoint_interval=2, syncnet_gate_threshold=1e9,  # force flip
                    dtype="float32")
    clips = datasets.synthetic_gan_clips(n_clips=2, frames=20)
    sampler = datasets.GanWindowSampler(clips, seed=0)
    ckdir = str(tmp_path / "gan_ck")
    state = train_gan.train(cfg, lambda: sampler.sample_batch(2),
                            eval_batch_fn=lambda: sampler.sample_batch(2),
                            num_steps=3, checkpoint_dir=ckdir)
    assert float(state.syncnet_wt) == pytest.approx(0.03)  # gate opened
    # resume picks up from the saved step
    state2 = train_gan.train(cfg, lambda: sampler.sample_batch(2),
                             num_steps=4, checkpoint_dir=ckdir)
    assert int(state2.step) == 4
    assert float(state2.syncnet_wt) == pytest.approx(0.03)  # gate persisted
    # full fidelity: the checkpoint at step 4 (ckdir now holds it) carries
    # BOTH Adam states; restoring must reproduce state2's moments exactly
    from lipreading_video_generation_tpu.core.checkpoint import CheckpointManager

    fresh = train_gan.create_state(cfg, KEY)
    restored = train_gan.restore_state(
        fresh, CheckpointManager(ckdir).restore(train_gan.checkpoint_tree(fresh)))
    assert int(restored.step) == 4
    for got, want in zip(jax.tree_util.tree_leaves(restored.gen_opt),
                         jax.tree_util.tree_leaves(state2.gen_opt)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(jax.tree_util.tree_leaves(restored.disc_opt),
                         jax.tree_util.tree_leaves(state2.disc_opt)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # the moments are real (nonzero) after 4 steps — the assertion above
    # would be vacuous against a reset optimizer otherwise
    mus = [x for x in jax.tree_util.tree_leaves(restored.gen_opt)
           if hasattr(x, "ndim") and x.ndim > 0]
    assert any(np.abs(np.asarray(m)).max() > 0 for m in mus)


@pytest.mark.slow
def test_gan_training_reduces_reconstruction_loss():
    """Short GAN run: L1 reconstruction must drop — training-convergence
    smoke (SURVEY.md §4 item (c))."""
    cfg = GanConfig(model_width=0.125, batch_size=2, dtype="float32")
    state = train_gan.create_state(cfg, KEY)
    batch = {k: jnp.asarray(v) for k, v in _gan_batch().items()}
    first = None
    for _ in range(12):
        state, metrics = train_gan.gan_train_step(state, batch, KEY, cfg)
        if first is None:
            first = float(metrics["loss/l1"])
    assert float(metrics["loss/l1"]) < first


def test_vivit_full_train_loop_on_mesh():
    """End-to-end train() over the 8-device CPU mesh: sharded batches,
    best-accuracy snapshot (huggingface_vivit_model.py:70-95 semantics)."""
    from lipreading_video_generation_tpu.core.config import Config
    from lipreading_video_generation_tpu.core import config as config_mod

    cfg = Config()
    cfg = config_mod.parse_overrides(cfg, [
        "vivit.num_classes=4", "vivit.hidden_size=64", "vivit.num_layers=1",
        "vivit.num_heads=4", "vivit.mlp_dim=64", "vivit.dtype=float32",
        "vivit.batch_size=16",
    ])
    clips, labels = datasets.synthetic_word_clips(n=64, num_classes=4)
    sampler = datasets.WordClipSampler(clips, labels, max_frames=5)
    state, best = train_vivit.train(
        cfg,
        lambda: sampler.batches(16),
        lambda: sampler.batches(16, shuffle=False),
        num_epochs=2,
    )
    assert 0.0 <= best["accuracy"] <= 1.0
    assert int(state.step) == 2 * (64 // 16)


@pytest.mark.slow
def test_gan_train_step_with_lip_expert():
    cfg = GanConfig(model_width=0.125, lip_weight=0.1)
    state = train_gan.create_state(cfg, KEY)
    assert state.lip_expert_params is not None
    batch = {k: jnp.asarray(v) for k, v in _gan_batch().items()}
    state, metrics = train_gan.gan_train_step(state, batch, KEY, cfg)
    assert np.isfinite(float(metrics["loss/lip"]))
    assert float(metrics["loss/lip"]) >= 0.0


# --- diffusion -------------------------------------------------------------

def _diff_batch(b=2, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return {
        "cond_frame": jnp.asarray(rng.integers(0, 256, (b, 20, 20, 3), dtype=np.uint8)),
        "target_frame": jnp.asarray(rng.integers(0, 256, (b, 20, 20, 3), dtype=np.uint8)),
        "audio": jnp.asarray(rng.standard_normal((b, 800)).astype(np.float32)),
    }


@pytest.mark.slow
def test_diffusion_train_step():
    state = train_diffusion.create_state(TINY_DIFF, KEY)
    state, metrics = train_diffusion.train_step(state, _diff_batch(), KEY, TINY_DIFF)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # t must stay within the schedule (the reference's range bug, train.py:125)
    assert 0 <= float(metrics["t_mean"]) < TINY_DIFF.num_timesteps


def test_diffusion_timestep_range_fix():
    from lipreading_video_generation_tpu.core import prng
    t = prng.uniform_timesteps(KEY, 1000, 10)
    assert int(t.min()) >= 0 and int(t.max()) <= 9


def test_sampler_deterministic_under_fixed_key():
    state = train_diffusion.create_state(TINY_DIFF, KEY)
    b = _diff_batch()
    x1, snaps1 = sample_diffusion.sample(state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
                                         snapshot_every=5)
    x2, snaps2 = sample_diffusion.sample(state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
                                         snapshot_every=5)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert snaps1.shape[0] == 2  # 10 steps, every 5
    assert np.asarray(x1).min() >= 0 and np.asarray(x1).max() <= 1


@pytest.mark.slow
def test_diffusion_train_loop_checkpoint_resume(tmp_path):
    """train() → checkpoint → fresh train() resumes from the saved step."""
    rng = np.random.default_rng(0)

    def batch_fn():
        return {
            "cond_frame": rng.integers(0, 256, (2, 20, 20, 3), dtype=np.uint8),
            "target_frame": rng.integers(0, 256, (2, 20, 20, 3), dtype=np.uint8),
            "audio": rng.standard_normal((2, 800)).astype(np.float32),
        }

    ckdir = str(tmp_path / "ck")
    s1 = train_diffusion.train(TINY_DIFF, batch_fn, num_steps=2, checkpoint_dir=ckdir,
                               checkpoint_every=2)
    assert int(s1.step) == 2
    # full fidelity: the step-2 checkpoint carries EMA + Adam moments; a
    # restore must reproduce s1's (s1 ended exactly at the checkpoint)
    from lipreading_video_generation_tpu.core.checkpoint import CheckpointManager

    fresh = train_diffusion.create_state(TINY_DIFF, KEY)
    restored = train_diffusion.restore_state(
        fresh, CheckpointManager(ckdir).restore(train_diffusion.checkpoint_tree(fresh)))
    assert int(restored.step) == 2
    for got, want in zip(jax.tree_util.tree_leaves(restored.ema_params),
                         jax.tree_util.tree_leaves(s1.ema_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(jax.tree_util.tree_leaves(restored.opt_state),
                         jax.tree_util.tree_leaves(s1.opt_state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # EMA shadow must differ from params (it trails them), and moments are live
    e0 = jax.tree_util.tree_leaves(restored.ema_params)[0]
    p0 = jax.tree_util.tree_leaves(restored.params)[0]
    assert not np.allclose(np.asarray(e0), np.asarray(p0))
    mus = [x for x in jax.tree_util.tree_leaves(restored.opt_state)
           if hasattr(x, "ndim") and x.ndim > 0]
    assert any(np.abs(np.asarray(m)).max() > 0 for m in mus)

    s2 = train_diffusion.train(TINY_DIFF, batch_fn, num_steps=3, checkpoint_dir=ckdir,
                               checkpoint_every=2)
    assert int(s2.step) == 3  # resumed at 2, ran 1 more
    # restored params actually came from the checkpoint
    w1 = jax.tree_util.tree_leaves(s1.params)[0]
    w2 = jax.tree_util.tree_leaves(s2.params)[0]
    assert w1.shape == w2.shape


@pytest.mark.slow
def test_diffusion_train_loop_eval_cadence():
    """train(eval_batch_fn=...) runs a held-out eval_step every eval_every
    steps and logs eval/loss (VERDICT r2 weak #9: eval_step existed but
    train() never called it)."""
    rng = np.random.default_rng(0)

    def batch_fn():
        return {
            "cond_frame": rng.integers(0, 256, (2, 20, 20, 3), dtype=np.uint8),
            "target_frame": rng.integers(0, 256, (2, 20, 20, 3), dtype=np.uint8),
            "audio": rng.standard_normal((2, 800)).astype(np.float32),
        }

    class Recorder:
        def __init__(self):
            self.rows = []

        def write(self, step, metrics):
            self.rows.append((step, {k: float(np.asarray(v)) for k, v in metrics.items()}))

    rec = Recorder()
    train_diffusion.train(TINY_DIFF, batch_fn, num_steps=4, metrics_writer=rec,
                          eval_batch_fn=batch_fn, eval_every=2,
                          steps_per_dispatch=4)
    eval_rows = [(s, m) for s, m in rec.rows if "eval/loss" in m]
    # evals at steps 2 and 4 (written as step-1 like the GAN loop)
    assert [s for s, _ in eval_rows] == [1, 3]
    assert all(np.isfinite(m["eval/loss"]) for _, m in eval_rows)
    # dispatch chunks were clipped to the eval boundary, not skipped past it
    train_steps = [s for s, m in rec.rows if "loss" in m]
    assert train_steps == [0, 1, 2, 3]


def test_sampler_key_sensitivity():
    state = train_diffusion.create_state(TINY_DIFF, KEY)
    b = _diff_batch()
    x1, _ = sample_diffusion.sample(state, b["cond_frame"], b["audio"], KEY, TINY_DIFF)
    x2, _ = sample_diffusion.sample(state, b["cond_frame"], b["audio"], jax.random.key(1),
                                    TINY_DIFF)
    assert not np.allclose(np.asarray(x1), np.asarray(x2))


def test_sample_video_batched_trajectory():
    """sample_video: (h,w,3) cond + (T,samples) windows → (T,im,im,3) uint8
    clip; different audio windows must give different frames."""
    state = train_diffusion.create_state(TINY_DIFF, KEY)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.integers(0, 256, (20, 20, 3), dtype=np.uint8))
    windows = jnp.asarray(rng.standard_normal((3, 800)).astype(np.float32))
    clip = sample_diffusion.sample_video(state, cond, windows, KEY, TINY_DIFF,
                                         segment_size=5)
    assert clip.shape == (3, 16, 16, 3) and clip.dtype == jnp.uint8
    c = np.asarray(clip)
    assert np.any(c[0] != c[1]) and np.any(c[1] != c[2])


def test_sampler_ddim_few_step():
    """num_inference_steps < num_timesteps: DDIM path — 5 model forwards
    instead of 10, segmented (size 3 exercises the remainder segment),
    output still a valid [0,1] image that differs from the full DDPM chain
    (different trajectory by construction)."""
    state = train_diffusion.create_state(TINY_DIFF, KEY)
    b = _diff_batch()
    x_ddim, snaps = sample_diffusion.sample(
        state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
        snapshot_every=1, segment_size=3, num_inference_steps=5)
    assert snaps.shape[0] == 5  # one x0 preview per inference step
    xn = np.asarray(x_ddim)
    assert xn.min() >= 0 and xn.max() <= 1 and np.isfinite(xn).all()
    x_ddpm, _ = sample_diffusion.sample(
        state, b["cond_frame"], b["audio"], KEY, TINY_DIFF)
    assert not np.allclose(xn, np.asarray(x_ddpm))
    # eta=0 determinism end-to-end: repeat is bit-identical
    x_rep, _ = sample_diffusion.sample(
        state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
        snapshot_every=1, segment_size=3, num_inference_steps=5)
    np.testing.assert_array_equal(xn, np.asarray(x_rep))


def test_sampler_fused_matches_segmented():
    """The single-dispatch fused few-step path (_sample_fused) is a pure
    dispatch-count optimization: its trajectory must match the segmented
    path (same PRNG folds, same scheduler math) for both DDIM and DPM++,
    with and without classifier guidance on the DDIM path."""
    state = train_diffusion.create_state(TINY_DIFF, KEY)
    b = _diff_batch()
    for sampler in ("ddim", "dpmpp"):
        x_f, s_f = sample_diffusion.sample(
            state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
            snapshot_every=1, num_inference_steps=5, sampler=sampler,
            fused=True)
        x_s, s_s = sample_diffusion.sample(
            state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
            snapshot_every=1, segment_size=5, num_inference_steps=5,
            sampler=sampler, fused=False)
        np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_s),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_s),
                                   atol=2e-5)
    # nontrivial eta through the fused DDIM path stays equivalent too
    x_f, _ = sample_diffusion.sample(
        state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
        num_inference_steps=5, eta=1.0, fused=True)
    x_s, _ = sample_diffusion.sample(
        state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
        num_inference_steps=5, eta=1.0, fused=False)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_s), atol=2e-5)


def test_gan_scan_matches_stepwise():
    """gan_train_scan is a pure performance transform: the loss trajectory
    over 3 steps must match 3 direct steps (well-conditioned check; exact
    param equality is ill-posed — near-zero-grad elements take
    sign-of-noise Adam updates under any fusion change), and params must
    agree to within a couple of lr-sized updates."""
    cfg32 = GanConfig(model_width=0.125, batch_size=2, dtype="float32")
    batches = [_gan_batch() for _ in range(3)]

    s1 = train_gan.create_state(cfg32, KEY)
    losses_step = []
    for b in batches:
        s1, m = train_gan.gan_train_step(
            s1, {k: jnp.asarray(v) for k, v in b.items()}, KEY, cfg32)
        losses_step.append([float(m["loss/g_total"]), float(m["loss/d_real"]),
                            float(m["loss/d_fake"])])

    s2 = train_gan.create_state(cfg32, KEY)
    stacked = {k: jnp.asarray(np.stack([b[k] for b in batches])) for k in batches[0]}
    s2, ms = train_gan.gan_train_scan(s2, stacked, KEY, cfg32)
    assert int(s2.step) == 3
    losses_scan = np.stack([np.asarray(ms["loss/g_total"]),
                            np.asarray(ms["loss/d_real"]),
                            np.asarray(ms["loss/d_fake"])], axis=1)
    np.testing.assert_allclose(losses_scan, np.asarray(losses_step), rtol=2e-3)
    for x, y in zip(jax.tree_util.tree_leaves(s1.gen_params),
                    jax.tree_util.tree_leaves(s2.gen_params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=3e-4)


def test_diffusion_scan_matches_stepwise():
    """train_scan must reproduce the stepwise loss trajectory exactly in
    expectation: the per-step PRNG folds the root key with state.step, so
    the same t/noise draws happen inside and outside the scan."""
    rng = np.random.default_rng(0)

    def mk():
        return {
            "cond_frame": rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8),
            "target_frame": rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8),
            "audio": rng.standard_normal((2, 800)).astype(np.float32),
        }

    batches = [mk() for _ in range(3)]
    s1 = train_diffusion.create_state(TINY_DIFF, KEY)
    losses_step = []
    for b in batches:
        s1, m = train_diffusion.train_step(
            s1, {k: jnp.asarray(v) for k, v in b.items()}, KEY, TINY_DIFF)
        losses_step.append(float(m["loss"]))
    s2 = train_diffusion.create_state(TINY_DIFF, KEY)
    stacked = {k: jnp.asarray(np.stack([b[k] for b in batches])) for k in batches[0]}
    s2, ms = train_diffusion.train_scan(s2, stacked, KEY, TINY_DIFF)
    assert int(s2.step) == 3
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses_step, rtol=2e-3)


def test_gan_train_stops_cleanly_on_finite_feed():
    """A finite batch feed (StopIteration from batch_fn) must end training
    at feed exhaustion, not crash mid-chunk."""
    batches = iter([_gan_batch() for _ in range(3)])

    def batch_fn():
        return next(batches)

    cfg = GanConfig(model_width=0.125, batch_size=2, dtype="float32")
    state = train_gan.train(cfg, batch_fn, num_steps=10, steps_per_dispatch=2)
    assert int(state.step) == 3   # 2-step chunk + 1-step tail, then stop


def test_ddim_timesteps_exact_count_and_bounds():
    """The DDIM subsequence honors the requested step count exactly for
    non-divisor N (floor-divided strides would run up to the full chain,
    e.g. T=500 N=300), stays in [0, T), descends, and matches the plain
    integer stride when N divides T."""
    from lipreading_video_generation_tpu.pipelines.sample_diffusion import (
        ddim_timesteps,
    )

    for T, N in [(500, 300), (500, 50), (500, 7), (10, 3), (10, 10), (500, 499)]:
        ts = ddim_timesteps(T, N)
        assert len(ts) == N
        assert len(np.unique(ts)) == N
        assert ts.min() == 0 and ts.max() < T
        assert (np.diff(ts) < 0).all()
    np.testing.assert_array_equal(
        ddim_timesteps(500, 50), np.arange(0, 500, 10)[::-1])


def test_sample_rejects_nonpositive_inference_steps():
    from lipreading_video_generation_tpu.core.config import DiffusionConfig
    from lipreading_video_generation_tpu.pipelines import sample_diffusion

    with pytest.raises(ValueError, match="num_inference_steps"):
        sample_diffusion.sample(
            None, np.zeros((1, 16, 16, 3), np.uint8), np.zeros((1, 800)),
            jax.random.key(0), DiffusionConfig(im_size=16, num_timesteps=10),
            num_inference_steps=0)


def test_sampler_dpmpp_few_step():
    """DPM-Solver++(2M) through the production sample() path: valid [0,1]
    output, deterministic, distinct from DDIM, and — the carry contract —
    segmenting the trajectory must not reset the multistep history
    (segment_size 3 == segment_size 5 bit-for-bit)."""
    state = train_diffusion.create_state(TINY_DIFF, KEY)
    b = _diff_batch()
    x_a, snaps = sample_diffusion.sample(
        state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
        snapshot_every=1, segment_size=3, num_inference_steps=5,
        sampler="dpmpp")
    assert snaps.shape[0] == 5
    xn = np.asarray(x_a)
    assert xn.min() >= 0 and xn.max() <= 1 and np.isfinite(xn).all()
    x_b, _ = sample_diffusion.sample(
        state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
        snapshot_every=1, segment_size=5, num_inference_steps=5,
        sampler="dpmpp")
    np.testing.assert_allclose(xn, np.asarray(x_b), atol=1e-6)
    x_ddim, _ = sample_diffusion.sample(
        state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
        snapshot_every=1, segment_size=3, num_inference_steps=5)
    assert not np.allclose(xn, np.asarray(x_ddim))
    with pytest.raises(ValueError, match="sampler"):
        sample_diffusion.sample(
            state, b["cond_frame"], b["audio"], KEY, TINY_DIFF,
            num_inference_steps=5, sampler="heun")

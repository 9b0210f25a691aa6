"""Expert-chain FUNCTION proofs (VERDICT r2 item 2): the trained sync
expert must *discriminate* (not just emit finite losses), and the GAN gate
must open because eval sync actually improved.

The reference assumes all of this by downloading a pretrained
``lipsync_expert.pth`` (gan-model/train_lipreading.py:342-343) whose eval
loss gates training (:187-192). Since this framework trains its own expert,
these tests pin the chain's function on ``synthetic_av_clips`` — clips
whose mouth aperture is driven by the audio's formant envelope (the
in-environment stand-in for LRS2).

Scale notes (measured on this suite's CPU): the expert only learns in the
width-0.25 / batch-16 regime — at width 0.125 InfoNCE sits at chance
(ln 2B) indefinitely, and with only 6 training clips every objective
plateaus near AUC 0.70 because the audio tower keys on per-clip f0
identity. scripts/prove_expert_chain.py runs the full-scale version
(default 0.75 gate, 2000 GAN steps) on TPU; curves in BENCH_NOTES.md.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import GanConfig
from lipreading_video_generation_tpu.data.datasets import (
    GanWindowSampler,
    synthetic_av_clips,
)
from lipreading_video_generation_tpu.pipelines import train_gan, train_syncnet
from lipreading_video_generation_tpu.pipelines.expert_proof import (
    alignment_scores,
    aperture_envelope_correlation,
    auc,
    train_val_split,
)

WIDTH = 0.25
SYNC_STEPS = 350   # measured held-out AUC ~0.96 here; ~0.90 at 250 (noisy)
SYNC_BATCH = 16


@pytest.fixture(scope="module")
def av_data():
    clips = synthetic_av_clips(n_clips=20, frames=50)
    train_clips, val_clips = train_val_split(clips, 2)
    return train_clips, val_clips


@pytest.fixture(scope="module")
def trained_expert(av_data):
    """One module-scoped expert training run, shared by the chain tests."""
    train_clips, _ = av_data
    cfg = GanConfig(model_width=WIDTH, batch_size=SYNC_BATCH, dtype="float32")
    sampler = GanWindowSampler(train_clips, seed=0)
    state = train_syncnet.train(
        cfg,
        lambda: sampler.sample_batch(SYNC_BATCH),
        num_steps=SYNC_STEPS,
        objective="infonce_hard",
    )
    return state.params


@pytest.mark.slow
def test_trained_syncnet_discriminates(av_data, trained_expert):
    """Aligned-vs-shifted AUC ≥ 0.9 on HELD-OUT clips — the discrimination
    property the reference's pretrained expert is trusted for. An untrained
    expert sits at ~0.5 (verified below) so the bar is meaningful."""
    _, val_clips = av_data
    cfg = GanConfig(model_width=WIDTH, batch_size=SYNC_BATCH, dtype="float32")
    pos, neg = alignment_scores(trained_expert, cfg, val_clips)
    trained_auc = auc(pos, neg)

    untrained = train_syncnet.create_state(cfg, jax.random.key(9)).params
    pos0, neg0 = alignment_scores(untrained, cfg, val_clips)
    untrained_auc = auc(pos0, neg0)

    assert trained_auc >= 0.9, f"trained AUC {trained_auc:.3f}"
    assert untrained_auc < 0.75, f"untrained AUC {untrained_auc:.3f}"


@pytest.mark.slow
def test_gan_gate_opens_because_sync_improved(av_data, trained_expert):
    """Short GAN run against the frozen trained expert: eval sync on
    held-out clips starts ABOVE the gate threshold (a discriminating expert
    scores an untrained generator's mouths as out of sync), decreases with
    training, and the syncnet_wt gate flips 0 → 0.03 only once eval sync
    crosses the threshold (train_lipreading.py:187-192 semantics).

    Gate threshold 0.5, not the reference's default 0.75: this expert maps
    an untrained generator's mouths to -log(cos) ≈ 0.66 (measured on the
    full-scale TPU run, expert_chain_proof_r3.json: sync_first 0.661 →
    0.362 over 2000 steps, crossing 0.5 by step 400), so 0.75 would start
    open. The threshold is a config knob; the reference's 0.75 was tuned
    for ITS pretrained expert's scale on LRS2."""
    train_clips, val_clips = av_data
    gate = GATE_THRESHOLD
    cfg = GanConfig(model_width=WIDTH, batch_size=8, dtype="float32",
                    eval_interval=50, checkpoint_interval=10**9,
                    syncnet_gate_threshold=gate)
    train_sampler = GanWindowSampler(train_clips, seed=0)
    val_sampler = GanWindowSampler(val_clips, seed=1)

    evals = []

    class Rec:
        def write(self, step, m):
            if any(k.startswith("eval/") for k in m):
                evals.append({"step": step,
                              **{k: float(v) for k, v in m.items()}})

    state = train_gan.train(
        cfg, lambda: train_sampler.sample_batch(8),
        eval_batch_fn=lambda: val_sampler.sample_batch(8),
        num_steps=GAN_STEPS, syncnet_params=trained_expert,
        metrics_writer=Rec(), steps_per_dispatch=8)

    assert evals, "no eval rows recorded"
    sync = [r["eval/sync_loss"] for r in evals]
    # the trained expert scores the untrained generator out-of-sync
    assert sync[0] > gate, f"initial eval sync {sync[0]:.3f} <= gate {gate}"
    # training against the expert improves sync on held-out clips
    assert min(sync) < sync[0], f"sync never improved: {sync}"
    # the gate opened iff sync crossed the threshold (reference semantics)
    crossed = min(sync) < gate
    assert (float(state.syncnet_wt) > 0) == crossed, (
        f"gate state {float(state.syncnet_wt)} inconsistent with curve {sync}")
    # held-out reconstruction improved too (disjoint eval clips — this is
    # generalization, not single-batch memorization)
    psnr = [r["eval/psnr"] for r in evals]
    assert psnr[-1] > psnr[0], f"held-out PSNR did not improve: {psnr}"

    # generated mouths track the audio envelope on held-out clips
    def gen_apply(batch):
        return train_gan.generate_step(state, batch, cfg)

    corr = aperture_envelope_correlation(gen_apply, cfg, val_clips,
                                         n_windows=16)
    assert corr["r_ground_truth"] > 0.8  # the synthetic ceiling is real
    assert corr["r_generated"] > APERTURE_R_MIN, corr


# tuned from scripts/prove_expert_chain.py runs (see BENCH_NOTES.md and
# expert_chain_proof_r3.json: sync 0.661→0.362, first below 0.5 by step
# ~400; aperture r_generated 0.951 at step 2000)
GATE_THRESHOLD = 0.5
GAN_STEPS = 400
APERTURE_R_MIN = 0.3


def test_window_batch_skips_short_clips():
    """Ragged real datasets: clips without shift headroom are skipped; an
    all-short eval set raises a clear error instead of numpy's low>=high."""
    import pytest

    from lipreading_video_generation_tpu.data.datasets import GanClip
    from lipreading_video_generation_tpu.pipelines.expert_proof import _window_batch

    rng = np.random.default_rng(0)
    long_clip = GanClip(
        np.zeros((20, 8, 8, 3), np.uint8), np.zeros(16000, np.float32))
    short_clip = GanClip(
        np.zeros((8, 8, 8, 3), np.uint8), np.zeros(16000, np.float32))
    batch = _window_batch([short_clip, long_clip], t=5, n=4, rng=rng, max_shift=1)
    assert batch["window"].shape == (4, 5, 8, 8, 3)
    # every sampled start leaves the shift headroom the long clip offers
    assert (batch["start_frame"] >= 2).all()
    assert (batch["start_frame"] <= 20 - 5 - 1).all()
    with pytest.raises(ValueError, match="frames"):
        _window_batch([short_clip], t=5, n=4, rng=rng, max_shift=6)


def test_mouth_aperture_proxy_nonsquare_uses_width():
    """The x-range of the mouth box comes from the frame WIDTH — on a wide
    frame the box must sit centered, not clipped to the left h-pixels."""
    from lipreading_video_generation_tpu.data.datasets import mouth_aperture_proxy

    h, w = 32, 96
    frames = np.ones((1, 2, h, w, 3), np.float32)
    # darken only the region a width-derived box covers beyond the height-
    # derived one: x in [0.28w, 0.72w) = [26, 69) vs height-derived [8, 23)
    frames[..., int(h * 0.58):int(h * 0.86), 30:69, :] = 0.0
    ap = mouth_aperture_proxy(frames)
    assert ap.shape == (1, 2)
    assert (ap > 0.5).all()  # the box overlaps the dark mouth region

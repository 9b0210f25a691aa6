"""CLI smoke tests (tiny configs, synthetic data)."""
import os

import numpy as np
import pytest

from lipreading_video_generation_tpu import cli


def test_train_vivit_synthetic(capsys):
    rc = cli.main([
        "train-vivit", "--steps", "4", "--synthetic",
        "--set", "vivit.num_classes=4", "--set", "vivit.hidden_size=32",
        "--set", "vivit.num_layers=1", "--set", "vivit.num_heads=4",
        "--set", "vivit.mlp_dim=32", "--set", "vivit.dtype=float32",
        "--set", "vivit.batch_size=16",
    ])
    assert rc == 0
    assert "best" in capsys.readouterr().out


@pytest.mark.slow
def test_train_feature_transformer_synthetic(capsys):
    """The Keras-path product surface (keras_vivit_model.py:87-125):
    DenseNet frame features → FeatureTransformer train → val accuracy.
    Synthetic word clips are brightness-separable, so even random-init
    DenseNet features must train to above-chance accuracy."""
    rc = cli.main([
        "train-feature-transformer", "--synthetic", "--max-clips", "64",
        "--set", "feature_transformer.num_classes=4",
        "--set", "feature_transformer.num_epochs=8",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith("val accuracy=")][-1]
    acc = float(line.split("val accuracy=")[1].split()[0])
    assert acc > 0.3  # 4 classes, chance = 0.25


@pytest.mark.slow
def test_train_diffusion_synthetic(capsys):
    rc = cli.main([
        "train-diffusion", "--steps", "2", "--synthetic",
        "--set", "diffusion.im_size=16", "--set", "diffusion.base_channels=32",
        "--set", "diffusion.channel_mult=(1,2)", "--set", "diffusion.num_res_blocks=1",
        "--set", "diffusion.attention_resolutions=(2,)", "--set", "diffusion.num_heads=2",
        "--set", "diffusion.time_embed_dim=32", "--set", "diffusion.audio_embed_dim=32",
        "--set", "diffusion.audio_proj_dim=8", "--set", "diffusion.im_cond_channels=4",
        "--set", "diffusion.audio_samples=800", "--set", "diffusion.num_timesteps=10",
        "--set", "diffusion.dtype=float32", "--set", "diffusion.batch_size=2",
    ])
    assert rc == 0


def test_build_frame_index(tmp_path, capsys):
    import cv2

    d = tmp_path / "vids"
    d.mkdir()
    path = str(d / "a.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (32, 32))
    for _ in range(20):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    out = str(tmp_path / "idx.pkl")
    rc = cli.main(["build-frame-index", "--data-root", str(d), "--out", out])
    assert rc == 0 and os.path.exists(out)


def _face_video(tmp_path, frames=8, size=128):
    import cv2

    path = str(tmp_path / "face.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (size, size))
    for _ in range(frames):
        img = np.full((size, size, 3), 40, np.uint8)
        cv2.circle(img, (64, 64), 40, (180, 150, 130), -1)
        w.write(img)
    w.release()
    return path


def _speech_wav(tmp_path, seconds=0.4):
    from lipreading_video_generation_tpu.data.video import save_wav

    path = str(tmp_path / "speech.wav")
    t = np.linspace(0, seconds, int(16000 * seconds))
    save_wav(path, np.sin(2 * np.pi * 220 * t).astype(np.float32), 16000)
    return path


GAN_TINY = ["--set", "gan.model_width=0.125", "--set", "gan.dtype=float32",
            "--set", "gan.batch_size=2"]


@pytest.mark.slow
def test_infer_lipsync_from_trained_checkpoint(tmp_path):
    """The reference's core serving UX (inference.py:13-22,162-181):
    train → checkpoint → infer with --checkpoint; output must differ from
    the random-init output."""
    import cv2

    ckdir = str(tmp_path / "gan_ck")
    rc = cli.main(["train-gan", "--steps", "4", "--synthetic",
                   "--checkpoint-dir", ckdir,
                   "--set", "gan.checkpoint_interval=4",
                   "--set", "gan.learning_rate=0.01", *GAN_TINY])
    assert rc == 0
    face, audio = _face_video(tmp_path), _speech_wav(tmp_path)

    def frames_of(path):
        cap = cv2.VideoCapture(path)
        out = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            out.append(f)
        cap.release()
        return np.stack(out)

    out_rand = str(tmp_path / "rand.mp4")
    rc = cli.main(["infer-lipsync", "--face", face, "--audio", audio,
                   "--out", out_rand, *GAN_TINY])
    assert rc == 0
    out_ck = str(tmp_path / "ck.mp4")
    rc = cli.main(["infer-lipsync", "--face", face, "--audio", audio,
                   "--out", out_ck, "--checkpoint", ckdir, *GAN_TINY])
    assert rc == 0
    assert os.path.exists(out_ck)
    assert np.any(frames_of(out_rand) != frames_of(out_ck))


DIFF_TINY = [
    "--set", "diffusion.im_size=16", "--set", "diffusion.base_channels=8",
    "--set", "diffusion.channel_mult=(1,2)", "--set", "diffusion.num_res_blocks=1",
    "--set", "diffusion.attention_resolutions=(2,)", "--set", "diffusion.num_heads=2",
    "--set", "diffusion.time_embed_dim=16", "--set", "diffusion.audio_embed_dim=16",
    "--set", "diffusion.audio_proj_dim=4", "--set", "diffusion.im_cond_channels=4",
    "--set", "diffusion.audio_samples=800", "--set", "diffusion.num_timesteps=10",
    "--set", "diffusion.dtype=float32", "--set", "diffusion.batch_size=2",
]


@pytest.mark.slow
def test_sample_diffusion_from_checkpoint_and_cond_video(tmp_path):
    """test.py:86-148 parity: sample with trained weights and a real
    condition clip (--cond-video/--cond-audio)."""
    import cv2

    ckdir = str(tmp_path / "diff_ck")
    rc = cli.main(["train-diffusion", "--steps", "2", "--synthetic",
                   "--checkpoint-dir", ckdir, "--checkpoint-every", "2",
                   "--set", "diffusion.learning_rate=0.01", *DIFF_TINY])
    assert rc == 0

    face = _face_video(tmp_path, frames=10, size=32)
    wav = _speech_wav(tmp_path, seconds=0.6)
    out_rand = str(tmp_path / "rand.png")
    rc = cli.main(["sample-diffusion", "--out", out_rand,
                   "--cond-video", face, "--cond-audio", wav, *DIFF_TINY])
    assert rc == 0 and os.path.exists(out_rand)
    out_ck = str(tmp_path / "ck.png")
    rc = cli.main(["sample-diffusion", "--out", out_ck, "--checkpoint", ckdir,
                   "--no-ema", "--cond-video", face, "--cond-audio", wav, *DIFF_TINY])
    assert rc == 0 and os.path.exists(out_ck)
    a = cv2.imread(out_rand)
    b = cv2.imread(out_ck)
    assert a.shape == (16, 16, 3) and b.shape == (16, 16, 3)
    assert np.any(a != b)


@pytest.mark.slow
def test_train_gan_from_packed_records(tmp_path):
    """Production input path: pack records → train through the native C++
    prefetch loader (SURVEY.md §7 hard part #1 feed-overlap machinery)."""
    recs = str(tmp_path / "recs")
    rc = cli.main(["pack-gan-records", "--synthetic", "--out", recs,
                   "--num-records", "8"])
    assert rc == 0
    rc = cli.main(["train-gan", "--steps", "2", "--records-root", recs, *GAN_TINY])
    assert rc == 0


@pytest.mark.slow
def test_train_lip_expert_synthetic(tmp_path, capsys):
    out = str(tmp_path / "expert_ck")
    rc = cli.main(["train-lip-expert", "--steps", "2", "--synthetic",
                   "--out", out, "--set", "gan.batch_size=2"])
    assert rc == 0
    assert os.path.exists(out)
    assert "saved expert" in capsys.readouterr().out


@pytest.mark.slow
def test_train_diffusion_from_packed_records(tmp_path):
    """Diffusion analog of the packed-record feed: pack → stream through
    the prefetch loader into the jitted train step."""
    recs = str(tmp_path / "drecs")
    rc = cli.main(["pack-diffusion-records", "--synthetic", "--out", recs,
                   "--num-records", "6", *DIFF_TINY])
    assert rc == 0
    rc = cli.main(["train-diffusion", "--steps", "2", "--records-root", recs,
                   *DIFF_TINY])
    assert rc == 0


@pytest.mark.slow
def test_sample_diffusion_video_generation(tmp_path):
    """--frames N: whole-clip generation as one batched trajectory, written
    as a video with per-frame sliding audio windows from the real clip."""
    import cv2

    face = _face_video(tmp_path, frames=10, size=32)
    wav = _speech_wav(tmp_path, seconds=0.6)
    out = str(tmp_path / "gen.mp4")
    rc = cli.main(["sample-diffusion", "--out", out, "--frames", "3",
                   "--cond-video", face, "--cond-audio", wav, *DIFF_TINY])
    assert rc == 0 and os.path.exists(out)
    cap = cv2.VideoCapture(out)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    cap.release()
    assert (n, w) == (3, 16)


@pytest.mark.slow
def test_syncnet_export_train_eval_chain(tmp_path, capsys):
    """The reference's expert workflow end-to-end: pretrain SyncNet →
    export → train-gan against the frozen expert → eval-gan metrics from
    the trained checkpoint (lipsync_expert.pth role, train_lipreading.py:
    342-343 + eval_model:155-192)."""
    sync_ck = str(tmp_path / "sync_ck")
    rc = cli.main(["train-syncnet", "--steps", "2", "--synthetic",
                   "--out", sync_ck, *GAN_TINY])
    assert rc == 0

    gan_ck = str(tmp_path / "gan_ck")
    rc = cli.main(["train-gan", "--steps", "2", "--synthetic",
                   "--checkpoint-dir", gan_ck,
                   "--set", "gan.checkpoint_interval=2",
                   "--syncnet-checkpoint", sync_ck, *GAN_TINY])
    assert rc == 0

    rc = cli.main(["eval-gan", "--checkpoint", gan_ck, "--synthetic",
                   "--syncnet-checkpoint", sync_ck, "--batches", "2", *GAN_TINY])
    assert rc == 0
    out = capsys.readouterr().out
    assert "eval/psnr" in out and "eval/ssim" in out and "eval/sync_loss" in out
    assert "untrained SyncNet" not in out


def test_train_lip_expert_without_transcripts_clear_error(tmp_path, capsys):
    """A preprocessed root with no text sidecars must fail fast with a
    clear message, not a KeyError inside the jitted step."""
    import cv2

    clip = tmp_path / "pre" / "clip0"
    clip.mkdir(parents=True)
    for i in range(12):
        cv2.imwrite(str(clip / f"{i}.jpg"), np.zeros((32, 32, 3), np.uint8))
    from lipreading_video_generation_tpu.data.video import save_wav

    save_wav(str(clip / "audio.wav"), np.zeros(16000, np.float32), 16000)
    with pytest.raises(SystemExit):
        cli.main(["train-lip-expert", "--steps", "1",
                  "--preprocessed-root", str(tmp_path / "pre"), *GAN_TINY])
    assert "transcripts" in capsys.readouterr().err


@pytest.mark.slow
def test_lip_expert_export_feeds_gan(tmp_path):
    """train-lip-expert --out → train-gan --lip-expert-checkpoint with the
    text-conditioned criterion active (the AV-HuBERT ckpt workflow)."""
    exp_ck = str(tmp_path / "exp_ck")
    rc = cli.main(["train-lip-expert", "--steps", "1", "--synthetic",
                   "--out", exp_ck, *GAN_TINY])
    assert rc == 0
    rc = cli.main(["train-gan", "--steps", "1", "--synthetic",
                   "--lip-expert-checkpoint", exp_ck,
                   "--set", "gan.lip_weight=0.01", *GAN_TINY])
    assert rc == 0


@pytest.mark.slow
def test_train_syncnet_real_data_auc_report(tmp_path, capsys):
    """--eval-auc-every reports held-out discrimination AUC on REAL
    preprocessed data too (not only the synthetic path): 4 clips on disk
    → 2 train + 2 held out → the AUC line must print."""
    import cv2

    from lipreading_video_generation_tpu.data.video import save_wav

    rng = np.random.default_rng(0)
    for c in range(4):
        clip = tmp_path / "pre" / f"clip{c}"
        clip.mkdir(parents=True)
        for i in range(25):
            cv2.imwrite(str(clip / f"{i}.jpg"),
                        rng.integers(0, 256, (32, 32, 3)).astype(np.uint8))
        save_wav(str(clip / "audio.wav"),
                 (rng.standard_normal(32000) * 0.1).astype(np.float32), 16000)
    rc = cli.main(["train-syncnet", "--steps", "1", "--eval-auc-every", "1",
                   "--preprocessed-root", str(tmp_path / "pre"), *GAN_TINY])
    assert rc == 0
    assert "held-out discrimination AUC=" in capsys.readouterr().out

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

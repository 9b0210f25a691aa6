"""Full lipreading pipeline on a synthetic LRS2-layout tree."""
import cv2
import numpy as np
import pytest

from lipreading_video_generation_tpu.core import config as config_mod
from lipreading_video_generation_tpu.core.config import Config
from lipreading_video_generation_tpu.pipelines import lipreading_e2e


@pytest.fixture(scope="module")
def lrs2_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("lrs2")
    rng = np.random.default_rng(0)
    for ci, (w1, w2) in enumerate([("HELLO", "WORLD"), ("HELLO", "AGAIN")]):
        d = root / f"spk{ci}"
        d.mkdir()
        path = str(d / "00001.mp4")
        wtr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
        for _ in range(14):
            img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            cv2.circle(img, (32, 32), 20, (180, 150, 130), -1)
            wtr.write(img)
        wtr.release()
        with open(str(d / "00001.txt"), "w") as f:
            f.write(f"Text:  {w1} {w2}\n\nConf: 4\n\nWORD START END SCORE\n")
            f.write(f"{w1} 0.00 0.24 1.0\n{w2} 0.24 0.52 1.0\n")
    return str(root)


@pytest.mark.slow
def test_e2e_lipreading_pipeline(lrs2_tree):
    cfg = config_mod.parse_overrides(Config(), [
        "vivit.hidden_size=32", "vivit.num_layers=1", "vivit.num_heads=4",
        "vivit.mlp_dim=32", "vivit.dtype=float32", "vivit.batch_size=4",
    ])
    state, stats = lipreading_e2e.run(cfg, lrs2_tree, num_epochs=2)
    assert 0.0 <= stats["accuracy"] <= 1.0
    assert 0.0 <= stats["sentence_accuracy"] <= 1.0


@pytest.mark.slow
def test_build_word_clip_dataset(lrs2_tree):
    from lipreading_video_generation_tpu.data.manifest import build_manifest

    cfg = Config()
    records, _ = build_manifest(lrs2_tree, require_transcript=True)
    ds = lipreading_e2e.build_word_clip_dataset(cfg, records)
    assert len(ds.clips) == 4      # 2 clips × 2 words
    assert ds.sentence_start_idx == [0, 2]
    assert ds.clips[0].shape == (5, 32, 32, 1)
    assert set(ds.vocab) >= {"HELLO", "WORLD", "AGAIN"}

"""Data-layer tests: manifests, windows, samplers, prefetch, video IO."""
import os

import cv2
import numpy as np
import pytest

from lipreading_video_generation_tpu.data import datasets, loader, manifest, video


def _write_clip(tmp_path, name="clip", frames=12, with_txt=True):
    d = tmp_path / "spk1"
    d.mkdir(exist_ok=True)
    path = str(d / f"{name}.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 64))
    rng = np.random.default_rng(0)
    for _ in range(frames):
        w.write(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    w.release()
    if with_txt:
        txt = str(d / f"{name}.txt")
        with open(txt, "w") as f:
            f.write("Text:  HELLO WORLD\n\nConf: 4\n\nWORD START END ASDSCORE\n")
            f.write("HELLO 0.00 0.20 1.0\nWORLD 0.20 0.44 1.0\n")
    return path


def test_parse_transcript(tmp_path):
    _write_clip(tmp_path)
    text, words = manifest.parse_transcript(str(tmp_path / "spk1" / "clip.txt"))
    assert text == "HELLO WORLD"
    assert [w.word for w in words] == ["HELLO", "WORLD"]
    assert words[0].start == 0.0 and words[1].end == pytest.approx(0.44)


def test_build_manifest_and_vocab(tmp_path):
    _write_clip(tmp_path, "a")
    _write_clip(tmp_path, "b")
    records, skipped = manifest.build_manifest(str(tmp_path))
    assert len(records) == 2 and skipped == 0
    vocab = manifest.build_vocab(records)
    assert vocab["[UNK]"] == 0 and "HELLO" in vocab and "WORLD" in vocab


def test_word_windows_frame_rounding(tmp_path):
    _write_clip(tmp_path)
    records, _ = manifest.build_manifest(str(tmp_path))
    spans = manifest.word_windows(records[0], fps=25.0)
    # round(25*0.2) = 5
    assert spans[0] == ("HELLO", 0, 5)
    assert spans[1] == ("WORLD", 5, 11)


def test_read_video_frames(tmp_path):
    path = _write_clip(tmp_path, frames=10)
    frames, fps = video.read_video_frames(path)
    assert frames.shape == (10, 64, 64, 3) and frames.dtype == np.uint8
    assert fps == pytest.approx(25.0)


def test_wav_roundtrip(tmp_path):
    wav = (np.sin(np.linspace(0, 100, 16000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "a.wav")
    video.save_wav(p, wav, 16000)
    back = video.load_wav(p, 16000)
    assert back.shape == (16000,)
    # save rescales to peak; compare after matching scale
    corr = np.corrcoef(wav, back)[0, 1]
    assert corr > 0.999


def test_gan_window_sampler_shapes():
    clips = datasets.synthetic_gan_clips(n_clips=3, frames=25)
    s = datasets.GanWindowSampler(clips, syncnet_T=5, seed=0)
    batch = s.sample_batch(4)
    assert batch["window"].shape == (4, 5, 96, 96, 3)
    assert batch["wrong_window"].shape == (4, 5, 96, 96, 3)
    assert batch["start_frame"].shape == (4,)
    assert batch["wav"].shape[0] == 4
    # wrong window differs from target window for clips long enough
    assert not np.array_equal(batch["window"], batch["wrong_window"])


def test_gan_sampler_deterministic():
    clips = datasets.synthetic_gan_clips()
    b1 = datasets.GanWindowSampler(clips, seed=7).sample_batch(2)
    b2 = datasets.GanWindowSampler(clips, seed=7).sample_batch(2)
    np.testing.assert_array_equal(b1["window"], b2["window"])


def test_frame_index_and_split(tmp_path):
    p1 = _write_clip(tmp_path, "a", frames=20, with_txt=False)
    items = datasets.build_frame_index([p1], step=6)
    assert all(it.frame_end - it.frame_start == 6 for it in items)
    assert len(items) >= 2
    idx_path = str(tmp_path / "index.pkl")
    datasets.save_frame_index(items, idx_path)
    loaded = datasets.load_frame_index(idx_path)
    assert loaded == items
    tr, va, te = datasets.split_records(list(range(100)), seed=1)
    assert len(tr) == 80 and len(va) == 10 and len(te) == 10
    assert sorted(tr + va + te) == list(range(100))


def test_diffusion_pair_sampler(tmp_path):
    p1 = _write_clip(tmp_path, "a", frames=20, with_txt=False)
    items = datasets.build_frame_index([p1], step=6)
    s = datasets.DiffusionPairSampler(items, audio_samples=4000)
    batch = s.sample_batch(2)
    assert batch["cond_frame"].shape == (2, 64, 64, 3)
    assert batch["target_frame"].shape == (2, 64, 64, 3)
    assert batch["audio"].shape == (2, 4000)


def test_word_clip_sampler_padding():
    clips, labels = datasets.synthetic_word_clips(n=20, t=3)  # shorter than max
    s = datasets.WordClipSampler(clips, labels, max_frames=5)
    batch = next(s.batches(4))
    assert batch["clips"].shape == (4, 5, 32, 32, 1)
    # padded frames are zero
    assert batch["clips"][:, 3:].max() == 0


def test_prefetch_to_device():
    clips = datasets.synthetic_gan_clips(n_clips=2, frames=20)
    s = datasets.GanWindowSampler(clips)
    it = loader.prefetch_to_device(lambda: s.sample_batch(2), num_batches=3)
    batches = list(it)
    assert len(batches) == 3
    assert batches[0]["window"].shape == (2, 5, 96, 96, 3)


def test_iterator_feed_protocol():
    it = iter([{"x": np.zeros(2)}, {"x": np.ones(2)}])
    fn = loader.iterator_feed(it)
    assert fn()["x"].sum() == 0
    assert fn()["x"].sum() == 2
    import pytest as _pytest

    with _pytest.raises(StopIteration):
        fn()


# --- scan-feed helpers (data.loader) ---------------------------------------

def test_host_prefetch_yields_all_and_stops():
    from lipreading_video_generation_tpu.data.loader import host_prefetch

    produced = iter([{"x": np.full((2,), i)} for i in range(5)])

    def batch_fn():
        return next(produced)

    got = [b["x"][0] for b in host_prefetch(batch_fn, depth=2)]
    assert got == [0, 1, 2, 3, 4]


def test_take_partial_and_exhausted():
    from lipreading_video_generation_tpu.data.loader import take

    it = iter(range(5))
    assert take(it, 3) == [0, 1, 2]
    assert take(it, 10) == [3, 4]
    assert take(it, 2) == []


def test_stack_batches_shapes():
    from lipreading_video_generation_tpu.data.loader import stack_batches

    raws = [{"a": np.zeros((2, 3)), "b": np.ones((2,), np.int32)} for _ in range(4)]
    out = stack_batches(raws)
    assert out["a"].shape == (4, 2, 3)
    assert out["b"].shape == (4, 2)
    assert out["b"].dtype == np.int32

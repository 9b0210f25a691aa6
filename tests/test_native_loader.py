"""Native C++ prefetch loader tests (builds the .so with g++)."""
import numpy as np
import pytest

from lipreading_video_generation_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.native_available(), reason="no g++/native build")


def _write_records(tmp_path, n=12, shape=(5, 8, 8, 1)):
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(n):
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        p = str(tmp_path / f"rec{i}.bin")
        nl.write_record_file(p, arr)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


def test_reads_all_records_exactly(tmp_path):
    paths, arrays = _write_records(tmp_path)
    with nl.NativePrefetchLoader(paths, (5, 8, 8, 1), np.uint8, num_threads=3) as loader:
        got = dict(iter(loader))
    assert sorted(got) == list(range(len(paths)))
    for i, arr in enumerate(arrays):
        np.testing.assert_array_equal(got[i], arr)


def test_float32_records(tmp_path):
    arr = np.linspace(0, 1, 24, dtype=np.float32).reshape(2, 3, 4)
    p = str(tmp_path / "f.bin")
    nl.write_record_file(p, arr)
    with nl.NativePrefetchLoader([p], (2, 3, 4), np.float32) as loader:
        (_, got), = list(iter(loader))
    np.testing.assert_array_equal(got, arr)


def test_missing_file_raises(tmp_path):
    paths, _ = _write_records(tmp_path, n=2)
    paths.append(str(tmp_path / "missing.bin"))
    with nl.NativePrefetchLoader(paths, (5, 8, 8, 1)) as loader:
        with pytest.raises(IOError):
            list(iter(loader))


def test_bounded_queue_backpressure(tmp_path):
    # more records than capacity: producers must block, not drop
    paths, arrays = _write_records(tmp_path, n=20)
    with nl.NativePrefetchLoader(paths, (5, 8, 8, 1), capacity=2, num_threads=4) as loader:
        got = dict(iter(loader))
    assert len(got) == 20

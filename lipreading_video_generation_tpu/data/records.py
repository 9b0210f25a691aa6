"""Fixed-shape packed training records + the native-loader input path.

The reference feeds GAN training through torch DataLoader worker processes
that cv2.imread 10 JPEGs and compute a librosa mel per sample on every
epoch (gan-model/preprocessing/dataset.py:105-164). The TPU-native design
moves that cost offline once: pre-sampled training windows are packed into
fixed-shape byte records which the C++ prefetch loader
(data/native_loader.py, native/prefetch_loader.cpp) streams off the Python
thread straight into batch tensors — host IO fully overlapped with device
compute (SURVEY.md §7 hard part #1).

Each record is one training sample with the exact keys
``pipelines/train_gan.prepare_batch`` consumes (window, wrong_window,
start_frame, wav[, text_tokens]); mel/resize/mask stay on device, so the
record path is numerically identical to the online ``GanWindowSampler``.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

SPEC_FILENAME = "records_spec.json"


@dataclasses.dataclass(frozen=True)
class GanRecordSpec:
    """Byte layout of one packed GAN training sample — a named wrapper over
    the generic ``TensorRecordSpec`` layout (kept as its own spec-file kind
    for the window/wav shape parameters and wav-truncation semantics)."""

    syncnet_T: int
    height: int
    width: int
    wav_len: int
    max_text_len: int = 0  # 0 = no text_tokens section

    def _tensor_spec(self) -> "TensorRecordSpec":
        t, h, w = self.syncnet_T, self.height, self.width
        fields = [
            ("window", (t, h, w, 3), "uint8"),
            ("wrong_window", (t, h, w, 3), "uint8"),
            ("start_frame", (), "int32"),
            ("wav", (self.wav_len,), "float32"),
        ]
        if self.max_text_len:
            fields.append(("text_tokens", (self.max_text_len,), "int32"))
        return TensorRecordSpec(fields=tuple(fields))

    @property
    def record_bytes(self) -> int:
        return self._tensor_spec().record_bytes

    def pack(self, sample: Dict[str, np.ndarray]) -> bytes:
        sample = dict(sample)
        # windows may carry a longer source wav; keep the window-aligned head
        sample["wav"] = np.ascontiguousarray(sample["wav"], np.float32)[: self.wav_len]
        sample["start_frame"] = np.asarray(sample["start_frame"], np.int32).reshape(())
        return self._tensor_spec().pack(sample)

    def unpack(self, raw: np.ndarray) -> Dict[str, np.ndarray]:
        """(record_bytes,) uint8 → sample dict (copies, C-contiguous)."""
        return self._tensor_spec().unpack(raw)

    def save(self, directory: str) -> None:
        with open(os.path.join(directory, SPEC_FILENAME), "w") as f:
            json.dump(dataclasses.asdict(self), f)

    @classmethod
    def load(cls, directory: str) -> "GanRecordSpec":
        with open(os.path.join(directory, SPEC_FILENAME)) as f:
            return cls(**json.load(f))


@dataclasses.dataclass(frozen=True)
class TensorRecordSpec:
    """Generic fixed-shape record: an ordered tuple of named tensors
    ``(name, shape, dtype)``, packed back-to-back in C order."""

    fields: tuple  # ((name, (dims...), dtype-str), ...)

    def _field_bytes(self, shape, dtype) -> int:
        return int(np.prod(shape, dtype=np.int64)) * np.dtype(dtype).itemsize

    @property
    def record_bytes(self) -> int:
        return sum(self._field_bytes(s, d) for _, s, d in self.fields)

    def pack(self, sample: Dict[str, np.ndarray]) -> bytes:
        parts = []
        for name, shape, dtype in self.fields:
            # np.asarray (not ascontiguousarray: it promotes 0-d to 1-d)
            a = np.asarray(sample[name], dtype, order="C")
            if a.shape != tuple(shape):
                raise ValueError(f"{name}: shape {a.shape} != spec {tuple(shape)}")
            parts.append(a.tobytes())
        return b"".join(parts)

    def unpack(self, raw: np.ndarray) -> Dict[str, np.ndarray]:
        out, o = {}, 0
        for name, shape, dtype in self.fields:
            n = self._field_bytes(shape, dtype)
            out[name] = np.frombuffer(
                raw[o : o + n].tobytes(), dtype
            ).reshape(tuple(shape)).copy()
            o += n
        return out

    def save(self, directory: str) -> None:
        with open(os.path.join(directory, SPEC_FILENAME), "w") as f:
            json.dump({"kind": "tensor", "fields": list(self.fields)}, f)

    @classmethod
    def from_json(cls, obj: dict) -> "TensorRecordSpec":
        return cls(fields=tuple(
            (name, tuple(shape), dtype) for name, shape, dtype in obj["fields"]
        ))


def load_spec(directory: str):
    """Read ``records_spec.json`` and dispatch on its ``kind`` field
    (absent → the original GAN layout)."""
    with open(os.path.join(directory, SPEC_FILENAME)) as f:
        obj = json.load(f)
    if obj.get("kind") == "tensor":
        return TensorRecordSpec.from_json(obj)
    return GanRecordSpec(**obj)


def write_gan_records(
    sampler,
    out_dir: str,
    num_records: int,
    wav_len: Optional[int] = None,
) -> GanRecordSpec:
    """Pre-sample ``num_records`` training windows from a GanWindowSampler
    and pack them as one file per record (the native loader's unit).

    The offline analog of the reference DataLoader's per-epoch __getitem__
    work (dataset.py:106-168) — paid once, then streamed at IO speed.
    """
    os.makedirs(out_dir, exist_ok=True)
    probe = sampler.sample_batch(1)
    t, h, w = probe["window"].shape[1:4]
    wav_len = int(wav_len or probe["wav"].shape[1])
    spec = GanRecordSpec(
        syncnet_T=t, height=h, width=w, wav_len=wav_len,
        max_text_len=probe["text_tokens"].shape[1] if "text_tokens" in probe else 0,
    )
    spec.save(out_dir)
    width_digits = max(6, len(str(num_records)))
    for i in range(num_records):
        b = sampler.sample_batch(1)
        sample = {k: v[0] for k, v in b.items()}
        if len(sample["wav"]) < wav_len:
            sample["wav"] = np.pad(sample["wav"], (0, wav_len - len(sample["wav"])))
        with open(os.path.join(out_dir, f"{i:0{width_digits}d}.rec"), "wb") as f:
            f.write(spec.pack(sample))
    return spec


def record_paths(records_dir: str) -> Sequence[str]:
    return sorted(
        os.path.join(records_dir, f)
        for f in os.listdir(records_dir)
        if f.endswith(".rec")
    )


def iter_record_batches(
    records_dir: str,
    batch_size: int,
    loop: bool = True,
    prefer_native: bool = True,
    num_threads: int = 2,
    capacity: int = 16,
) -> Iterator[Dict[str, np.ndarray]]:
    """Stream packed records (any spec kind) as prepare_batch-ready batches.

    Uses the C++ prefetch loader when buildable (IO + unpack off the main
    thread into a bounded ring buffer); otherwise plain file reads — same
    batches either way.
    """
    from . import native_loader

    spec = load_spec(records_dir)
    paths = record_paths(records_dir)
    if not paths:
        raise ValueError(f"no .rec files under {records_dir!r}")
    use_native = prefer_native and native_loader.native_available()

    def raw_records() -> Iterator[np.ndarray]:
        while True:
            if use_native:
                with native_loader.NativePrefetchLoader(
                    paths, (spec.record_bytes,), np.uint8,
                    capacity=capacity, num_threads=num_threads,
                ) as ldr:
                    for _, arr in ldr:
                        yield arr
            else:
                for p in paths:
                    yield np.fromfile(p, np.uint8)
            if not loop:
                return

    buf = []
    for raw in raw_records():
        buf.append(spec.unpack(raw))
        if len(buf) == batch_size:
            yield {
                k: np.stack([s[k] for s in buf])
                for k in buf[0]
            }
            buf = []
    if buf:  # trailing partial batch (loop=False, count % batch_size != 0)
        yield {k: np.stack([s[k] for s in buf]) for k in buf[0]}


iter_gan_record_batches = iter_record_batches


def diffusion_record_spec(im_size: int, audio_samples: int) -> TensorRecordSpec:
    """One DiffusionPairSampler sample (cond frame, target frame, audio
    slice — dataset.py:105-130 semantics) at the train resolution."""
    return TensorRecordSpec(fields=(
        ("cond_frame", (im_size, im_size, 3), "uint8"),
        ("target_frame", (im_size, im_size, 3), "uint8"),
        ("audio", (audio_samples,), "float32"),
    ))


def write_diffusion_records(
    sampler,
    out_dir: str,
    num_records: int,
    im_size: int,
) -> TensorRecordSpec:
    """Pre-sample diffusion frame pairs, resized to ``im_size`` with the
    SAME bilinear op the jitted train step uses (ops/image.resize keeps
    uint8, and same-size resize is identity) — so record batches are
    numerically identical to the online sampler path, minus the per-step
    host video decode the reference pays (video-generation/dataset.py)."""
    import jax

    from ..ops import image as image_ops

    os.makedirs(out_dir, exist_ok=True)
    probe = sampler.sample_batch(1)
    spec = diffusion_record_spec(im_size, probe["audio"].shape[1])
    spec.save(out_dir)
    cpu = jax.devices("cpu")[0]
    width_digits = max(6, len(str(num_records)))
    for i in range(num_records):
        b = sampler.sample_batch(1)
        with jax.default_device(cpu):
            cond = np.asarray(image_ops.resize(b["cond_frame"][0], (im_size, im_size)))
            tgt = np.asarray(image_ops.resize(b["target_frame"][0], (im_size, im_size)))
        sample = {"cond_frame": cond, "target_frame": tgt, "audio": b["audio"][0]}
        with open(os.path.join(out_dir, f"{i:0{width_digits}d}.rec"), "wb") as f:
            f.write(spec.pack(sample))
    return spec

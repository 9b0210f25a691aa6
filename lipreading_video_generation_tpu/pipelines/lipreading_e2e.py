"""End-to-end lipreading orchestration — the reference's main.py flow.

Capability target: lipreading/main.py:29-62 — walk the LRS2 tree, extract
per-word mouth-ROI clips, build the vocabulary, train the ViViT classifier,
and evaluate, including sentence-level eval inputs (sentence_start_idx).

The per-frame host loop (MediaPipe + cv2 per frame, get_data.py:37-49)
becomes: batched S3FD detection + one fused device program per clip
(pipelines/preprocess.mouth_roi_pipeline).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..core.config import Config
from ..data import video as video_io
from ..data.datasets import WordClipSampler
from ..data.manifest import ClipRecord, build_manifest, build_vocab, word_windows
from ..models.s3fd import S3FD
from . import sentence_eval as se
from . import train_vivit
from .preprocess import preprocess_clip_for_lipreading


@dataclasses.dataclass
class LipreadingDataset:
    """prepare_all_videos outputs (feature_extraction.py:38-93 analog)."""

    clips: List[np.ndarray]          # (T, h, w, 1) uint8 each
    labels: np.ndarray               # (N,) word ids
    words: List[str]
    vocab: Dict[str, int]
    sentence_start_idx: List[int]    # first word index of each clip/sentence
    transcripts: List[str]


def build_word_clip_dataset(
    cfg: Config,
    records: Sequence[ClipRecord],
    s3fd_params=None,
    max_clips: Optional[int] = None,
    landmark_params=None,
) -> LipreadingDataset:
    """LRS2 records → per-word ROI clips + labels + sentence boundaries.

    ``landmark_params`` (a trained models/lip_landmark.LipLandmarkNet) swaps
    the geometric mouth-box estimate for regressed lip landmarks — the
    MediaPipe-parity path (lipreading/preprocess.py:38-80)."""
    if s3fd_params is None:
        s3fd_params = S3FD().init(
            jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32)
        )["params"]
    vocab = build_vocab(records)
    clips: List[np.ndarray] = []
    words: List[str] = []
    labels: List[int] = []
    starts: List[int] = []
    transcripts: List[str] = []
    for rec in records[: max_clips or len(records)]:
        spans = word_windows(rec, cfg.gan.fps)
        if not spans:
            continue
        try:
            frames, _ = video_io.read_video_frames(rec.video_path)
        except (OSError, ValueError):
            continue
        cclips, cwords = preprocess_clip_for_lipreading(
            frames, s3fd_params, spans, cfg.preprocess, cfg.vivit.num_frames,
            landmark_params=landmark_params,
        )
        starts.append(len(words))
        transcripts.append(rec.text)
        for clip, word in zip(cclips, cwords):
            clips.append(clip)
            words.append(word)
            labels.append(vocab.get(word.upper(), 0))
    return LipreadingDataset(
        clips=clips, labels=np.asarray(labels, np.int32), words=words, vocab=vocab,
        sentence_start_idx=starts, transcripts=transcripts,
    )


def run(
    cfg: Config,
    data_root: str,
    num_epochs: Optional[int] = None,
    max_clips: Optional[int] = None,
    metrics_writer=None,
    landmark_checkpoint: Optional[str] = None,
    s3fd_checkpoint: Optional[str] = None,
) -> Tuple[train_vivit.TrainState, Dict[str, float]]:
    """Full pipeline: manifest → word clips → ViViT train → word accuracy +
    sentence-level beam-search accuracy (main.py:29-62 + sentence_eval).

    ``s3fd_checkpoint`` (port-s3fd --out) swaps the random-init face
    detector for the ported pretrained one — without it detection emits
    garbage and ROI extraction falls back to whole-frame boxes."""
    from ..core.config import replace as cfg_replace

    landmark_params = None
    if landmark_checkpoint is not None:
        from .train_landmark import load_params

        landmark_params = load_params(landmark_checkpoint)
    s3fd_params = None
    if s3fd_checkpoint is not None:
        from ..models.ports import load_s3fd_params

        s3fd_params = load_s3fd_params(s3fd_checkpoint)
    records, skipped = build_manifest(data_root, require_transcript=True)
    ds = build_word_clip_dataset(
        cfg, records, s3fd_params=s3fd_params, max_clips=max_clips,
        landmark_params=landmark_params,
    )
    if not ds.clips:
        raise ValueError(f"no word clips extracted from {data_root!r} ({skipped} skipped)")

    vivit_cfg = cfg_replace(cfg.vivit, num_classes=max(2, len(ds.vocab)))
    cfg = cfg_replace(cfg, vivit=vivit_cfg)
    # train/test cut at a clip boundary — the test_train_cut_idx role
    # (feature_extraction.py:38-93): last ~15% of sentences are held out
    cut_sentence = max(1, int(0.85 * len(ds.sentence_start_idx)))
    cut = (ds.sentence_start_idx[cut_sentence]
           if cut_sentence < len(ds.sentence_start_idx) else len(ds.clips))
    train_clips, train_labels = ds.clips[:cut], ds.labels[:cut]
    test_clips, test_labels = ds.clips[cut:], ds.labels[cut:]
    if not test_clips:  # tiny datasets: eval on train
        test_clips, test_labels = train_clips, train_labels
    sampler = WordClipSampler(train_clips, train_labels, cfg.vivit.num_frames, seed=cfg.seed)
    test_sampler = WordClipSampler(test_clips, test_labels, cfg.vivit.num_frames, seed=cfg.seed)
    bs = min(cfg.vivit.batch_size, len(train_clips), len(test_clips))
    state, best = train_vivit.train(
        cfg,
        lambda: sampler.batches(bs),
        lambda: test_sampler.batches(bs, shuffle=False),
        num_epochs=num_epochs,
        metrics_writer=metrics_writer,
    )

    # sentence-level eval over the full word sequence (sentence_eval.py:36-56)
    fixed = np.stack([sampler._fix(c) for c in ds.clips])
    # serving DP: the clip batch shards over the mesh data axis
    logp = np.asarray(train_vivit.predict_sharded(state, fixed))
    vocab_list = [w for w, _ in sorted(ds.vocab.items(), key=lambda kv: kv[1])]
    # trained neural LM over the dataset's own transcripts (the reference's
    # DistilBERT-CoLA role, sentence_eval.py:37-38); bigram fallback when
    # transcripts are too few to train on
    scorer = se.fit_default_scorer(ds.transcripts, seed=cfg.seed)
    sent_acc = se.evaluate_sentences(
        logp, ds.labels, ds.sentence_start_idx, vocab_list, scorer,
        word_top_k=cfg.sentence_eval.word_top_k,
        beam_width=cfg.sentence_eval.beam_width,
        keep_top=cfg.sentence_eval.keep_top,
    )
    return state, {**best, "sentence_accuracy": sent_acc}

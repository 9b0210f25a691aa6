"""Typed configuration tree for every workload.

Replaces the reference's four uncoordinated config mechanisms (argparse per
driver, the mutable ``HParams`` attr-dict at
gan-model/preprocessing/params.py:6-86, inline config dicts at
video-generation/diffusion/test.py:33-49, and module constants at
lipreading/main.py:33-36) with frozen dataclasses that can be overridden
from the CLI via ``parse_overrides``.

All defaults reproduce the reference's trained configuration so parity runs
need no flags.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence, Tuple


@dataclass(frozen=True)
class AudioConfig:
    """Log-mel frontend parameters (reference: gan-model/preprocessing/params.py:24-64)."""

    sample_rate: int = 16000
    n_fft: int = 800
    hop_size: int = 200
    win_size: int = 800
    num_mels: int = 80
    fmin: float = 55.0
    fmax: float = 7600.0
    preemphasis: float = 0.97
    preemphasize: bool = True
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    max_abs_value: float = 4.0
    symmetric_mels: bool = True
    signal_normalization: bool = True
    rescale: bool = True
    rescaling_max: float = 0.9

    @property
    def mel_step_per_frame(self) -> float:
        """Mel frames per video frame at 25 fps: 80 mel steps / sec ÷ 25 fps."""
        return (self.sample_rate / self.hop_size) / 25.0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. The reference has no distributed backend
    (SURVEY.md §2.5); this is the TPU-native communication story: a named
    mesh with ``data`` and ``model`` axes, XLA collectives over ICI.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 means "all remaining devices"
    data_parallel: int = -1
    model_parallel: int = 1
    # Parameters with >= this many elements (and a model-axis-divisible
    # output dim) are tensor-parallel sharded when model_parallel > 1.
    model_shard_threshold: int = 2**22
    # ZeRO-1: shard optimizer state (Adam moments) over the DATA axis —
    # pure DP otherwise replicates params AND both moments on every chip
    # (3x param memory per device). Each moment leaf shards its largest
    # data-axis-divisible dim that tensor parallelism hasn't claimed;
    # GSPMD lowers the update to reduce-scatter(grads)-shaped compute +
    # all-gather of the applied updates. Numerics are identical (Adam is
    # elementwise); equivalence pinned in tests/test_parallel.py.
    zero1: bool = False
    # moment leaves smaller than this replicate regardless (sharding tiny
    # tensors buys nothing and costs collective latency)
    zero1_min_size: int = 2**16


@dataclass(frozen=True)
class GanConfig:
    """Wav2Lip-style lip-sync GAN (reference: gan-model/preprocessing/params.py:67-85,
    gan-model/train_lipreading.py:31-44)."""

    img_size: int = 96
    fps: float = 25.0
    syncnet_T: int = 5          # frames per window (dataset.py:32)
    syncnet_mel_step_size: int = 16  # mel steps per window (dataset.py:33)
    batch_size: int = 16
    learning_rate: float = 1e-4
    disc_learning_rate: float = 1e-4
    adam_b1: float = 0.5        # train_lipreading.py:330-333
    adam_b2: float = 0.999
    syncnet_wt: float = 0.0     # gated to 0.03 once eval sync loss < .75
    syncnet_wt_after_gate: float = 0.03
    syncnet_gate_threshold: float = 0.75
    disc_wt: float = 0.07
    lip_weight: float = 0.0     # AV-HuBERT-style lipreading expert loss weight
    checkpoint_interval: int = 3000
    eval_interval: int = 9000
    num_epochs: int = 10**6     # train until stopped, like the reference
    dtype: str = "bfloat16"
    model_width: float = 1.0    # channel multiplier (1.0 = reference plan)
    # Serving-only int8 (ops/quant.py): generator Conv/Dense matmuls run
    # int8×int8→int32 on the MXU. Halves matmul operand HBM bytes. The v5e
    # int8 MXU 2× is real (round-4 microbench_int8_v2: 1.9× over bf16) but
    # this fusion-bound serving program doesn't convert it (BENCH_NOTES.md
    # int8 section) — a memory lever, not a speed claim here. Training is
    # untouched; quality bound pinned in tests/test_quant.py.
    serve_int8: bool = False
    # Static-calibrated activation scales (one eager calibration batch at
    # serving start, zero runtime reductions): recovers most of dynamic
    # int8's overhead (−18% → −4.6% vs bf16 on the serving bench).
    serve_int8_static: bool = False


@dataclass(frozen=True)
class DiffusionConfig:
    """Image+audio-conditioned DDPM (reference: video-generation/diffusion/train.py:48-97,
    test.py:33-49). The reference's t-range bug (t~U[0,500) with a 100-step
    schedule, train.py:125) is fixed: t is always sampled in [0, num_timesteps).
    """

    im_size: int = 128
    im_channels: int = 3
    # The reference trains with LinearNoiseScheduler(100, 0.00085, 0.012)
    # (train.py:47-51) but samples with LinearNoiseSchedulerV2(500, 5e-5,
    # 0.015) (test.py:111) — a train/test mismatch on top of the t-range
    # bug. One schedule is used for both here; defaults follow test.py.
    num_timesteps: int = 500
    beta_start: float = 5e-5
    beta_end: float = 0.015
    scheduler: str = "linear"   # linear | linear_v2 | cosine
    # U-Net — the as-trained reference model: train.py:87-97 sets
    # image_size/model_channels/num_res_blocks/attention_resolutions and
    # leaves the rest at unet_audio.py:34-37's defaults
    # (channel_mult=(1,2,4), num_heads=1, dropout=0.1).
    base_channels: int = 64
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (1, 2, 4)  # downsample factors with attention
    num_heads: int = 1
    dropout: float = 0.1
    time_embed_dim: int = 256
    # conditioning (unet_audio.py:39-66)
    audio_embed_dim: int = 768   # wav2vec2-base hidden size analog
    audio_proj_dim: int = 128
    im_cond_channels: int = 64
    audio_samples: int = 4000    # dataset.py:125
    buffer_frames: int = 5
    # Audio-encoder architecture: "native" = the from-scratch
    # AudioFeatureEncoder (log-mel + conv + transformer); "wav2vec2" = the
    # Flax Wav2Vec2Encoder (models/wav2vec2.py) whose weights port from the
    # reference's pretrained facebook/wav2vec2-base-960h via port-wav2vec2
    # (unet_audio.py:11-14). Both are trainable inside UNetAudio — the
    # reference trains its wav2vec2 jointly too.
    audio_encoder: str = "native"   # native | wav2vec2
    # downscaled Wav2Vec2Encoder knobs (selftests / CPU-tier parity); the
    # defaults are the base model the reference loads
    w2v_num_layers: int = 12
    w2v_ffn_dim: int = 3072
    w2v_num_heads: int = 12
    w2v_conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    w2v_conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    w2v_conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    w2v_pos_conv_kernel: int = 128
    w2v_pos_conv_groups: int = 16
    # training
    batch_size: int = 8
    learning_rate: float = 1e-4  # the reference's 1e-2 (train.py:102) diverges; 1e-4 is the sane default
    num_epochs: int = 10
    dtype: str = "bfloat16"
    # ResBlock rematerialization (the reference's checkpoint autograd hack,
    # video-generation/diffusion/utils.py:161-207). With the Pallas flash
    # backward the activations fit HBM at the reference config, so recompute
    # is pure overhead — off by default; flip on for configs that OOM.
    remat: bool = False
    # Sequence-parallel U-Net attention: the H·W token axis (16,384 tokens
    # at ds=1 @128² — the FLOP-heaviest op here) shards over the mesh's
    # ``sequence_axis`` and K/V shards rotate via ppermute (ring attention).
    # Only active when a physical mesh with that axis (size > 1) is in
    # scope; otherwise the same model runs local flash attention.
    sequence_parallel: bool = False
    sequence_axis: str = "model"


@dataclass(frozen=True)
class ClassifierConfig:
    """Noisy-image classifier for classifier-guided sampling — the
    ``EncoderUNetModel`` driver (reference: the down-path classifier
    variant at video-generation/diffusion/unet.py:695-905, which the
    reference defines but never trains or samples with). Trained on
    q-sampled x_t at uniform t, it supplies ∇_{x_t} log p(y | x_t) to
    ``sample-diffusion --classifier-checkpoint`` (guided-diffusion's
    classifier guidance). The noise schedule comes from the
    ``diffusion`` section — guidance must match the sampling chain."""

    num_classes: int = 4
    base_channels: int = 32
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 1
    attention_resolutions: Tuple[int, ...] = (4,)
    num_heads: int = 2
    time_embed_dim: int = 128
    dropout: float = 0.0
    # training
    batch_size: int = 32
    learning_rate: float = 3e-4
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class SuperResConfig:
    """Diffusion super-resolution stage — the ``SuperResModel`` driver
    (reference: video-generation/diffusion/unet.py:678-693, defined but
    never driven). Trains a U-Net to denoise a high-res frame conditioned
    on its bilinearly-upsampled low-res version (channel concat); serving
    is the two-stage cascade ``sample-diffusion --sr-checkpoint``: base
    model samples at ``low_size``, this stage lifts to ``im_size``. The
    noise schedule fields mirror DiffusionConfig (one schedule per stage)."""

    im_size: int = 128           # high-res output
    low_size: int = 64           # base-stage / conditioning resolution
    im_channels: int = 3
    num_timesteps: int = 500
    beta_start: float = 5e-5
    beta_end: float = 0.015
    scheduler: str = "linear"
    base_channels: int = 48
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4,)
    num_heads: int = 1
    time_embed_dim: int = 192
    dropout: float = 0.0
    # training
    batch_size: int = 8
    learning_rate: float = 1e-4
    dtype: str = "bfloat16"
    # degradation used to synthesize (low, high) pairs in training: the
    # low-res input is the area-downsampled target (the standard SR pair)
    sr_inference_steps: int = 50  # few-step DDIM default for the SR stage


@dataclass(frozen=True)
class ViViTConfig:
    """ViViT word-level lipreader (reference: lipreading/main.py:33-36,59-60,
    huggingface_vivit_model.py:18-46)."""

    image_size: int = 32
    num_frames: int = 5
    num_channels: int = 1
    tubelet_size: Tuple[int, int, int] = (1, 8, 8)  # (t, h, w) tubelet embedding
    hidden_size: int = 256
    num_layers: int = 12
    num_heads: int = 8
    mlp_dim: int = 1024
    dropout: float = 0.0
    num_classes: int = 64
    # training (huggingface_vivit_model.py:36-47)
    batch_size: int = 16
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    lr_step_epochs: int = 2
    lr_step_gamma: float = 0.2
    num_epochs: int = 10
    dtype: str = "bfloat16"
    # Long-context hook (SURVEY.md §5): route encoder attention through the
    # sequence-parallel ring (ops/ring_attention.py) — tokens shard over
    # ``sequence_axis`` and K/V shards rotate via ppermute. Only active when
    # a physical mesh with that axis (size > 1) is live; falls back to local
    # flash attention otherwise.
    sequence_parallel: bool = False
    sequence_axis: str = "model"
    # Pipeline parallelism (parallel/pipeline.py): stage the encoder blocks
    # over the ``model`` mesh axis (contiguous layer chunks per stage),
    # microbatches streaming via ppermute. Mutually exclusive with
    # sequence_parallel (both claim the model axis). num_layers must divide
    # by the model-axis size; pp_num_micro=0 → one microbatch per stage.
    pipeline_parallel: bool = False
    pp_num_micro: int = 0


@dataclass(frozen=True)
class FeatureTransformerConfig:
    """Keras-transformer-over-DenseNet-features variant
    (reference: lipreading/keras_vivit_model.py:17-125, feature_extraction.py:16-19)."""

    max_seq_length: int = 5
    num_features: int = 1024
    dense_dim: int = 4
    num_heads: int = 2
    num_layers: int = 2
    dropout: float = 0.3
    head_dropout: float = 0.5
    num_classes: int = 64
    num_epochs: int = 20
    val_split: float = 0.15
    learning_rate: float = 1e-3


@dataclass(frozen=True)
class SentenceEvalConfig:
    """Beam-search sentence eval (reference: lipreading/sentence_eval.py:5-56)."""

    beam_width: int = 20
    keep_top: int = 5
    word_top_k: int = 5


@dataclass(frozen=True)
class PreprocessConfig:
    """Mouth-ROI / face-crop preprocessing
    (reference: lipreading/preprocess.py, gan-model/preprocessing/preprocess.py)."""

    lip_crop_size: Tuple[int, int] = (48, 48)   # lipreading path (get_data.py:45)
    model_input_size: Tuple[int, int] = (32, 32)  # ViViT input (main.py:35-36)
    face_det_batch_size: int = 16
    gen_batch_size: int = 128
    box_smooth_T: int = 5       # inference.py:61-68
    clahe_clip_limit: float = 0.2
    clahe_grid: Tuple[int, int] = (8, 8)
    face_det_score_threshold: float = 0.5
    nms_threshold: float = 0.3


@dataclass(frozen=True)
class Config:
    """Root config: one object per training/inference job."""

    audio: AudioConfig = field(default_factory=AudioConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    gan: GanConfig = field(default_factory=GanConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    classifier: ClassifierConfig = field(default_factory=ClassifierConfig)
    superres: SuperResConfig = field(default_factory=SuperResConfig)
    vivit: ViViTConfig = field(default_factory=ViViTConfig)
    feature_transformer: FeatureTransformerConfig = field(default_factory=FeatureTransformerConfig)
    sentence_eval: SentenceEvalConfig = field(default_factory=SentenceEvalConfig)
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    data_root: str = "data/mvlrs_v1/main"
    preprocessed_root: str = "data/preprocessed"


def replace(cfg, **kwargs):
    """Functional update of a frozen config dataclass."""
    return dataclasses.replace(cfg, **kwargs)


def _coerce(value: str, target: Any) -> Any:
    if isinstance(target, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(target, int):
        return int(value)
    if isinstance(target, float):
        return float(value)
    if isinstance(target, tuple):
        parts = [p for p in value.strip("()[] ").split(",") if p.strip()]
        elem = target[0] if target else 0
        return tuple(_coerce(p.strip(), elem) for p in parts)
    return value


def parse_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Apply ``section.key=value`` CLI overrides to a frozen Config tree.

    Example: ``parse_overrides(cfg, ["gan.batch_size=32", "seed=1"])``.
    """
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override must be key=value, got {item!r}")
        path, value = item.split("=", 1)
        keys = path.split(".")
        # walk down, collecting objects so we can rebuild immutably
        try:
            objs = [cfg]
            for k in keys[:-1]:
                objs.append(getattr(objs[-1], k))
            leaf_owner = objs[-1]
            current = getattr(leaf_owner, keys[-1])
        except AttributeError:
            raise ValueError(f"unknown config key {path!r}") from None
        new_leaf = _coerce(value, current)
        rebuilt = dataclasses.replace(leaf_owner, **{keys[-1]: new_leaf})
        for obj, k in zip(reversed(objs[:-1]), reversed(keys[:-1])):
            rebuilt = dataclasses.replace(obj, **{k: rebuilt})
        cfg = rebuilt
    return cfg

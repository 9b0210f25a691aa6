"""Unified CLI: the reference's four entrypoints per workload
(preprocess / train / test / inference — README.md:4-8,
gan-model/README.md:20-31) as subcommands of one tool, with a single typed
config tree and ``--set section.key=value`` overrides replacing the
reference's four uncoordinated config mechanisms (SURVEY.md §5 config).

Usage examples:
  python -m lipreading_video_generation_tpu.cli preprocess-gan \
      --data-root data/mvlrs_v1/main --out data/preprocessed
  python -m lipreading_video_generation_tpu.cli train-vivit --steps 1000
  python -m lipreading_video_generation_tpu.cli train-gan --steps 10000 \
      --set gan.batch_size=32 --set gan.syncnet_wt=0.0
  python -m lipreading_video_generation_tpu.cli sample-diffusion \
      --checkpoint ckpt/ --cond-video clip.mp4 --out out.png
  python -m lipreading_video_generation_tpu.cli infer-lipsync \
      --face face.mp4 --audio speech.wav --out result.mp4
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import List

import numpy as np


def _base_parser(sub, name, help_):
    p = sub.add_parser(name, help=help_)
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   help="config override section.key=value")
    p.add_argument("--seed", type=int, default=0)
    return p


def build_config(args):
    from .core.config import Config, parse_overrides, replace

    cfg = Config()
    cfg = replace(cfg, seed=args.seed)
    return parse_overrides(cfg, args.overrides)


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache for every CLI entrypoint.

    Remote/TPU compiles take minutes; without this each CLI invocation
    re-pays them. Honors JAX_COMPILATION_CACHE_DIR if the user set one;
    defaults to ~/.cache/lvg-tpu/jax."""
    import os

    import jax

    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return  # already configured (test conftest / bench harness)
    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "lvg-tpu", "jax"),
    )
    from .utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(path, min_compile_secs=1.0)


def main(argv: List[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="lvg-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    selftest_help = ("no real binary available: write a torch-side "
                     "checkpoint in-env (torch.save, exact layout), run the "
                     "FULL port path on it, then run inference with the "
                     "ported artifact and print a JSON summary")
    p = _base_parser(sub, "port-s3fd",
                     "port the pretrained s3fd.pth face detector "
                     "(torch state_dict → Orbax params)")
    p.add_argument("--pth", default=None, help="path to s3fd.pth")
    p.add_argument("--selftest", action="store_true", help=selftest_help)
    p.add_argument("--out", required=True, help="Orbax artifact path "
                   "(feed to --s3fd-checkpoint flags)")

    p = _base_parser(sub, "port-densenet",
                     "port a torchvision densenet121 state_dict "
                     "(imagenet feature extractor) to Orbax params")
    p.add_argument("--pth", default=None,
                   help="path to densenet121 state_dict .pth")
    p.add_argument("--selftest", action="store_true", help=selftest_help)
    p.add_argument("--out", required=True, help="Orbax artifact path "
                   "(feed to --densenet-checkpoint flags)")

    p = _base_parser(sub, "port-avhubert",
                     "port a fairseq AV-HuBERT checkpoint's video encoder "
                     "(the frozen lipreading expert) to Orbax params")
    p.add_argument("--pth", default=None,
                   help="fairseq checkpoint (.pt): pretraining or fine-tuned "
                        "seq2seq layout")
    p.add_argument("--selftest", action="store_true", help=selftest_help)
    p.add_argument("--out", required=True, help="Orbax artifact path "
                   "(feed to train-gan --avhubert-checkpoint)")
    p.add_argument("--num-heads", type=int, default=None,
                   help="attention heads (not recoverable from tensor "
                        "shapes; default embed_dim // 64)")
    p.add_argument("--pos-conv-groups", type=int, default=None,
                   help="conv positional-embedding groups (default 16)")

    p = _base_parser(sub, "port-wav2vec2",
                     "port an HF wav2vec2 state_dict (the reference's "
                     "facebook/wav2vec2-base-960h diffusion audio "
                     "conditioning) to Orbax params")
    p.add_argument("--pth", default=None,
                   help="HF checkpoint (.pth/.bin torch state_dict): bare "
                        "Wav2Vec2Model or the Wav2Vec2ForCTC wrapper "
                        "-base-960h ships as")
    p.add_argument("--selftest", action="store_true", help=selftest_help)
    p.add_argument("--out", required=True, help="Orbax artifact path "
                   "(feed to train-diffusion --wav2vec2-checkpoint)")
    p.add_argument("--num-heads", type=int, default=None,
                   help="attention heads (not recoverable from tensor "
                        "shapes; default embed_dim // 64)")
    p.add_argument("--pos-conv-groups", type=int, default=None,
                   help="conv positional-embedding groups (default read "
                        "off the grouped-conv weight shape)")

    p = _base_parser(sub, "preprocess-gan", "videos → face crops + wav (offline)")
    p.add_argument("--data-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--filelist", default=None)
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--s3fd-checkpoint", default=None,
                   help="ported s3fd.pth params (port-s3fd --out); without "
                        "it the face detector is random-init")

    p = _base_parser(sub, "build-frame-index", "videos → diffusion FrameItem index")
    p.add_argument("--data-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--step", type=int, default=6)

    p = _base_parser(sub, "train-vivit", "train the ViViT lipreader")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic word clips (no dataset needed)")

    p = _base_parser(sub, "train-feature-transformer",
                     "DenseNet frame features → small transformer classifier "
                     "(the reference's Keras path: feature_extraction.py + "
                     "keras_vivit_model.py)")
    p.add_argument("--data-root", default=None,
                   help="LRS2-style tree; omit (or --synthetic) for synthetic word clips")
    p.add_argument("--max-clips", type=int, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--densenet-checkpoint", default=None,
                   help="ported torchvision densenet121 (port-densenet --out); "
                        "without it the frame embedder is random-init")
    p.add_argument("--s3fd-checkpoint", default=None,
                   help="ported s3fd.pth params for the ROI face detector")
    p.add_argument("--landmark-checkpoint", default=None,
                   help="trained lip-landmark params (train-landmark --out)")

    p = _base_parser(sub, "pack-gan-records",
                     "pre-sample GAN training windows into fixed-shape records "
                     "for the native prefetch loader")
    p.add_argument("--preprocessed-root", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--num-records", type=int, default=1000)
    p.add_argument("--synthetic", action="store_true")

    p = _base_parser(sub, "train-gan", "train the lip-sync GAN")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--preprocessed-root", default=None)
    p.add_argument("--records-root", default=None,
                   help="packed-record dir (pack-gan-records --out): stream "
                        "batches through the native C++ prefetch loader")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--syncnet-checkpoint", default=None,
                   help="pretrained frozen sync expert (train-syncnet --out) "
                        "— the reference's lipsync_expert.pth role")
    p.add_argument("--lip-expert-checkpoint", default=None,
                   help="pretrained frozen lipreading expert (train-lip-expert "
                        "--out) for the --set gan.lip_weight>0 criterion — "
                        "the reference's AV-HuBERT checkpoint role")
    p.add_argument("--avhubert-checkpoint", default=None,
                   help="ported AV-HuBERT video encoder (port-avhubert --out) "
                        "as the frozen lipreading expert (feature-matching "
                        "criterion); mutually exclusive with "
                        "--lip-expert-checkpoint")
    p.add_argument("--steps-per-dispatch", type=int, default=8,
                   help="train steps scanned per device program (amortizes "
                        "dispatch overhead; 1 = one dispatch per step)")
    p.add_argument("--synthetic", action="store_true")

    p = _base_parser(sub, "eval-gan",
                     "PSNR/SSIM/L1/sync metrics of a trained generator over "
                     "a dataset")
    p.add_argument("--checkpoint", required=True,
                   help="train-gan checkpoint dir or save_once path")
    p.add_argument("--syncnet-checkpoint", default=None)
    p.add_argument("--preprocessed-root", default=None)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--synthetic", action="store_true")

    p = _base_parser(sub, "train-syncnet", "pretrain the SyncNet expert")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--preprocessed-root", default=None,
                   help="preprocess-gan output root (color_syncnet_train.py's "
                        "Dataset root role); --eval-auc-every holds out 2 "
                        "clips for the discrimination report")
    p.add_argument("--objective", choices=("infonce_hard", "infonce", "bce"),
                   default="infonce_hard",
                   help="infonce_hard (default; in-batch contrastive with "
                        "each sample's own temporally-shifted mel as an "
                        "extra hard negative — best held-out aligned-vs-"
                        "shifted AUC), infonce (plain in-batch contrastive) "
                        "or bce (the reference's raw-cosine BCE with "
                        "within-clip shifted negatives)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval-auc-every", type=int, default=0,
                   help="report aligned-vs-shifted discrimination AUC on "
                        "held-out clips every N steps (synthetic runs hold "
                        "out 2 clips automatically)")
    p.add_argument("--out", default=None,
                   help="save trained expert params here (the in-framework "
                        "lipsync_expert.pth: feed to train-gan/eval-gan "
                        "--syncnet-checkpoint)")

    p = _base_parser(sub, "train-lip-expert",
                     "pretrain the text-conditioned lipreading expert (char seq2seq)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--preprocessed-root", default=None)
    p.add_argument("--out", default=None, help="save trained expert params here")

    p = _base_parser(sub, "pack-diffusion-records",
                     "pre-sample diffusion frame pairs into fixed-shape "
                     "records for the native prefetch loader")
    p.add_argument("--frame-index", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--num-records", type=int, default=1000)
    p.add_argument("--synthetic", action="store_true")

    p = _base_parser(sub, "train-diffusion", "train the conditional DDPM")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--frame-index", default=None)
    p.add_argument("--records-root", default=None,
                   help="packed-record dir (pack-diffusion-records --out): "
                        "stream batches through the native C++ prefetch loader")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--steps-per-dispatch", type=int, default=4,
                   help="train steps scanned per device program")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--wav2vec2-checkpoint", default=None,
                   help="ported wav2vec2 encoder (port-wav2vec2 --out): "
                        "start the audio conditioning from the reference's "
                        "pretrained facebook/wav2vec2-base-960h weights; "
                        "sets diffusion.audio_encoder=wav2vec2 + dims from "
                        "the artifact's config sidecar")

    p = _base_parser(sub, "train-landmark",
                     "train the lip-landmark regressor (MediaPipe-parity mouth crops)")
    p.add_argument("--steps", type=int, default=2000,
                   help="2000 steps reaches the round-4 proof quality "
                        "(shifted IoU 0.78, landmark_proof_r4.json)")
    p.add_argument("--out", default=None, help="save trained landmark params here")

    p = _base_parser(sub, "lipread-e2e", "LRS2 → word clips → ViViT train → sentence eval")
    p.add_argument("--data-root", required=True)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--max-clips", type=int, default=None)
    p.add_argument("--landmark-checkpoint", default=None,
                   help="trained lip-landmark params (train-landmark --out); "
                        "defaults to the geometric mouth-box estimate")
    p.add_argument("--s3fd-checkpoint", default=None,
                   help="ported s3fd.pth params (port-s3fd --out); without "
                        "it the face detector is random-init")

    p = _base_parser(sub, "sample-diffusion", "reverse-diffusion sampling")
    p.add_argument("--checkpoint", default=None,
                   help="train-diffusion checkpoint dir (latest step) or save_once path")
    p.add_argument("--no-ema", action="store_true",
                   help="sample with raw params instead of the EMA shadow")
    p.add_argument("--cond-video", default=None,
                   help="video to take the condition frame + audio from "
                        "(reference test.py:131-148 picks a dataset item)")
    p.add_argument("--cond-audio", default=None,
                   help="wav for conditioning (defaults to the video's audio)")
    p.add_argument("--frames", type=int, default=1,
                   help=">1: generate a clip — all frames denoise as one "
                        "batched trajectory (sliding per-frame audio "
                        "windows); .mp4/.avi --out is written as video")
    p.add_argument("--fps", type=float, default=25.0,
                   help="output fps when no --cond-video supplies one")
    p.add_argument("--ddim-steps", type=int, default=None,
                   help="few-step sampling: number of model forwards "
                        "over a strided timestep subsequence (e.g. 50 "
                        "instead of the full num_timesteps DDPM chain)")
    p.add_argument("--sampler", choices=("ddim", "dpmpp"), default="ddim",
                   help="few-step update rule (with --ddim-steps): ddim "
                        "(first-order) or dpmpp (DPM-Solver++(2M), "
                        "second-order multistep — same per-step cost, "
                        "~half the steps for equal ODE accuracy)")
    p.add_argument("--eta", type=float, default=0.0,
                   help="DDIM stochasticity: 0 deterministic (default), "
                        "1 DDPM-matched ancestral variance (dpmpp is "
                        "always deterministic)")
    p.add_argument("--classifier-checkpoint", default=None,
                   help="train-noisy-classifier artifact: turn on "
                        "classifier guidance (EncoderUNetModel "
                        "∇ log p(y|x_t) steers every denoise step)")
    p.add_argument("--class-label", type=int, default=0,
                   help="class to guide toward (with --classifier-checkpoint)")
    p.add_argument("--guidance-scale", type=float, default=2.0,
                   help="classifier-guidance strength s")
    p.add_argument("--sr-checkpoint", default=None,
                   help="train-superres checkpoint: two-stage cascade — "
                        "base model samples at superres.low_size (set "
                        "--set diffusion.im_size=64 to match), the "
                        "SuperResModel stage lifts to superres.im_size "
                        "(reference unet.py:678-693, never driven there)")
    p.add_argument("--sr-steps", type=int, default=None,
                   help="DDIM steps for the SR stage (default "
                        "superres.sr_inference_steps)")
    p.add_argument("--out", required=True)

    p = _base_parser(sub, "train-superres",
                     "train the SuperResModel diffusion SR stage "
                     "(low_size → im_size cascade; reference defines the "
                     "model at unet.py:678-693 but never drives it)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--frame-index", default=None,
                   help="diffusion FrameItem index for real frames; "
                        "omit for synthetic")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--steps-per-dispatch", type=int, default=4)
    p.add_argument("--synthetic", action="store_true")

    p = _base_parser(sub, "train-noisy-classifier",
                     "train the EncoderUNetModel classifier on q-sampled "
                     "noisy images for classifier-guided sampling "
                     "(guided-diffusion; reference defines the model at "
                     "unet.py:695-905 but never drives it)")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--synthetic", action="store_true",
                   help="class-k-lights-quadrant-k synthetic task")
    p.add_argument("--out", required=True,
                   help="artifact path (feed to sample-diffusion "
                        "--classifier-checkpoint)")

    p = _base_parser(sub, "infer-lipsync", "lip-sync a video to an audio track")
    p.add_argument("--face", required=True)
    p.add_argument("--audio", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="train-gan checkpoint dir (latest step) or save_once path "
                        "(reference inference.py:13-22 --checkpoint_path)")
    p.add_argument("--static", action="store_true")
    p.add_argument("--pads", type=int, nargs=4, default=[0, 10, 0, 0],
                   metavar=("PADY1", "PADY2", "PADX1", "PADX2"),
                   help="face-box padding (reference default 0 10 0 0)")
    p.add_argument("--resize-factor", type=int, default=1)
    p.add_argument("--crop", type=int, nargs=4, default=[0, -1, 0, -1],
                   metavar=("Y1", "Y2", "X1", "X2"))
    p.add_argument("--rotate", action="store_true")
    p.add_argument("--nosmooth", action="store_true")
    p.add_argument("--s3fd-checkpoint", default=None,
                   help="ported s3fd.pth params (port-s3fd --out); without "
                        "it the face detector is random-init and the "
                        "pipeline falls back to whole-frame boxes")
    p.add_argument("--int8", action="store_true",
                   help="dynamic-int8 generator matmuls (halves matmul HBM "
                        "bytes; memory lever — see ops/quant.py; quality "
                        "bound in tests)")
    p.add_argument("--int8-static", action="store_true",
                   help="int8 with static activation scales calibrated on "
                        "the first batch (drops runtime reductions; "
                        "fastest int8 mode)")

    args = parser.parse_args(argv)
    try:
        cfg = build_config(args)
    except ValueError as e:
        parser.error(str(e))
    _enable_compile_cache()

    if args.cmd in ("port-s3fd", "port-densenet", "port-avhubert",
                    "port-wav2vec2"):
        if bool(args.selftest) == bool(args.pth):
            parser.error(f"{args.cmd}: give exactly one of --pth or --selftest")

    if args.cmd == "port-s3fd":
        if args.selftest:
            import json

            from .models.selftest import selftest_s3fd

            print(json.dumps({"selftest": "port-s3fd", **selftest_s3fd(args.out)}))
            return 0
        from .models.ports import port_s3fd

        port_s3fd(args.pth, args.out)
        print(f"ported s3fd.pth → {args.out}")
        return 0

    if args.cmd == "port-densenet":
        if args.selftest:
            import json

            from .models.selftest import selftest_densenet

            print(json.dumps(
                {"selftest": "port-densenet", **selftest_densenet(args.out)}))
            return 0
        from .models.ports import port_densenet

        port_densenet(args.pth, args.out)
        print(f"ported densenet121 → {args.out}")
        return 0

    if args.cmd == "port-avhubert":
        if args.selftest:
            import json

            from .models.selftest import selftest_avhubert

            print(json.dumps(
                {"selftest": "port-avhubert", **selftest_avhubert(args.out)}))
            return 0
        from .models.ports import port_avhubert

        _, pcfg, skipped = port_avhubert(args.pth, args.out,
                                         num_heads=args.num_heads,
                                         pos_conv_groups=args.pos_conv_groups)
        print(f"ported AV-HuBERT video encoder → {args.out} "
              f"(embed {pcfg['embed_dim']}, {pcfg['num_layers']} layers, "
              f"{len(skipped)} non-video keys skipped)")
        return 0

    if args.cmd == "port-wav2vec2":
        if args.selftest:
            import json

            from .models.selftest import selftest_wav2vec2

            print(json.dumps(
                {"selftest": "port-wav2vec2", **selftest_wav2vec2(args.out)}))
            return 0
        from .models.ports import port_wav2vec2

        _, pcfg, skipped = port_wav2vec2(args.pth, args.out,
                                         num_heads=args.num_heads,
                                         pos_conv_groups=args.pos_conv_groups)
        print(f"ported wav2vec2 encoder → {args.out} "
              f"(embed {pcfg['embed_dim']}, {pcfg['num_layers']} layers, "
              f"{len(skipped)} non-encoder keys skipped)")
        return 0

    if args.cmd == "preprocess-gan":
        from .data.manifest import build_manifest, read_filelist
        from .models.ports import s3fd_params_or_init
        from .pipelines.offline_preprocess import preprocess_dataset

        filelist = read_filelist(args.filelist) if args.filelist else None
        records, skipped = build_manifest(args.data_root, filelist)
        print(f"{len(records)} clips ({skipped} skipped)")
        params = s3fd_params_or_init(args.s3fd_checkpoint)
        ok, failed = preprocess_dataset(params, records, args.out, cfg.preprocess,
                                        args.host_id, args.num_hosts)
        print(f"ok={ok} failed={failed}")
        return 0

    if args.cmd == "build-frame-index":
        from .data.datasets import build_frame_index, save_frame_index
        from .data.manifest import build_manifest

        records, _ = build_manifest(args.data_root)
        items = build_frame_index([r.video_path for r in records], step=args.step)
        save_frame_index(items, args.out)
        print(f"{len(items)} frame pairs → {args.out}")
        return 0

    if args.cmd == "train-vivit":
        from .core.metrics import ConsoleWriter, Metrics
        from .data.datasets import WordClipSampler, synthetic_word_clips
        from .pipelines import train_vivit

        clips, labels = synthetic_word_clips(n=512, num_classes=cfg.vivit.num_classes)
        sampler = WordClipSampler(clips, labels, max_frames=cfg.vivit.num_frames)
        state, best = train_vivit.train(
            cfg,
            lambda: sampler.batches(cfg.vivit.batch_size),
            lambda: sampler.batches(cfg.vivit.batch_size, shuffle=False),
            num_epochs=max(1, args.steps // max(1, len(clips) // cfg.vivit.batch_size)),
            metrics_writer=Metrics(ConsoleWriter(every=10)),
        )
        print(f"best: {best}")
        return 0

    if args.cmd == "train-feature-transformer":
        from .core.config import replace as cfg_replace
        from .core.metrics import ConsoleWriter, Metrics
        from .data.datasets import WordClipSampler, synthetic_word_clips
        from .models.ports import densenet_variables_or_init
        from .pipelines import feature_extraction

        ft = cfg.feature_transformer
        if args.synthetic or not args.data_root:
            clips, labels = synthetic_word_clips(
                n=args.max_clips or 256, t=ft.max_seq_length,
                num_classes=ft.num_classes)
            labels = np.asarray(labels, np.int32)
        else:
            from .data.manifest import build_manifest
            from .models.ports import s3fd_params_or_init
            from .pipelines.lipreading_e2e import build_word_clip_dataset

            records, _ = build_manifest(args.data_root, require_transcript=True)
            landmark_params = None
            if args.landmark_checkpoint:
                from .pipelines.train_landmark import load_params

                landmark_params = load_params(args.landmark_checkpoint)
            ds = build_word_clip_dataset(
                cfg, records,
                s3fd_params=s3fd_params_or_init(args.s3fd_checkpoint, cfg.seed),
                max_clips=args.max_clips, landmark_params=landmark_params,
            )
            if not ds.clips:
                parser.error(f"no word clips extracted from {args.data_root!r}")
            clips, labels = ds.clips, ds.labels
            ft = cfg_replace(ft, num_classes=max(2, len(ds.vocab)))
        fixer = WordClipSampler(clips, labels, ft.max_seq_length)
        stacked = np.stack([fixer._fix(c) for c in clips])   # (N, T, H, W, 1)
        variables = densenet_variables_or_init(args.densenet_checkpoint, cfg.seed)
        feats = feature_extraction.embed_frames(
            variables, stacked,
            batch_frames=min(512, len(stacked) * stacked.shape[1]))
        n_train = len(clips) - max(1, int(ft.val_split * len(clips)))
        state, val = feature_extraction.train(
            ft, feats, labels, seed=cfg.seed,
            batch_size=min(64, max(1, n_train)),
            metrics_writer=Metrics(ConsoleWriter(every=10)),
        )
        print(f"val accuracy={val['accuracy']:.4f} loss={val['loss']:.4f}")
        return 0

    if args.cmd in ("train-gan", "train-syncnet", "train-lip-expert",
                    "pack-gan-records", "eval-gan"):
        from .core.metrics import ConsoleWriter, Metrics
        from .data.datasets import GanWindowSampler, load_gan_clip, synthetic_gan_clips

        want_text = args.cmd == "train-lip-expert" or cfg.gan.lip_weight > 0
        sampler = None
        held_out_clips = None
        if getattr(args, "records_root", None) is None:
            if args.synthetic or not getattr(args, "preprocessed_root", None):
                if args.cmd == "train-syncnet":
                    # audio-visually CORRELATED clips — a sync expert trained
                    # on uncorrelated noise has nothing to learn; hold out 2
                    # clips for the discrimination AUC report. 18 train clips,
                    # not 6: with few clips the audio tower keys on per-clip
                    # f0 identity and held-out AUC plateaus ~0.70 (measured;
                    # see train_syncnet.py docstring).
                    from .data.datasets import synthetic_av_clips

                    clips = synthetic_av_clips(n_clips=20, frames=50,
                                               with_text=want_text)
                    clips, held_out_clips = clips[:-2], clips[-2:]
                elif args.cmd == "train-lip-expert":
                    # word-coded clips: the mouth's open/close rate encodes
                    # the transcript, so the char-seq2seq expert has a real
                    # video→text correspondence to learn (and its
                    # discrimination is provable — scripts/prove_lip_expert.py)
                    from .data.datasets import synthetic_word_av_clips

                    clips = synthetic_word_av_clips(n_clips=24, frames=40)
                else:
                    clips = synthetic_gan_clips(n_clips=8, frames=30,
                                                with_text=want_text)
            else:
                import os

                clips = []
                for root, dirs, files in os.walk(args.preprocessed_root):
                    if "audio.wav" in files:
                        clips.append(load_gan_clip(root))
                if (args.cmd == "train-syncnet"
                        and getattr(args, "eval_auc_every", 0)):
                    # the discrimination AUC must be held-out on real data
                    # too, not only on the synthetic path
                    if len(clips) >= 4:
                        clips, held_out_clips = clips[:-2], clips[-2:]
                    else:
                        print("warning: --eval-auc-every needs >= 4 clips "
                              "to hold 2 out; AUC report disabled")
            have_text = any(c.text for c in clips)
            if args.cmd == "train-lip-expert" and not have_text:
                parser.error(
                    "train-lip-expert needs transcripts, but no clip under "
                    "the dataset root has a text sidecar (text.txt) — "
                    "re-run preprocess-gan on LRS2-style sources with "
                    "transcripts, or use --synthetic"
                )
            sampler = GanWindowSampler(
                clips, cfg.gan.syncnet_T, seed=cfg.seed,
                with_text=want_text and have_text,
            )
        writer = Metrics(ConsoleWriter(every=10))
        if args.cmd == "pack-gan-records":
            from .data.records import write_gan_records

            spec = write_gan_records(sampler, args.out, args.num_records)
            print(f"{args.num_records} records ({spec.record_bytes} B each) → {args.out}")
            return 0
        if args.cmd == "eval-gan":
            import jax
            import jax.numpy as jnp

            from .pipelines import train_gan, train_syncnet

            key = jax.random.key(cfg.seed)
            state = train_gan.create_state(cfg.gan, key)
            state = state.replace(
                gen_params=train_gan.load_generator_params(
                    args.checkpoint, cfg.gan, key, state=state)
            )
            if args.syncnet_checkpoint:
                state = state.replace(syncnet_params=train_syncnet.load_params(
                    args.syncnet_checkpoint, cfg.gan, key))
            sums, n = {}, 0
            for _ in range(args.batches):
                batch = {k: jnp.asarray(v)
                         for k, v in sampler.sample_batch(cfg.gan.batch_size).items()}
                m = train_gan.gan_eval_step(state, batch, cfg.gan)
                for k, v in m.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                n += 1
            for k in sorted(sums):
                print(f"{k}: {sums[k] / n:.4f}")
            if not args.syncnet_checkpoint:
                print("note: eval/sync_loss used an untrained SyncNet "
                      "(pass --syncnet-checkpoint)")
            return 0
        if args.cmd == "train-lip-expert":
            import jax
            import jax.numpy as jnp

            from .pipelines import train_lip_expert

            state = train_lip_expert.create_state(
                jax.random.key(cfg.seed), syncnet_T=cfg.gan.syncnet_T,
            )
            for step in range(args.steps):
                batch = {k: jnp.asarray(v) for k, v in sampler.sample_batch(
                    cfg.gan.batch_size).items()}
                state, m = train_lip_expert.train_step(
                    state, batch, jax.random.key(cfg.seed))
                writer.write(step, m)
            if args.out:
                from .core.checkpoint import save_once

                save_once(args.out, {"lip_expert": state.params})
                print(f"saved expert → {args.out}")
            return 0
        if args.cmd == "train-gan":
            from .pipelines import train_gan

            if args.records_root is not None:
                from .data.records import iter_gan_record_batches

                it = iter_gan_record_batches(args.records_root, cfg.gan.batch_size)
                batch_fn = lambda: next(it)
            else:
                batch_fn = lambda: sampler.sample_batch(cfg.gan.batch_size)
            syncnet_params = None
            if args.syncnet_checkpoint:
                import jax

                from .pipelines import train_syncnet

                syncnet_params = train_syncnet.load_params(
                    args.syncnet_checkpoint, cfg.gan, jax.random.key(cfg.seed))
            lip_expert_params = None
            lip_expert_model = None
            if args.lip_expert_checkpoint and args.avhubert_checkpoint:
                raise SystemExit("--lip-expert-checkpoint and "
                                 "--avhubert-checkpoint are mutually exclusive")
            if args.lip_expert_checkpoint:
                import jax

                from .pipelines import train_lip_expert

                lip_expert_params = train_lip_expert.load_params(
                    args.lip_expert_checkpoint, syncnet_T=cfg.gan.syncnet_T,
                    key=jax.random.key(cfg.seed))
            elif args.avhubert_checkpoint:
                from .models.ports import load_avhubert_expert

                lip_expert_model, lip_expert_params = load_avhubert_expert(
                    args.avhubert_checkpoint)
            train_gan.train(
                cfg.gan,
                batch_fn,
                eval_batch_fn=batch_fn,
                num_steps=args.steps,
                seed=cfg.seed,
                checkpoint_dir=getattr(args, "checkpoint_dir", None),
                metrics_writer=writer,
                syncnet_params=syncnet_params,
                lip_expert_params=lip_expert_params,
                lip_expert_model=lip_expert_model,
                steps_per_dispatch=args.steps_per_dispatch,
            )
        else:
            from .pipelines import train_syncnet

            state = train_syncnet.train(
                cfg.gan,
                lambda: sampler.sample_batch(cfg.gan.batch_size),
                num_steps=args.steps,
                seed=cfg.seed,
                lr=args.lr,
                objective=args.objective,
                metrics_writer=writer,
                eval_clips=held_out_clips,
                eval_every=args.eval_auc_every,
            )
            if held_out_clips is not None:
                from .pipelines.expert_proof import alignment_scores, auc

                pos, neg = alignment_scores(
                    state.params, cfg.gan, held_out_clips, seed=cfg.seed)
                print(f"held-out discrimination AUC={auc(pos, neg):.3f} "
                      f"(aligned vs ±6-frame shifted mels)")
            if args.out:
                import jax

                from .core.checkpoint import save_once

                save_once(args.out, {"syncnet": jax.device_get(state.params)})
                print(f"saved sync expert → {args.out}")
        return 0

    if args.cmd in ("train-diffusion", "pack-diffusion-records"):
        from .core.metrics import ConsoleWriter, Metrics
        from .pipelines import train_diffusion

        d = cfg.diffusion
        if getattr(args, "wav2vec2_checkpoint", None):
            import json as _json
            import os as _os

            from .models.ports import diffusion_cfg_with_wav2vec2

            with open(_os.path.join(_os.path.abspath(args.wav2vec2_checkpoint),
                                    "wav2vec2.config.json")) as f:
                w2v_cfg = {k: (tuple(v) if isinstance(v, list) else v)
                           for k, v in _json.load(f).items()}
            d = diffusion_cfg_with_wav2vec2(d, w2v_cfg)
            cfg = replace(cfg, diffusion=d)
        if getattr(args, "records_root", None) is not None:
            from .data.records import iter_record_batches

            it = iter_record_batches(args.records_root, d.batch_size)
            batch_fn = lambda: next(it)
        elif args.synthetic or not args.frame_index:
            rng = np.random.default_rng(cfg.seed)

            class _SyntheticPairSampler:
                def sample_batch(self, n):
                    return {
                        "cond_frame": rng.integers(0, 256, (n, d.im_size, d.im_size, 3),
                                                   dtype=np.uint8),
                        "target_frame": rng.integers(0, 256, (n, d.im_size, d.im_size, 3),
                                                     dtype=np.uint8),
                        "audio": rng.standard_normal((n, d.audio_samples)).astype(np.float32),
                    }

            sampler = _SyntheticPairSampler()
            batch_fn = lambda: sampler.sample_batch(d.batch_size)
        else:
            from .data.datasets import DiffusionPairSampler, load_frame_index

            items = load_frame_index(args.frame_index)
            sampler = DiffusionPairSampler(items, d.audio_samples, d.buffer_frames)
            batch_fn = lambda: sampler.sample_batch(d.batch_size)
        if args.cmd == "pack-diffusion-records":
            from .data.records import write_diffusion_records

            spec = write_diffusion_records(sampler, args.out, args.num_records, d.im_size)
            print(f"{args.num_records} records ({spec.record_bytes} B each) → {args.out}")
            return 0
        train_diffusion.train(
            cfg.diffusion, batch_fn, num_steps=args.steps, seed=cfg.seed,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            metrics_writer=Metrics(ConsoleWriter(every=10)),
            steps_per_dispatch=args.steps_per_dispatch,
            eval_batch_fn=batch_fn,          # held-out pull from the feed
            eval_every=args.checkpoint_every,
            wav2vec2_checkpoint=getattr(args, "wav2vec2_checkpoint", None),
        )
        return 0

    if args.cmd == "train-landmark":
        from .pipelines import train_landmark

        state = train_landmark.train(
            num_steps=args.steps, seed=cfg.seed, checkpoint_dir=args.out
        )
        if args.out:
            print(f"saved landmark params → {args.out}")
        return 0

    if args.cmd == "lipread-e2e":
        from .pipelines import lipreading_e2e

        state, stats = lipreading_e2e.run(
            cfg, args.data_root, num_epochs=args.epochs, max_clips=args.max_clips,
            landmark_checkpoint=args.landmark_checkpoint,
            s3fd_checkpoint=args.s3fd_checkpoint,
        )
        print(f"word accuracy={stats.get('accuracy'):.4f} "
              f"sentence accuracy={stats.get('sentence_accuracy'):.4f}")
        return 0

    if args.cmd == "sample-diffusion":
        import jax
        import jax.numpy as jnp

        from .pipelines import sample_diffusion, train_diffusion

        d = cfg.diffusion
        state = train_diffusion.create_state(d, jax.random.key(cfg.seed))
        if args.checkpoint:
            params = train_diffusion.load_sampling_params(
                args.checkpoint, d, jax.random.key(cfg.seed), use_ema=not args.no_ema
            )
            state = state.replace(params=params)
        guidance_kw = {}
        if args.classifier_checkpoint:
            from .pipelines import train_classifier

            guidance_kw = dict(
                classifier_cfg=cfg.classifier,
                classifier_params=train_classifier.load_classifier_params(
                    args.classifier_checkpoint, cfg.classifier, d),
                class_label=args.class_label,
                guidance_scale=args.guidance_scale,
            )
        sr_params = None
        if args.sr_checkpoint:
            from .pipelines import train_superres

            if d.im_size != cfg.superres.low_size:
                parser.error(
                    f"cascade mismatch: diffusion.im_size {d.im_size} != "
                    f"superres.low_size {cfg.superres.low_size} (set "
                    "--set diffusion.im_size=64 or superres.low_size)")
            sr_params = train_superres.load_sr_params(
                args.sr_checkpoint, cfg.superres, use_ema=not args.no_ema)

        def apply_sr(x01):
            # second cascade stage: [0,1] base samples → [0,1] high-res
            return sample_diffusion.sample_superres(
                sr_params, x01, jax.random.key(cfg.seed + 1), cfg.superres,
                num_inference_steps=args.sr_steps)

        fps = args.fps
        if args.frames > 1:
            # whole-clip generation: one batched trajectory over sliding
            # per-frame audio windows (sample_diffusion.sample_video)
            from .data import video as video_io
            from .data.datasets import condition_windows_from_video

            if args.cond_video:
                cond_np, windows_np, fps = condition_windows_from_video(
                    args.cond_video, d, args.frames, audio_path=args.cond_audio
                )
            else:
                rng = np.random.default_rng(cfg.seed)
                cond_np = rng.integers(0, 256, (d.im_size, d.im_size, 3), dtype=np.uint8)
                windows_np = rng.standard_normal(
                    (args.frames, d.audio_samples)).astype(np.float32)
            from .parallel.mesh import build_mesh

            clip = np.asarray(sample_diffusion.sample_video(
                state, jnp.asarray(cond_np), jnp.asarray(windows_np),
                jax.random.key(cfg.seed), d,
                num_inference_steps=args.ddim_steps, eta=args.eta,
                sampler=args.sampler,
                mesh_spec=build_mesh(cfg.mesh),   # frames shard over the chips
                **guidance_kw,
            ))
            if sr_params is not None:
                clip = np.asarray(
                    apply_sr(jnp.asarray(clip).astype(np.float32) / 255.0)
                    * 255).astype(np.uint8)
            if args.out.endswith((".mp4", ".avi")):
                video_io.write_video(args.out, clip, fps=fps)
            else:
                import cv2

                for j, f in enumerate(clip):
                    cv2.imwrite(f"{args.out}.{j:04d}.png", f[:, :, ::-1])
            print(f"wrote {args.frames}-frame clip → {args.out}")
            return 0
        if args.cond_video:
            # condition on a real clip: first frame + the audio window just
            # before it (dataset.py:28-41 buffer_frames semantics; test.py
            # :131-148 picks a dataset item the same way)
            from .data.datasets import condition_from_video

            cond_np, audio_np = condition_from_video(
                args.cond_video, d, audio_path=args.cond_audio
            )
            cond = jnp.asarray(cond_np[None])
            audio = jnp.asarray(audio_np[None])
        else:
            rng = np.random.default_rng(cfg.seed)
            cond = jnp.asarray(rng.integers(0, 256, (1, d.im_size, d.im_size, 3), dtype=np.uint8))
            audio = jnp.asarray(rng.standard_normal((1, d.audio_samples)).astype(np.float32))
        x0, snaps = sample_diffusion.sample(
            state, cond, audio, jax.random.key(cfg.seed), d,
            num_inference_steps=args.ddim_steps, eta=args.eta,
            sampler=args.sampler, **guidance_kw)
        if sr_params is not None:
            x0 = apply_sr(x0)
        import cv2

        img = np.asarray((x0[0] * 255)).astype(np.uint8)
        cv2.imwrite(args.out, img[:, :, ::-1])
        print(f"wrote {args.out} (+{snaps.shape[0]} snapshots available)")
        return 0

    if args.cmd == "train-superres":
        from .core.metrics import ConsoleWriter, Metrics
        from .pipelines import train_superres

        s = cfg.superres
        if args.synthetic or not args.frame_index:
            rng = np.random.default_rng(cfg.seed)
            batch_fn = lambda: {  # noqa: E731
                "target_frame": rng.integers(
                    0, 256, (s.batch_size, s.im_size, s.im_size, 3),
                    dtype=np.uint8)}
        else:
            from .data.datasets import DiffusionPairSampler, load_frame_index

            items = load_frame_index(args.frame_index)
            sampler = DiffusionPairSampler(items, cfg.diffusion.audio_samples,
                                           cfg.diffusion.buffer_frames)
            batch_fn = lambda: {  # noqa: E731
                "target_frame": sampler.sample_batch(s.batch_size)["target_frame"]}
        train_superres.train(
            s, batch_fn, num_steps=args.steps, seed=cfg.seed,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            metrics_writer=Metrics(ConsoleWriter(every=10)),
            steps_per_dispatch=args.steps_per_dispatch,
        )
        return 0

    if args.cmd == "train-noisy-classifier":
        import jax

        from .pipelines import train_classifier

        if not args.synthetic:
            parser.error("train-noisy-classifier currently supports "
                         "--synthetic (labeled image datasets are external)")
        rng = np.random.default_rng(cfg.seed)
        state = train_classifier.train(
            cfg.classifier, cfg.diffusion,
            lambda: train_classifier.synthetic_batch(
                rng, cfg.classifier, cfg.diffusion),
            num_steps=args.steps, key=jax.random.key(cfg.seed))
        train_classifier.save_classifier(args.out, state)
        print(f"trained noisy classifier → {args.out} "
              f"({cfg.classifier.num_classes} classes)")
        return 0

    if args.cmd == "infer-lipsync":
        import jax

        from .models.generator import TalkingFaceGenerator
        from .models.ports import s3fd_params_or_init
        from .pipelines.inference import lipsync_video

        import jax.numpy as jnp

        if args.checkpoint:
            from .pipelines import train_gan

            gen_params = train_gan.load_generator_params(
                args.checkpoint, cfg.gan, jax.random.key(cfg.seed)
            )
        else:
            gen = TalkingFaceGenerator(width=cfg.gan.model_width)
            gen_params = gen.init(
                jax.random.key(cfg.seed),
                jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 96, 96, 6)),
            )["params"]
        from .parallel.mesh import build_mesh

        s3fd_params = s3fd_params_or_init(args.s3fd_checkpoint)
        gan_cfg = cfg.gan
        if args.int8 or args.int8_static:
            gan_cfg = dataclasses.replace(
                cfg.gan, serve_int8=True, serve_int8_static=args.int8_static)
        res = lipsync_video(gen_params, s3fd_params, args.face, args.audio, args.out,
                            gan_cfg, cfg.audio, cfg.preprocess, static_frame=args.static,
                            model_width=cfg.gan.model_width,
                            pads=tuple(args.pads), resize_factor=args.resize_factor,
                            crop=tuple(args.crop), rotate=args.rotate,
                            nosmooth=args.nosmooth,
                            mesh_spec=build_mesh(cfg.mesh))   # serving DP over the chips
        print(f"wrote {args.out} ({len(res.frames)} frames, muxed={res.muxed})")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())

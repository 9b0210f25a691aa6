"""Expert-chain FUNCTION proof: the trained sync expert discriminates, the
GAN gate opens because eval sync actually dropped, and the trained
generator's mouth tracks the audio on held-out clips.

The reference never proves this — it downloads a pretrained
``lipsync_expert.pth`` and trusts it (gan-model/train_lipreading.py:342-343);
its gate (train_lipreading.py:187-192) flips on that expert's eval loss. A
framework that trains its own expert has to demonstrate the chain works:

  phase 1  train-syncnet (infonce_hard) on audio-visually correlated clips
           → held-out aligned-vs-shifted AUC curve (bar: ≥ 0.9)
  phase 2  train-gan against the frozen trained expert
           → eval/sync_loss curve on held-out clips; the syncnet_wt gate
             must open at the step eval sync first crosses the threshold
  phase 3  held-out PSNR/SSIM first-vs-last eval (no single-batch
           memorization — eval clips are disjoint from train clips)
  phase 4  aperture↔audio-envelope Pearson r of GENERATED frames on
           held-out clips vs the ground-truth ceiling

Prints one JSON document with every curve; recorded in BENCH_NOTES.md.
Run: python scripts/prove_expert_chain.py [--cpu] [--width 0.25]
     [--sync-steps 400] [--gan-steps 2000]
tests/test_expert_chain.py asserts the same properties at a smaller scale.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=float, default=0.25)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--sync-steps", type=int, default=400)
    ap.add_argument("--gan-steps", type=int, default=2000)
    ap.add_argument("--eval-interval", type=int, default=100)
    ap.add_argument("--steps-per-dispatch", type=int, default=8)
    ap.add_argument("--gate-threshold", type=float, default=None,
                    help="override GanConfig.syncnet_gate_threshold (default "
                         "keeps the reference's 0.75)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from lipreading_video_generation_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        enable_persistent_cache(
            os.path.abspath(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                os.pardir, ".jax_cache_tpu")),
            min_compile_secs=1.0,
        )

    import numpy as np

    from lipreading_video_generation_tpu.core.config import GanConfig
    from lipreading_video_generation_tpu.data.datasets import (
        GanWindowSampler, synthetic_av_clips)
    from lipreading_video_generation_tpu.pipelines import train_gan, train_syncnet
    from lipreading_video_generation_tpu.pipelines.expert_proof import (
        alignment_scores, aperture_envelope_correlation, auc, train_val_split)

    overrides = {}
    if args.gate_threshold is not None:
        overrides["syncnet_gate_threshold"] = args.gate_threshold
    cfg = GanConfig(model_width=args.width, batch_size=args.batch,
                    dtype="float32", eval_interval=args.eval_interval,
                    checkpoint_interval=10**9, **overrides)

    clips = synthetic_av_clips(n_clips=20, frames=50)
    train_clips, val_clips = train_val_split(clips, 2)
    train_sampler = GanWindowSampler(train_clips, seed=0)
    val_sampler = GanWindowSampler(val_clips, seed=1)

    report = {"config": {"width": args.width, "batch": args.batch,
                         "gate_threshold": cfg.syncnet_gate_threshold,
                         "n_train_clips": len(train_clips),
                         "n_val_clips": len(val_clips)}}

    # ---- phase 1: expert discriminates -----------------------------------
    auc_curve = []

    class SyncRec:
        def write(self, step, m):
            if "auc" in m:
                auc_curve.append({"step": step, "loss": float(m["loss"]),
                                  "auc": float(m["auc"])})
                print(f"[sync] step {step}: loss={float(m['loss']):.4f} "
                      f"val_auc={m['auc']:.3f}", flush=True)

    t0 = time.time()
    sync_state = train_syncnet.train(
        cfg, lambda: train_sampler.sample_batch(args.batch),
        num_steps=args.sync_steps, objective="infonce_hard",
        eval_clips=val_clips, eval_every=50, metrics_writer=SyncRec())
    pos, neg = alignment_scores(sync_state.params, cfg, val_clips)
    report["phase1_syncnet"] = {
        "steps": args.sync_steps, "objective": "infonce_hard",
        "auc_curve": auc_curve, "final_heldout_auc": auc(pos, neg),
        "sec": round(time.time() - t0, 1),
    }
    print(f"[sync] final held-out AUC={report['phase1_syncnet']['final_heldout_auc']:.3f}",
          flush=True)

    # ---- phase 2+3: GAN against the frozen expert ------------------------
    eval_curve = []

    class GanRec:
        def write(self, step, m):
            if any(k.startswith("eval/") for k in m):
                row = {"step": step}
                row.update({k.split("/", 1)[1]: float(v) for k, v in m.items()
                            if k.startswith("eval/")})
                eval_curve.append(row)
                print(f"[gan] step {step}: " + " ".join(
                    f"{k}={v:.4f}" for k, v in row.items() if k != "step"),
                    flush=True)

    t0 = time.time()
    gan_state = train_gan.train(
        cfg, lambda: train_sampler.sample_batch(args.batch),
        eval_batch_fn=lambda: val_sampler.sample_batch(args.batch),
        num_steps=args.gan_steps, syncnet_params=sync_state.params,
        metrics_writer=GanRec(), steps_per_dispatch=args.steps_per_dispatch)
    gate_open = float(gan_state.syncnet_wt) > 0.0
    below = [r for r in eval_curve if r["sync_loss"] < cfg.syncnet_gate_threshold]
    report["phase2_gate"] = {
        "gan_steps": args.gan_steps,
        "eval_curve": eval_curve,
        "gate_threshold": cfg.syncnet_gate_threshold,
        "gate_open": gate_open,
        "first_below_threshold_step": below[0]["step"] + 1 if below else None,
        "final_syncnet_wt": float(gan_state.syncnet_wt),
        "sync_first": eval_curve[0]["sync_loss"] if eval_curve else None,
        "sync_last": eval_curve[-1]["sync_loss"] if eval_curve else None,
        "sec": round(time.time() - t0, 1),
    }
    report["phase3_heldout_quality"] = {
        "psnr_first": eval_curve[0]["psnr"] if eval_curve else None,
        "psnr_last": eval_curve[-1]["psnr"] if eval_curve else None,
        "ssim_first": eval_curve[0]["ssim"] if eval_curve else None,
        "ssim_last": eval_curve[-1]["ssim"] if eval_curve else None,
    }

    # ---- phase 4: generated mouths track audio on held-out clips ---------
    def gen_apply(batch):
        return train_gan.generate_step(gan_state, batch, cfg)

    corr = aperture_envelope_correlation(gen_apply, cfg, val_clips)
    report["phase4_aperture"] = corr
    print(f"[aperture] r_generated={corr['r_generated']:.3f} "
          f"r_ground_truth={corr['r_ground_truth']:.3f}", flush=True)

    ok = (
        report["phase1_syncnet"]["final_heldout_auc"] >= 0.9
        and gate_open
        and report["phase2_gate"]["sync_last"] < report["phase2_gate"]["sync_first"]
        and report["phase3_heldout_quality"]["psnr_last"]
        > report["phase3_heldout_quality"]["psnr_first"]
        and corr["r_generated"] > 0.5
    )
    report["chain_ok"] = ok
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

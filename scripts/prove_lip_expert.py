"""Lip-expert (text criterion) FUNCTION proof: the trained char-seq2seq
expert must *discriminate transcripts* on held-out clips, not just emit
finite losses — the text-side counterpart of scripts/prove_expert_chain.py.

The reference trusts a downloaded AV-HuBERT ensemble for this role
(gan-model/avhubert_utils.py:71-110, criterion at train_lipreading.py:
128-133); since this framework trains its own expert, the proof pins:

  phase 1  train-lip-expert (token-dropout teacher forcing) on word-coded
           clips — the mouth's open/close rate + peak encodes the word
           (data/datasets.synthetic_word_av_clips)
  phase 2  held-out discrimination: for every held-out clip, the seq2seq
           loss of the TRUE transcript vs every wrong word; the margin
           min(wrong) − true must be positive (bar: all clips correct,
           mean margin > 0.3)
  phase 3  the same margin on an UNTRAINED expert sits at ≈ 0 (sanity that
           the bar is meaningful)

Prints one JSON document; recorded in BENCH_NOTES.md.
Run: python scripts/prove_lip_expert.py [--cpu] [--steps 600]
Measured (TPU v5e, production scale embed 256/stem 64, 60 train clips,
3 words): 6/6 correct, margins ≈ 0.75, 308 s.
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
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-words", type=int, default=3)
    ap.add_argument("--clips", type=int, default=66)
    ap.add_argument("--batch", type=int, default=16)
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

    import jax.numpy as jnp
    import numpy as np

    from lipreading_video_generation_tpu.data.datasets import (
        GanWindowSampler, WORD_CODED_WORDS, synthetic_word_av_clips)
    from lipreading_video_generation_tpu.models import lip_expert as le
    from lipreading_video_generation_tpu.pipelines import train_lip_expert

    n_words, maxlen = args.n_words, 8
    clips = synthetic_word_av_clips(n_clips=args.clips, frames=40,
                                    n_words=n_words)
    n_val = 2 * n_words
    train_clips, val_clips = clips[:-n_val], clips[-n_val:]
    sampler = GanWindowSampler(train_clips, syncnet_T=5, seed=0,
                               with_text=True, max_text_len=maxlen)
    key = jax.random.key(0)
    state = train_lip_expert.create_state(
        key, syncnet_T=5, learning_rate=args.lr, max_text_len=maxlen)
    model = state.model

    def margins_of(params):
        """Per-held-out-clip margin min(wrong-word loss) − true-word loss
        (positive ⇒ the expert prefers the true transcript)."""
        out = []
        for c in val_clips:
            starts = range(0, len(c.frames) - 5 + 1, 3)
            wins = np.stack([c.frames[s:s + 5] for s in starts]
                            ).astype(np.float32)
            losses = {}
            for w in WORD_CODED_WORDS[:n_words]:
                toks = np.stack([le.encode_transcript(w, maxlen)] * len(wins))
                losses[w] = float(le.seq2seq_expert_loss(
                    model, params, jnp.asarray(wins), jnp.asarray(toks)))
            true = losses[c.text]
            wrong = min(v for k, v in losses.items() if k != c.text)
            out.append({"word": c.text, "margin": round(wrong - true, 4)})
        return out

    untrained = margins_of(state.params)

    t0 = time.time()
    curve = []
    for step in range(args.steps + 1):
        batch = {k: jnp.asarray(v)
                 for k, v in sampler.sample_batch(args.batch).items()
                 if k in ("window", "text_tokens")}
        state, m = train_lip_expert.train_step(state, batch, key)
        if step % 100 == 0:
            ms = margins_of(state.params)
            correct = sum(r["margin"] > 0 for r in ms)
            curve.append({"step": step, "loss": round(float(m["loss"]), 4),
                          "correct": correct, "n": n_val,
                          "mean_margin": round(
                              sum(r["margin"] for r in ms) / n_val, 4)})
            print(f"[lip-expert] step {step}: loss={curve[-1]['loss']} "
                  f"correct={correct}/{n_val} "
                  f"mean_margin={curve[-1]['mean_margin']}", flush=True)

    final = margins_of(state.params)
    mean_margin = sum(r["margin"] for r in final) / n_val
    correct = sum(r["margin"] > 0 for r in final)
    report = {
        "config": {"steps": args.steps, "lr": args.lr, "n_words": n_words,
                   "n_train_clips": len(train_clips), "n_val_clips": n_val,
                   "token_dropout": 0.3},
        "untrained_margins": untrained,
        "untrained_mean_margin": round(
            sum(r["margin"] for r in untrained) / n_val, 4),
        "curve": curve,
        "final_margins": final,
        "final_mean_margin": round(mean_margin, 4),
        "final_correct": correct,
        "sec": round(time.time() - t0, 1),
        "chain_ok": bool(correct == n_val and mean_margin > 0.3),
    }
    print(json.dumps(report))
    return 0 if report["chain_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

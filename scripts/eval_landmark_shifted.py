"""Round-4 lip-landmark experiment driver: train with a given augmentation
mode / steps, report standard + shifted-distribution IoU vs the geometric
baseline (the VERDICT r3 #4 protocol — target shifted IoU >= 0.7)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--augment", default="full",
                    choices=("full", "photometric", "none"))
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from lipreading_video_generation_tpu.models import lip_landmark as ll
    from lipreading_video_generation_tpu.pipelines import train_landmark as tl
    from lipreading_video_generation_tpu.pipelines.preprocess import mouth_box_from_face

    aug = {"full": "full", "photometric": True, "none": False}[args.augment]
    state = tl.train(num_steps=args.steps, batch_size=args.batch, lr=args.lr,
                     seed=args.seed, log_every=200, augment=aug)

    def iou(a, b):
        ay1, ay2, ax1, ax2 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
        by1, by2, bx1, bx2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        ih = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0)
        iw = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0)
        inter = ih * iw
        union = (ay2 - ay1) * (ax2 - ax1) + (by2 - by1) * (bx2 - bx1) - inter
        return float(jnp.mean(inter / jnp.maximum(union, 1e-6)))

    def oracle_boxes(pts, size):
        xs = pts[:, :2, 0] * size
        ys = pts[:, 2:, 1] * size
        from lipreading_video_generation_tpu.ops.image import expand_box_to_min_size
        box = jnp.stack([ys.min(1), ys.max(1), xs.min(1), xs.max(1)], axis=-1)
        return jax.vmap(lambda b: expand_box_to_min_size(b, 48, 48))(box)

    def eval_iou(batch_fn, n=64, size=128, seed=7):
        imgs, pts = batch_fn(jax.random.PRNGKey(seed), n, size=size)
        frames = jnp.repeat(
            jnp.clip(jnp.round(imgs * 255), 0, 255).astype(jnp.uint8), 3, axis=-1)
        face = jnp.tile(jnp.array([0.0, float(size), 0.0, float(size)]), (n, 1))
        oracle = oracle_boxes(pts, size)
        pred = ll.predict_mouth_boxes(state.params, frames, face)
        geo = jax.vmap(lambda b: mouth_box_from_face(b, 48))(face)
        return iou(pred, oracle), iou(geo, oracle)

    std_pred, std_geo = eval_iou(ll.synthetic_face_batch)
    sh_pred, sh_geo = eval_iou(ll.shifted_face_batch)
    print(json.dumps({
        "augment": args.augment, "steps": args.steps,
        "std_iou": round(std_pred, 4), "std_geo": round(std_geo, 4),
        "shifted_iou": round(sh_pred, 4), "shifted_geo": round(sh_geo, 4),
    }))


if __name__ == "__main__":
    main()

"""Loss functions for all three workloads, as pure jittable functions.

Parity map:
- ``cosine_bce_sync_loss`` ↔ get_sync_loss / cosine_loss
  (gan-model/train_lipreading.py:70-89): BCE(cosine-sim(audio_emb,
  face_emb), 1).
- ``generator_loss`` ↔ the composite G objective (train_lipreading.py:
  135-138): lip_weight·lip + syncnet_wt·sync + disc_wt·perceptual +
  (1−syncnet_wt−disc_wt)·L1.
- ``discriminator_loss`` ↔ the D real/fake BCE steps (:140-151);
  ``perceptual_adversarial_loss`` ↔ Discriminator.perceptual_forward
  (discriminator.py:42-53).
- ``noise_mse`` ↔ the diffusion ε-MSE (video-generation/diffusion/
  train.py:102-134).
- ``softmax_xent`` ↔ the ViViT CE objective (lipreading/
  huggingface_vivit_model.py:45,60).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-7


def bce(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Binary cross-entropy over probabilities (torch F.binary_cross_entropy)."""
    p = jnp.clip(pred, EPS, 1.0 - EPS)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def softmax_xent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def cosine_bce_sync_loss(audio_emb: jax.Array, face_emb: jax.Array) -> jax.Array:
    """BCE(cos-sim, 1) = -log(sim) over L2-normalized (B, 512) embeddings —
    exactly the reference numerics (train_lipreading.py:70-76 cosine_loss
    with y=ones over raw cosine similarity). SyncNet embeddings are
    post-ReLU so sim ∈ [0, 1] there; the clip only guards numerics. The
    0.75 eval gate threshold (params.py:78) is calibrated to THIS scale."""
    sim = jnp.sum(audio_emb * face_emb, axis=-1)  # embeddings are unit-norm
    sim = jnp.clip(sim, EPS, 1.0 - EPS)
    return -jnp.mean(jnp.log(sim))


def syncnet_contrastive_loss(
    audio_emb: jax.Array, face_emb: jax.Array, y: jax.Array
) -> jax.Array:
    """BCE(cos-sim, y) for SyncNet pretraining with positive/negative pairs
    (the Wav2Lip syncnet objective the reference's expert was trained
    with; y ∈ {0,1} per pair). Raw cosine similarity, reference scale."""
    sim = jnp.sum(audio_emb * face_emb, axis=-1)
    sim = jnp.clip(sim, EPS, 1.0 - EPS)
    return -jnp.mean(y * jnp.log(sim) + (1.0 - y) * jnp.log(1.0 - sim))


def perceptual_adversarial_loss(fake_pred: jax.Array) -> jax.Array:
    """Generator-side adversarial term: BCE(D(fake), 1)
    (discriminator.py:42-53)."""
    return bce(fake_pred, jnp.ones_like(fake_pred))


def discriminator_loss(real_pred: jax.Array, fake_pred: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(BCE(D(real),1), BCE(D(fake),0)) (train_lipreading.py:140-151)."""
    return bce(real_pred, jnp.ones_like(real_pred)), bce(fake_pred, jnp.zeros_like(fake_pred))


def generator_loss(
    l1_recon: jax.Array,
    sync: jax.Array,
    perceptual: jax.Array,
    lip: jax.Array,
    syncnet_wt: jax.Array,
    disc_wt: float,
    lip_weight: float,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Composite G loss (train_lipreading.py:135-138). ``syncnet_wt`` is a
    traced scalar from the train state — the mid-training 0→0.03 gate
    (params.py:78, train_lipreading.py:191-192) without config mutation."""
    total = (
        lip_weight * lip
        + syncnet_wt * sync
        + disc_wt * perceptual
        + (1.0 - syncnet_wt - disc_wt) * l1_recon
    )
    return total, {
        "loss/g_total": total,
        "loss/l1": l1_recon,
        "loss/sync": sync,
        "loss/perceptual": perceptual,
        "loss/lip": lip,
        "syncnet_wt": syncnet_wt,
    }


def noise_mse(noise_pred: jax.Array, noise: jax.Array) -> jax.Array:
    return jnp.mean((noise_pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio — the generated-frame parity metric
    (BASELINE.md north star)."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Mean structural similarity (Wang et al. 2004 defaults: 11×11
    Gaussian window σ=1.5, K1=0.01, K2=0.03) over (..., H, W, C) images.
    Local moments via two separable 1-D depthwise convolutions — MXU/VPU
    friendly, no patch extraction."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    shape = a.shape
    a = a.reshape((-1,) + shape[-3:])
    b = b.reshape((-1,) + shape[-3:])

    r = jnp.arange(11, dtype=jnp.float32) - 5.0
    w = jnp.exp(-(r**2) / (2.0 * 1.5**2))
    w = w / jnp.sum(w)

    def blur(x):
        # separable Gaussian, VALID so every window is fully supported
        c = x.shape[-1]
        kh = jnp.tile(w[:, None, None, None], (1, 1, 1, c))   # (11,1,1,C)
        kw = jnp.tile(w[None, :, None, None], (1, 1, 1, c))   # (1,11,1,C)
        dn = ("NHWC", "HWIO", "NHWC")
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                         dimension_numbers=dn, feature_group_count=c)
        return jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                            dimension_numbers=dn, feature_group_count=c)

    mu_a, mu_b = blur(a), blur(b)
    var_a = blur(a * a) - mu_a**2
    var_b = blur(b * b) - mu_b**2
    cov = blur(a * b) - mu_a * mu_b
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(s)

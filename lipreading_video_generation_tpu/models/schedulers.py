"""DDPM noise schedulers as pure, jittable dataclasses.

Parity targets (numerics regression-tested in tests/test_schedulers.py):
- ``LinearScheduler``   ↔ LinearNoiseScheduler
  (video-generation/diffusion/linear_noise_scheduler.py:6-76): compvis-style
  sqrt-space linspace betas, DDPM posterior with x0 clamp. **Canonical**
  (SURVEY.md §7 hard part #7).
- ``LinearSchedulerV2`` ↔ LinearNoiseSchedulerV2 (:79-101): alternate
  mean/variance formulation.
- ``CosineScheduler``   ↔ CosineNoiseScheduler (noise_scheduler.py:4-29):
  cos² ᾱ schedule.

All tables are host-precomputed numpy constants; ``add_noise`` /
``sample_prev_timestep`` are pure functions of (x, ε, t, key) usable inside
``jax.lax.scan`` — the sampler loop never leaves the device (fixing the
reference's 500 sequential host-driven U-Net calls, test.py:57-64).
The t==0 no-noise branch is a ``jnp.where`` on the (traced) timestep.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LinearScheduler", "LinearSchedulerV2", "CosineScheduler", "make_scheduler"]


def _bcast(coef: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-t coefficient and broadcast to an (B, 1, 1, ...) shape."""
    c = coef[t]
    return c.reshape(c.shape + (1,) * (ndim - c.ndim))


@dataclasses.dataclass(frozen=True)
class _BaseScheduler:
    num_timesteps: int
    betas: np.ndarray
    alphas: np.ndarray
    alpha_cum_prod: np.ndarray

    @property
    def sqrt_alpha_cum_prod(self) -> np.ndarray:
        return np.sqrt(self.alpha_cum_prod)

    @property
    def sqrt_one_minus_alpha_cum_prod(self) -> np.ndarray:
        return np.sqrt(1.0 - self.alpha_cum_prod)

    def add_noise(self, original: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """q-sample: x_t = √ᾱ_t x_0 + √(1-ᾱ_t) ε (linear_noise_scheduler.py:24-46)."""
        sa = _bcast(jnp.asarray(self.sqrt_alpha_cum_prod), t, original.ndim)
        so = _bcast(jnp.asarray(self.sqrt_one_minus_alpha_cum_prod), t, original.ndim)
        return sa * original + so * noise

    def pred_x0(self, xt: jax.Array, noise_pred: jax.Array, t: jax.Array) -> jax.Array:
        so = _bcast(jnp.asarray(self.sqrt_one_minus_alpha_cum_prod), t, xt.ndim)
        sa = _bcast(jnp.asarray(self.sqrt_alpha_cum_prod), t, xt.ndim)
        return jnp.clip((xt - so * noise_pred) / sa, -1.0, 1.0)

    def ddim_prev(
        self,
        xt: jax.Array,
        noise_pred: jax.Array,
        t: jax.Array,
        t_prev: jax.Array,
        key: jax.Array,
        eta: float = 0.0,
    ) -> Tuple[jax.Array, jax.Array]:
        """One DDIM update x_t → x_{t_prev} (Song et al. 2021, eq. 12) over
        an arbitrary timestep subsequence — the few-step sampling mode the
        reference's 500-sequential-forwards loop (test.py:57-64) lacks.

        Works with every scheduler here because it needs only the ᾱ table.
        ``t_prev < 0`` means "fully denoised": ᾱ_prev = 1, so the update
        returns the model's x0 prediction. ``eta`` interpolates
        deterministic DDIM (0, the default — trajectory is a pure function
        of the initial noise) to DDPM-matched ancestral variance (1).
        Returns (x_prev, x0_pred) like ``sample_prev_timestep``."""
        acp = jnp.asarray(self.alpha_cum_prod)
        acp_t = _bcast(acp, t, xt.ndim)
        final = jnp.asarray(t_prev < 0)
        final = final.reshape(final.shape + (1,) * (xt.ndim - final.ndim))
        acp_prev = jnp.where(final, 1.0, _bcast(acp, jnp.maximum(t_prev, 0), xt.ndim))
        # unclamped x0 estimate drives the update (clamped one is returned
        # for previews, matching pred_x0's convention)
        sa_t = jnp.sqrt(acp_t)
        so_t = jnp.sqrt(1.0 - acp_t)
        x0_est = (xt - so_t * noise_pred) / sa_t
        sigma = eta * jnp.sqrt(
            jnp.clip((1.0 - acp_prev) / (1.0 - acp_t), 0.0)
            * jnp.clip(1.0 - acp_t / acp_prev, 0.0)
        )
        dir_xt = jnp.sqrt(jnp.clip(1.0 - acp_prev - sigma**2, 0.0)) * noise_pred
        z = jax.random.normal(key, xt.shape, dtype=xt.dtype)
        x_prev = jnp.sqrt(acp_prev) * x0_est + dir_xt + sigma * z
        return x_prev, jnp.clip(x0_est, -1.0, 1.0)

    def dpmpp_2m_prev(
        self,
        xt: jax.Array,
        noise_pred: jax.Array,
        t: jax.Array,
        t_prev: jax.Array,
        d_prev: jax.Array,
        t_last: jax.Array,
        use_2m: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        """One DPM-Solver++(2M) update x_t → x_{t_prev} (Lu et al. 2022,
        multistep second-order, data-prediction form) over an arbitrary
        timestep subsequence — a second-order alternative to ``ddim_prev``
        that halves the model evaluations needed for the same ODE accuracy
        (the few-step serving mode; DDIM is the first-order special case).

        ``d_prev``/``t_last`` carry the PREVIOUS step's x0 prediction and
        eval timestep (the multistep history); ``use_2m`` masks the
        second-order correction off on the first step (no history) and on
        the final step to x0 (``lower_order_final`` — at ᾱ_prev = 1 the
        log-SNR step h is infinite and the correction degenerates).
        ``t_prev < 0`` means "fully denoised" exactly as in ``ddim_prev``.
        Deterministic (probability-flow ODE; no noise injection). Returns
        (x_prev, d) where d is this step's clamped x0 prediction — feed it
        back as the next step's ``d_prev``."""
        acp = jnp.asarray(self.alpha_cum_prod)
        acp_t = _bcast(acp, t, xt.ndim)
        acp_l = _bcast(acp, t_last, xt.ndim)
        final = jnp.asarray(t_prev < 0)
        final = final.reshape(final.shape + (1,) * (xt.ndim - final.ndim))
        acp_p = jnp.where(final, 1.0, _bcast(acp, jnp.maximum(t_prev, 0), xt.ndim))
        a_t, s_t = jnp.sqrt(acp_t), jnp.sqrt(1.0 - acp_t)
        a_p, s_p = jnp.sqrt(acp_p), jnp.sqrt(1.0 - acp_p)
        # λ = log(α/σ); at ᾱ_prev = 1 this is +inf, and the first-order
        # update below degenerates gracefully: σ ratio 0, expm1(−inf) = −1,
        # so x_prev = D exactly (the model's x0 prediction)
        lam_t = 0.5 * (jnp.log(acp_t) - jnp.log1p(-acp_t))
        lam_l = 0.5 * (jnp.log(acp_l) - jnp.log1p(-acp_l))
        lam_p = jnp.where(
            final, jnp.inf, 0.5 * (jnp.log(acp_p) - jnp.log1p(-acp_p)))
        h = lam_p - lam_t
        d = jnp.clip((xt - s_t * noise_pred) / a_t, -1.0, 1.0)
        # second-order correction from the multistep history (masked lanes
        # may evaluate to inf/nan — jnp.where selects, never mixes)
        r = (lam_t - lam_l) / h
        d2 = (1.0 + 0.5 / r) * d - (0.5 / r) * d_prev
        use = jnp.asarray(use_2m)
        use = use.reshape(use.shape + (1,) * (xt.ndim - use.ndim))
        du = jnp.where(use, d2, d)
        x_prev = (s_p / s_t) * xt - a_p * jnp.expm1(-h) * du
        return x_prev, d


def _compvis_betas(num_timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    return np.linspace(beta_start**0.5, beta_end**0.5, num_timesteps, dtype=np.float64) ** 2


@dataclasses.dataclass(frozen=True)
class LinearScheduler(_BaseScheduler):
    """Canonical DDPM posterior sampler (linear_noise_scheduler.py:48-76)."""

    @classmethod
    def create(cls, num_timesteps: int, beta_start: float = 0.00085, beta_end: float = 0.012):
        betas = _compvis_betas(num_timesteps, beta_start, beta_end)
        alphas = 1.0 - betas
        return cls(num_timesteps, betas, alphas, np.cumprod(alphas))

    def sample_prev_timestep(
        self, xt: jax.Array, noise_pred: jax.Array, t: jax.Array, key: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        x0 = self.pred_x0(xt, noise_pred, t)
        so = _bcast(jnp.asarray(self.sqrt_one_minus_alpha_cum_prod), t, xt.ndim)
        beta = _bcast(jnp.asarray(self.betas), t, xt.ndim)
        alpha = _bcast(jnp.asarray(self.alphas), t, xt.ndim)
        mean = (xt - beta * noise_pred / so) / jnp.sqrt(alpha)

        acp = jnp.asarray(self.alpha_cum_prod)
        acp_prev = _bcast(acp, jnp.maximum(t - 1, 0), xt.ndim)
        acp_t = _bcast(acp, t, xt.ndim)
        variance = (1.0 - acp_prev) / (1.0 - acp_t) * beta
        z = jax.random.normal(key, xt.shape, dtype=xt.dtype)
        nonzero = _bcast(jnp.asarray(np.arange(self.num_timesteps) > 0, np.float32), t, xt.ndim)
        return mean + nonzero * jnp.sqrt(variance) * z, x0


@dataclasses.dataclass(frozen=True)
class LinearSchedulerV2(_BaseScheduler):
    """Alternate formulation (linear_noise_scheduler.py:79-101) — the one
    the reference's sampling driver instantiates (test.py:111)."""

    @classmethod
    def create(cls, num_timesteps: int, beta_start: float = 0.0001, beta_end: float = 0.01):
        betas = _compvis_betas(num_timesteps, beta_start, beta_end)
        alphas = 1.0 - betas
        return cls(num_timesteps, betas, alphas, np.cumprod(alphas))

    def sample_prev_timestep(
        self, xt: jax.Array, noise_pred: jax.Array, t: jax.Array, key: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        so = _bcast(jnp.asarray(self.sqrt_one_minus_alpha_cum_prod), t, xt.ndim)
        alpha = _bcast(jnp.asarray(self.alphas), t, xt.ndim)
        beta = _bcast(jnp.asarray(self.betas), t, xt.ndim)
        acp_t = _bcast(jnp.asarray(self.alpha_cum_prod), t, xt.ndim)
        mean = xt - so * noise_pred / jnp.sqrt(alpha)
        variance = (1.0 - acp_t) * beta
        z = jax.random.normal(key, xt.shape, dtype=xt.dtype)
        x0 = self.pred_x0(xt, noise_pred, t)
        return mean + jnp.sqrt(variance) * z, x0


@dataclasses.dataclass(frozen=True)
class CosineScheduler(_BaseScheduler):
    """cos² ᾱ schedule (noise_scheduler.py:4-29)."""

    @classmethod
    def create(cls, num_timesteps: int, s: float = 0.008):
        ts = np.arange(num_timesteps, dtype=np.float64) / num_timesteps
        acp = np.cos(((ts + s) / (1 + s)) * np.pi * 0.5) ** 2
        # derive betas from consecutive ᾱ ratios for add_noise compatibility
        alphas = np.concatenate([[acp[0]], acp[1:] / acp[:-1]])
        betas = 1.0 - alphas
        return cls(num_timesteps, betas, alphas, acp)

    def sample_prev_timestep(
        self, xt: jax.Array, noise_pred: jax.Array, t: jax.Array, key: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        sa = _bcast(jnp.asarray(self.sqrt_alpha_cum_prod), t, xt.ndim)
        so = _bcast(jnp.asarray(self.sqrt_one_minus_alpha_cum_prod), t, xt.ndim)
        mean = (xt - so * noise_pred) / sa
        acp = jnp.asarray(self.alpha_cum_prod)
        acp_t = _bcast(acp, t, xt.ndim)
        acp_prev = _bcast(acp, jnp.maximum(t - 1, 0), xt.ndim)
        variance = acp_prev * (1.0 - acp_t) / jnp.maximum(1.0 - acp_prev, 1e-20)
        nonzero = _bcast(jnp.asarray(np.arange(self.num_timesteps) > 0, np.float32), t, xt.ndim)
        z = jax.random.normal(key, xt.shape, dtype=xt.dtype)
        variance = jnp.where(nonzero > 0, variance, 1e-5)
        return mean + nonzero * jnp.sqrt(variance) * z, mean


def make_scheduler(name: str, num_timesteps: int, beta_start: float, beta_end: float):
    if name == "linear":
        return LinearScheduler.create(num_timesteps, beta_start, beta_end)
    if name == "linear_v2":
        return LinearSchedulerV2.create(num_timesteps, beta_start, beta_end)
    if name == "cosine":
        return CosineScheduler.create(num_timesteps)
    raise ValueError(f"unknown scheduler {name!r}")

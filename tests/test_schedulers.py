"""Scheduler numerics regression vs independently-computed DDPM math
(tests the semantics of linear_noise_scheduler.py / noise_scheduler.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.models.schedulers import (
    CosineScheduler,
    LinearScheduler,
    LinearSchedulerV2,
    make_scheduler,
)


def test_compvis_beta_table():
    s = LinearScheduler.create(100, 0.00085, 0.012)
    want = np.linspace(0.00085**0.5, 0.012**0.5, 100) ** 2
    np.testing.assert_allclose(s.betas, want, rtol=1e-12)
    np.testing.assert_allclose(s.alpha_cum_prod, np.cumprod(1 - want), rtol=1e-12)


def test_add_noise_forward_process():
    s = LinearScheduler.create(100, 0.00085, 0.012)
    x0 = jnp.ones((2, 4, 4, 3))
    eps = jnp.full((2, 4, 4, 3), 0.5)
    t = jnp.asarray([0, 99])
    xt = np.asarray(s.add_noise(x0, eps, t))
    sa = np.sqrt(s.alpha_cum_prod)
    so = np.sqrt(1 - s.alpha_cum_prod)
    np.testing.assert_allclose(xt[0], sa[0] * 1 + so[0] * 0.5, rtol=1e-5)
    np.testing.assert_allclose(xt[1], sa[99] * 1 + so[99] * 0.5, rtol=1e-5)


def test_x0_prediction_clamped():
    s = LinearScheduler.create(50, 0.001, 0.02)
    xt = jnp.full((1, 2, 2, 1), 10.0)
    eps = jnp.zeros((1, 2, 2, 1))
    x0 = np.asarray(s.pred_x0(xt, eps, jnp.asarray([10])))
    assert (np.abs(x0) <= 1.0).all()  # clamp (linear_noise_scheduler.py:59)


def test_linear_posterior_mean_at_t0_deterministic():
    s = LinearScheduler.create(50, 0.001, 0.02)
    xt = jnp.ones((1, 2, 2, 1)) * 0.3
    eps = jnp.ones((1, 2, 2, 1)) * 0.1
    key = jax.random.key(0)
    out, x0 = s.sample_prev_timestep(xt, eps, jnp.asarray([0]), key)
    # t=0: no noise added (linear_noise_scheduler.py:64-65)
    mean = (0.3 - s.betas[0] * 0.1 / np.sqrt(1 - s.alpha_cum_prod[0])) / np.sqrt(s.alphas[0])
    np.testing.assert_allclose(np.asarray(out), mean, rtol=1e-5)


def test_linear_posterior_variance_matches_formula():
    s = LinearScheduler.create(50, 0.001, 0.02)
    t = 10
    xt = jnp.zeros((1, 2, 2, 1))
    eps = jnp.zeros((1, 2, 2, 1))
    # with zero noise_pred, out = mean + sigma*z; measure sigma via two keys
    outs = []
    for seed in range(2):
        out, _ = s.sample_prev_timestep(xt, eps, jnp.asarray([t]), jax.random.key(seed))
        outs.append(np.asarray(out))
    var_expected = (1 - s.alpha_cum_prod[t - 1]) / (1 - s.alpha_cum_prod[t]) * s.betas[t]
    # both draws should be ~N(0, var): check scale statistically (loose)
    draws = np.concatenate([o.ravel() for o in outs])
    assert 0.05 * np.sqrt(var_expected) < np.abs(draws).mean() < 4 * np.sqrt(var_expected)


def test_v2_formulation():
    s = LinearSchedulerV2.create(500, 5e-5, 0.015)   # test.py:111 config
    t = 100
    xt = jnp.ones((1, 2, 2, 1))
    eps = jnp.full((1, 2, 2, 1), 0.2)
    out, x0 = s.sample_prev_timestep(xt, eps, jnp.asarray([t]), jax.random.key(0))
    mean = 1.0 - np.sqrt(1 - s.alpha_cum_prod[t]) * 0.2 / np.sqrt(s.alphas[t])
    sigma = np.sqrt((1 - s.alpha_cum_prod[t]) * s.betas[t])
    assert np.abs(np.asarray(out).mean() - mean) < 5 * sigma
    x0_want = (1.0 - np.sqrt(1 - s.alpha_cum_prod[t]) * 0.2) / np.sqrt(s.alpha_cum_prod[t])
    np.testing.assert_allclose(np.asarray(x0), np.clip(x0_want, -1, 1), rtol=1e-4)


def test_cosine_schedule_table():
    s = CosineScheduler.create(100)
    ts = np.arange(100) / 100
    want = np.cos(((ts + 0.008) / 1.008) * np.pi / 2) ** 2
    np.testing.assert_allclose(s.alpha_cum_prod, want, rtol=1e-10)


def test_make_scheduler_dispatch():
    assert isinstance(make_scheduler("linear", 10, 1e-4, 1e-2), LinearScheduler)
    assert isinstance(make_scheduler("linear_v2", 10, 1e-4, 1e-2), LinearSchedulerV2)
    assert isinstance(make_scheduler("cosine", 10, 1e-4, 1e-2), CosineScheduler)


def test_vectorized_timesteps():
    """Per-sample t vector (the reference indexes one scalar t at a time)."""
    s = LinearScheduler.create(100, 0.00085, 0.012)
    xt = jnp.zeros((4, 2, 2, 1))
    eps = jnp.zeros((4, 2, 2, 1))
    t = jnp.asarray([0, 10, 50, 99])
    out, x0 = s.sample_prev_timestep(xt, eps, t, jax.random.key(1))
    assert out.shape == (4, 2, 2, 1)
    # t=0 row must be exactly the (zero) mean — no noise
    np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-7)


# --- DDIM (ddim_prev: few-step sampling over a strided subsequence) --------

def test_ddim_oracle_recovers_point_mass():
    """With the exact noise-predictor of a point-mass data distribution
    (x0* constant), deterministic DDIM lands on x0* from pure noise in a
    handful of strided steps — the few-step property DDPM's 500-step
    ancestral chain can't offer."""
    s = LinearScheduler.create(100, 0.00085, 0.012)
    x0_star = 0.37
    xt = jax.random.normal(jax.random.key(3), (2, 4, 4, 1))
    ts = np.arange(0, 100, 20)[::-1]          # 5 strided steps: 80..0
    ts_prev = np.concatenate([ts[1:], [-1]])
    for t, tp in zip(ts, ts_prev):
        tb = jnp.full((2,), int(t), jnp.int32)
        sa = np.sqrt(s.alpha_cum_prod[t])
        so = np.sqrt(1 - s.alpha_cum_prod[t])
        eps_oracle = (xt - sa * x0_star) / so
        xt, x0_pred = s.ddim_prev(xt, eps_oracle, tb,
                                  jnp.full((2,), int(tp), jnp.int32),
                                  jax.random.key(0), eta=0.0)
    np.testing.assert_allclose(np.asarray(xt), x0_star, atol=1e-4)


def test_ddim_eta1_consecutive_step_matches_ddpm():
    """eta=1 over consecutive timesteps IS ancestral DDPM (same mean and
    variance, Song et al. 2021 §4.1) — pinned against
    sample_prev_timestep with a shared key."""
    s = LinearScheduler.create(50, 0.001, 0.02)
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32) * 0.1)
    t = jnp.full((2,), 10, jnp.int32)
    key = jax.random.key(7)
    ddpm, _ = s.sample_prev_timestep(xt, eps, t, key)
    ddim, _ = s.ddim_prev(xt, eps, t, t - 1, key, eta=1.0)
    np.testing.assert_allclose(np.asarray(ddim), np.asarray(ddpm), rtol=2e-4,
                               atol=2e-5)


def test_ddim_final_step_returns_x0_estimate():
    """t_prev = -1 means fully denoised: the update returns the model's x0
    estimate exactly, noise-free even at eta=1."""
    s = CosineScheduler.create(40)
    rng = np.random.default_rng(1)
    xt = jnp.asarray(rng.standard_normal((1, 4, 4, 1)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 1)).astype(np.float32))
    t = jnp.full((1,), 5, jnp.int32)
    out, _ = s.ddim_prev(xt, eps, t, jnp.full((1,), -1, jnp.int32),
                         jax.random.key(0), eta=1.0)
    sa = np.sqrt(s.alpha_cum_prod[5])
    so = np.sqrt(1 - s.alpha_cum_prod[5])
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray((xt - so * eps) / sa), rtol=1e-5)


def test_ddim_eta0_key_independent():
    """Deterministic DDIM: the key must not influence the update."""
    s = LinearSchedulerV2.create(30, 0.0001, 0.01)
    xt = jnp.ones((1, 2, 2, 1)) * 0.2
    eps = jnp.ones((1, 2, 2, 1)) * 0.3
    t = jnp.full((1,), 12, jnp.int32)
    a, _ = s.ddim_prev(xt, eps, t, t - 4, jax.random.key(0), eta=0.0)
    b, _ = s.ddim_prev(xt, eps, t, t - 4, jax.random.key(99), eta=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- DPM-Solver++(2M) (dpmpp_2m_prev: second-order few-step sampling) ------

def test_dpmpp_first_order_step_equals_ddim():
    """With the second-order correction masked off, DPM-Solver++ IS
    deterministic DDIM (the exponential-integrator identity
    α_p e^{-h} = α_t σ_p / σ_t makes them algebraically equal)."""
    s = LinearScheduler.create(100, 0.00085, 0.012)
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32) * 0.3)
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32) * 0.3)
    t = jnp.full((2,), 60, jnp.int32)
    tp = jnp.full((2,), 35, jnp.int32)
    want, _ = s.ddim_prev(xt, eps, t, tp, jax.random.key(0), eta=0.0)
    got, d = s.dpmpp_2m_prev(
        xt, eps, t, tp, jnp.zeros_like(xt), t, jnp.zeros((2,), bool))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # returned history is the clamped x0 prediction
    sa = np.sqrt(s.alpha_cum_prod[60])
    so = np.sqrt(1 - s.alpha_cum_prod[60])
    np.testing.assert_allclose(
        np.asarray(d), np.clip(np.asarray((xt - so * eps) / sa), -1, 1),
        rtol=1e-5)


def test_dpmpp_final_step_returns_x0_estimate():
    """t_prev = -1 (ᾱ_prev = 1): σ ratio 0 and expm1(-∞) = -1 make the
    update return the x0 prediction exactly — no inf/nan leakage."""
    s = LinearScheduler.create(50, 0.001, 0.02)
    rng = np.random.default_rng(1)
    xt = jnp.asarray(rng.standard_normal((1, 4, 4, 1)).astype(np.float32) * 0.5)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 1)).astype(np.float32) * 0.5)
    t = jnp.full((1,), 3, jnp.int32)
    out, d = s.dpmpp_2m_prev(
        xt, eps, t, jnp.full((1,), -1, jnp.int32),
        jnp.ones_like(xt) * 0.1, jnp.full((1,), 7, jnp.int32),
        jnp.zeros((1,), bool))
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(d), rtol=1e-6)


def _gaussian_oracle_eps(s, xt, t, mu, std):
    """Exact noise-predictor of x0 ~ N(mu, std²I): for this distribution
    x_t ~ N(√ᾱ·mu, ᾱ·std² + 1-ᾱ) and ε*(x,t) = σ_t·(x - √ᾱ·mu)/(ᾱ·std² + σ_t²)."""
    acp = s.alpha_cum_prod[t]
    sa, so = np.sqrt(acp), np.sqrt(1 - acp)
    return so * (xt - sa * mu) / (acp * std**2 + (1 - acp))


def test_dpmpp_converges_faster_than_ddim_on_analytic_ode():
    """Second-order accuracy, measured: against the well-converged
    probability-flow ODE solution (400-step DDIM) of an analytic Gaussian
    score model, 10-step DPM-Solver++(2M) must land several times closer
    than 10-step DDIM from the same x_T — the property that halves serving
    model-forwards for equal quality."""
    from lipreading_video_generation_tpu.pipelines.sample_diffusion import (
        ddim_timesteps,
    )

    T = 400
    s = LinearScheduler.create(T, 0.00085, 0.012)
    mu, std = 0.3, 0.15
    x_T = jax.random.normal(jax.random.key(5), (4, 8)).astype(jnp.float32)

    def run_ddim(n_steps):
        ts = ddim_timesteps(T, n_steps)
        ts_prev = np.concatenate([ts[1:], [-1]])
        xt = x_T
        for t, tp in zip(ts, ts_prev):
            tb = jnp.full((4,), int(t), jnp.int32)
            eps = _gaussian_oracle_eps(s, xt, int(t), mu, std)
            xt, _ = s.ddim_prev(xt, eps, tb, jnp.full((4,), int(tp), jnp.int32),
                                jax.random.key(0), eta=0.0)
        return np.asarray(xt)

    def run_dpmpp(n_steps):
        ts = ddim_timesteps(T, n_steps)
        ts_prev = np.concatenate([ts[1:], [-1]])
        ts_last = np.concatenate([ts[:1], ts[:-1]])
        use2m = (np.arange(n_steps) > 0) & (ts_prev >= 0)
        xt, d_prev = x_T, jnp.zeros_like(x_T)
        for t, tp, tl, u in zip(ts, ts_prev, ts_last, use2m):
            tb = jnp.full((4,), int(t), jnp.int32)
            eps = _gaussian_oracle_eps(s, xt, int(t), mu, std)
            xt, d_prev = s.dpmpp_2m_prev(
                xt, eps, tb, jnp.full((4,), int(tp), jnp.int32), d_prev,
                jnp.full((4,), int(tl), jnp.int32), jnp.full((4,), bool(u)))
        return np.asarray(xt)

    x_ref = run_ddim(T)  # full-chain DDIM ≈ the exact ODE solution
    err_ddim = np.abs(run_ddim(10) - x_ref).mean()
    err_dpmpp = np.abs(run_dpmpp(10) - x_ref).mean()
    assert np.isfinite(err_dpmpp)
    assert err_dpmpp < 0.5 * err_ddim, (err_dpmpp, err_ddim)

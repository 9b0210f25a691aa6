"""Reverse-diffusion sampling as jitted ``lax.scan`` segments.

Capability target: sample_images (video-generation/diffusion/test.py:51-83):
xt ~ N(0,1), loop t = T−1 … 0, ε̂ = model(xt, cond), xt ← posterior sample;
x0 previews every ``snapshot_every`` steps.

The two reference inefficiencies this fixes (SURVEY.md §3.5):
1. the Python loop launches 500 sequential host→device round trips — here
   the trajectory runs as device-side ``lax.scan`` segments (one jit,
   ``segment_size`` steps per dispatch; segmenting also keeps any single
   device program under execution-watchdog limits);
2. Wav2Vec2 conditioning was re-encoded EVERY step (test.py:62) — here
   ``encode_condition`` runs once and the scan carries only xt.

x0 snapshots come back as a stacked (num_snapshots, ...) array — no
per-step host sync.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DiffusionConfig
from ..models.schedulers import make_scheduler
from ..models.unet_audio import UNetAudio
from ..ops import image as image_ops
from .train_diffusion import DiffusionTrainState, normalize_audio


@functools.partial(jax.jit, static_argnames=("cfg", "use_ema"))
def encode_condition(
    state: DiffusionTrainState,
    cond_frame_uint8: jax.Array,
    audio_wave: jax.Array,
    cfg: DiffusionConfig,
    use_ema: bool = False,
) -> jax.Array:
    model = UNetAudio(cfg)
    params = state.ema_params if use_ema else state.params
    cond_img = image_ops.normalize_uint8(
        image_ops.resize(cond_frame_uint8, (cfg.im_size, cfg.im_size)), symmetric=True
    )
    return model.apply({"params": params}, normalize_audio(audio_wave), cond_img,
                       method=UNetAudio.encode_condition)


def _guided_eps(eps, xt, tb, scheduler, clf_cfg, guidance):
    """Classifier guidance (guided-diffusion): steer the noise prediction
    with the classifier's score, ε' = ε − s·√(1−ᾱ_t)·∇_{x_t} log p(y|x_t)
    — equivalent to adding s·Σ·∇log p(y|x) to the posterior mean. The
    classifier is an ``EncoderUNetModel`` trained on q-sampled noisy
    images (pipelines/train_classifier.py); reference surface:
    video-generation/diffusion/unet.py:695-905 (defined, never driven)."""
    from .train_classifier import make_classifier

    model = make_classifier(clf_cfg)
    y = guidance["label"]

    def logp(x):
        logits = model.apply({"params": guidance["params"]}, x, tb)
        lsm = jax.nn.log_softmax(logits, axis=-1)
        return jnp.sum(lsm[jnp.arange(x.shape[0]), y])

    grad = jax.grad(logp)(xt)
    so = jnp.asarray(scheduler.sqrt_one_minus_alpha_cum_prod)[tb]
    so = so.reshape((-1,) + (1,) * (xt.ndim - 1))
    return eps - guidance["scale"] * so * grad


@functools.partial(jax.jit, static_argnames=("cfg", "use_ema", "clf_cfg"))
def _scan_segment(
    state: DiffusionTrainState,
    xt: jax.Array,
    cond_map: jax.Array,
    ts: jax.Array,          # (seg,) descending timesteps
    key: jax.Array,
    cfg: DiffusionConfig,
    use_ema: bool = False,
    clf_cfg=None,
    guidance=None,          # {"params", "label", "scale"} when clf_cfg set
) -> Tuple[jax.Array, jax.Array]:
    scheduler = make_scheduler(cfg.scheduler, cfg.num_timesteps, cfg.beta_start, cfg.beta_end)
    model = UNetAudio(cfg)
    params = state.ema_params if use_ema else state.params
    b = xt.shape[0]

    def step(carry, t):
        xt = carry
        tb = jnp.full((b,), t, jnp.int32)
        eps = model.apply({"params": params}, xt, cond_map, tb, method=UNetAudio.denoise)
        if clf_cfg is not None:
            eps = _guided_eps(eps, xt, tb, scheduler, clf_cfg, guidance)
        xt_prev, x0 = scheduler.sample_prev_timestep(xt, eps, tb, jax.random.fold_in(key, t))
        return xt_prev, x0

    return jax.lax.scan(step, xt, ts)


@functools.partial(jax.jit, static_argnames=("cfg", "eta", "use_ema", "clf_cfg"))
def _scan_segment_ddim(
    state: DiffusionTrainState,
    xt: jax.Array,
    cond_map: jax.Array,
    ts: jax.Array,          # (seg,) descending subsequence timesteps
    ts_prev: jax.Array,     # (seg,) each step's target timestep (-1 = x0)
    key: jax.Array,
    cfg: DiffusionConfig,
    eta: float = 0.0,
    use_ema: bool = False,
    clf_cfg=None,
    guidance=None,
) -> Tuple[jax.Array, jax.Array]:
    """DDIM segment: like ``_scan_segment`` but each scan step jumps
    t → t_prev over the strided subsequence (``Scheduler.ddim_prev``),
    so ``num_inference_steps`` model forwards replace ``num_timesteps``."""
    scheduler = make_scheduler(cfg.scheduler, cfg.num_timesteps, cfg.beta_start, cfg.beta_end)
    model = UNetAudio(cfg)
    params = state.ema_params if use_ema else state.params
    b = xt.shape[0]

    def step(carry, t_pair):
        xt = carry
        t, t_prev = t_pair
        tb = jnp.full((b,), t, jnp.int32)
        eps = model.apply({"params": params}, xt, cond_map, tb, method=UNetAudio.denoise)
        if clf_cfg is not None:
            eps = _guided_eps(eps, xt, tb, scheduler, clf_cfg, guidance)
        xt_prev, x0 = scheduler.ddim_prev(
            xt, eps, tb, jnp.full((b,), t_prev, jnp.int32),
            jax.random.fold_in(key, t), eta=eta)
        return xt_prev, x0

    return jax.lax.scan(step, xt, (ts, ts_prev))


@functools.partial(jax.jit, static_argnames=("cfg", "use_ema", "clf_cfg"))
def _scan_segment_dpmpp(
    state: DiffusionTrainState,
    xt: jax.Array,
    d_prev: jax.Array,      # previous step's x0 prediction (multistep history)
    cond_map: jax.Array,
    ts: jax.Array,          # (seg,) descending subsequence timesteps
    ts_prev: jax.Array,     # (seg,) each step's target timestep (-1 = x0)
    ts_last: jax.Array,     # (seg,) each step's PREVIOUS eval timestep
    use_2m: jax.Array,      # (seg,) bool: apply the second-order correction
    cfg: DiffusionConfig,
    use_ema: bool = False,
    clf_cfg=None,
    guidance=None,
) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
    """DPM-Solver++(2M) segment: second-order multistep ODE solver — same
    per-step cost as DDIM (one model forward) at roughly half the steps for
    equal accuracy. The (xt, d_prev) carry crosses segment boundaries so
    chunking the trajectory doesn't reset the multistep history."""
    scheduler = make_scheduler(cfg.scheduler, cfg.num_timesteps, cfg.beta_start, cfg.beta_end)
    model = UNetAudio(cfg)
    params = state.ema_params if use_ema else state.params
    b = xt.shape[0]

    def step(carry, x):
        xt, d_prev = carry
        t, t_prev, t_last, second = x
        tb = jnp.full((b,), t, jnp.int32)
        eps = model.apply({"params": params}, xt, cond_map, tb, method=UNetAudio.denoise)
        if clf_cfg is not None:
            eps = _guided_eps(eps, xt, tb, scheduler, clf_cfg, guidance)
        xt_prev, d = scheduler.dpmpp_2m_prev(
            xt, eps, tb, jnp.full((b,), t_prev, jnp.int32), d_prev,
            jnp.full((b,), t_last, jnp.int32), second)
        return (xt_prev, d), d

    return jax.lax.scan(step, (xt, d_prev), (ts, ts_prev, ts_last, use_2m))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sampler", "num_steps", "eta", "use_ema",
                     "clf_cfg", "snapshot_every", "out_uint8"),
)
def _sample_fused(
    state: DiffusionTrainState,
    cond_frame_uint8: jax.Array,
    audio_wave: jax.Array,
    key: jax.Array,
    cfg: DiffusionConfig,
    sampler: str,
    num_steps: int,         # static: the timestep subsequence is baked into
                            # the program as constants (4 fewer host→device
                            # transfers per image — relay round trips)
    eta: float = 0.0,
    use_ema: bool = False,
    clf_cfg=None,
    guidance=None,
    snapshot_every: int = 50,
    out_uint8: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """The whole few-step trajectory as ONE device program: conditioning
    encode + initial noise draw + N-step scan + final clip/rescale. The
    segmented path pays a dispatch for ``encode_condition``, one per scan
    segment, and ~6 eager dispatches for the [-1,1]→[0,1] rescale — ~80 ms
    of fixed per-image cost that is invisible at T=500 but dominates at
    N=20–50 (bench_summary_r4: DPM++-20 ran at 66.8 steps/s vs the DDPM
    chain's 102). Few-step sampling is the production latency surface
    (reference: video-generation/diffusion/test.py:51-83 runs the full 500
    host-driven forwards); here it is one dispatch + one fetch.

    PRNG/key handling replicates ``_sample_impl`` exactly (k0 → initial
    noise, fold_in(kloop, t) per step), so the fused and segmented paths
    produce the same trajectory (pinned in tests/test_pipelines.py).
    """
    ts_np = ddim_timesteps(cfg.num_timesteps, num_steps)
    ts_prev_np = np.concatenate([ts_np[1:], [-1]])
    ts = jnp.asarray(ts_np)
    ts_prev = jnp.asarray(ts_prev_np)
    ts_last = jnp.asarray(np.concatenate([ts_np[:1], ts_np[:-1]]))
    use_2m = jnp.asarray((np.arange(num_steps) > 0) & (ts_prev_np >= 0))
    model = UNetAudio(cfg)
    params = state.ema_params if use_ema else state.params
    scheduler = make_scheduler(cfg.scheduler, cfg.num_timesteps, cfg.beta_start,
                               cfg.beta_end)
    cond_img = image_ops.normalize_uint8(
        image_ops.resize(cond_frame_uint8, (cfg.im_size, cfg.im_size)),
        symmetric=True)
    cond_map = model.apply({"params": params}, normalize_audio(audio_wave),
                           cond_img, method=UNetAudio.encode_condition)
    b = cond_frame_uint8.shape[0]
    k0, kloop = jax.random.split(key)
    xt = jax.random.normal(k0, (b, cfg.im_size, cfg.im_size, cfg.im_channels))

    def model_eps(xt, tb):
        eps = model.apply({"params": params}, xt, cond_map, tb,
                          method=UNetAudio.denoise)
        if clf_cfg is not None:
            eps = _guided_eps(eps, xt, tb, scheduler, clf_cfg, guidance)
        return eps

    if sampler == "dpmpp":
        def step(carry, x):
            xt, d_prev = carry
            t, t_prev, t_last, second = x
            tb = jnp.full((b,), t, jnp.int32)
            eps = model_eps(xt, tb)
            xt_prev, d = scheduler.dpmpp_2m_prev(
                xt, eps, tb, jnp.full((b,), t_prev, jnp.int32), d_prev,
                jnp.full((b,), t_last, jnp.int32), second)
            return (xt_prev, d), d

        (xt, _), x0_traj = jax.lax.scan(
            step, (xt, jnp.zeros_like(xt)), (ts, ts_prev, ts_last, use_2m))
    else:
        def step(carry, t_pair):
            xt = carry
            t, t_prev = t_pair
            tb = jnp.full((b,), t, jnp.int32)
            eps = model_eps(xt, tb)
            xt_prev, x0 = scheduler.ddim_prev(
                xt, eps, tb, jnp.full((b,), t_prev, jnp.int32),
                jax.random.fold_in(kloop, t), eta=eta)
            return xt_prev, x0

        xt, x0_traj = jax.lax.scan(step, xt, (ts, ts_prev))

    final = (jnp.clip(xt, -1.0, 1.0) + 1.0) / 2.0
    if out_uint8:
        # serving format (sample_video): convert on-device so the host
        # fetch is 4x smaller — the fetch is most of the fixed per-image
        # cost at few-step counts
        final = jnp.clip(jnp.round(final * 255.0), 0, 255).astype(jnp.uint8)
    snapshots = (jnp.clip(x0_traj[::snapshot_every], -1.0, 1.0) + 1.0) / 2.0
    return final, snapshots


def sample(
    state: DiffusionTrainState,
    cond_frame_uint8: jax.Array,   # (B, h, w, 3) uint8 condition frame
    audio_wave: jax.Array,         # (B, samples) raw waveform
    key: jax.Array,
    cfg: DiffusionConfig,
    snapshot_every: int = 50,
    use_ema: bool = False,
    segment_size: int = 50,
    num_inference_steps: int | None = None,
    eta: float = 0.0,
    mesh_spec=None,
    sampler: str = "ddim",
    classifier_cfg=None,
    classifier_params=None,
    class_label: int | jax.Array | None = None,
    guidance_scale: float = 1.0,
    fused: bool | None = None,
    out_uint8: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (x0 (B, H, W, 3) in [0,1] float — or uint8 with
    ``out_uint8``, converted on-device so serving fetches 4x fewer bytes —
    and snapshots (S, B, H, W, 3) float).
    ``use_ema`` samples with the EMA shadow params (utils.py:92-102).

    ``classifier_cfg`` + ``classifier_params`` + ``class_label`` turn on
    classifier guidance: every denoise step's ε is shifted by
    −scale·√(1−ᾱ_t)·∇_{x_t} log p(y|x_t) from the EncoderUNetModel
    classifier (train-noisy-classifier). Works with all three samplers.

    ``num_inference_steps`` < ``cfg.num_timesteps`` switches to few-step
    sampling over a strided timestep subsequence — e.g. 50 model forwards
    instead of the reference's 500 (test.py:57-64) for near-equal sample
    quality; ``eta`` = 0 is deterministic DDIM, 1 matches DDPM ancestral
    variance. ``sampler`` picks the few-step update rule: "ddim"
    (first-order) or "dpmpp" (DPM-Solver++(2M), second-order multistep —
    same per-step cost, roughly half the steps for equal ODE accuracy;
    always deterministic, ``eta`` ignored).

    ``fused`` overrides the single-dispatch routing: few-step chains up to
    ``_FUSED_MAX_STEPS`` run as ONE device program (encode + scan + rescale
    — ``_sample_fused``) by default; ``fused=False`` forces the segmented
    dispatch (used by tests to pin the two paths' equivalence).

    ``mesh_spec`` runs the whole trajectory data-parallel over the mesh —
    the serving analog of the trainers' mesh wiring: the batch axis (the
    frames of a clip, for ``sample_video``) shards over the ``data`` axis
    and params place through the public ``shard_params`` policy. The PRNG
    draws are sharding-independent, so results match the single-device
    trajectory."""
    import contextlib

    if num_inference_steps is not None and num_inference_steps < 1:
        raise ValueError(
            f"num_inference_steps must be >= 1, got {num_inference_steps}")
    if sampler not in ("ddim", "dpmpp"):
        raise ValueError(f"unknown sampler {sampler!r} (ddim | dpmpp)")
    if (classifier_cfg is None) != (classifier_params is None):
        raise ValueError("classifier guidance needs both classifier_cfg and "
                         "classifier_params")
    if classifier_cfg is not None and class_label is None:
        raise ValueError("classifier guidance needs class_label")
    if classifier_cfg is not None:
        lbl = np.asarray(class_label)
        if lbl.min() < 0 or lbl.max() >= classifier_cfg.num_classes:
            # jit gathers clamp out-of-range indices silently — guidance
            # would steer toward the wrong class with no error
            raise ValueError(
                f"class_label {class_label} out of range for "
                f"{classifier_cfg.num_classes}-class classifier")
    mesh_ctx = contextlib.nullcontext()
    b = cond_frame_uint8.shape[0]
    n_pad = 0
    if mesh_spec is not None:
        from ..parallel.mesh import shard_batch, shard_state

        # pad the batch to a data-axis multiple (serving mustn't constrain
        # the caller's frame count); sliced back off below. The padded rows
        # don't perturb the real ones: threefry fills draws by flat index,
        # so the leading b rows of every padded PRNG draw equal the
        # unpadded draw's.
        n_pad = (-b) % mesh_spec.data_size
        if n_pad:
            cond_frame_uint8 = jnp.concatenate(
                [cond_frame_uint8,
                 jnp.repeat(cond_frame_uint8[-1:], n_pad, axis=0)])
            audio_wave = jnp.concatenate(
                [audio_wave, jnp.repeat(audio_wave[-1:], n_pad, axis=0)])
        mesh_ctx = mesh_spec.mesh
        state = shard_state(mesh_spec, state)
        # device_put reshards device-resident arrays directly — no host hop
        cond_frame_uint8 = shard_batch(mesh_spec, cond_frame_uint8)
        audio_wave = shard_batch(mesh_spec, audio_wave)
    with mesh_ctx:
        x0, snaps = _sample_impl(
            state, cond_frame_uint8, audio_wave, key, cfg, snapshot_every,
            use_ema, segment_size, num_inference_steps, eta, mesh_spec,
            sampler, classifier_cfg, classifier_params, class_label,
            guidance_scale, fused, out_uint8,
        )
    if out_uint8 and x0.dtype != jnp.uint8:
        # non-fused paths produce float [0,1]; convert in one extra dispatch
        x0 = image_ops.denormalize_to_uint8(x0)
    if n_pad:
        x0, snaps = x0[:b], snaps[:, :b]
    return x0, snaps


def ddim_timesteps(num_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """The strided DDIM timestep subsequence: exactly ``num_inference_steps``
    distinct timesteps in [0, num_timesteps), descending. Uses a fractional
    stride floored per index (consecutive floors are distinct because the
    spacing T/N >= 1); an integer floor-divided stride would run
    ceil(T / (T // N)) steps — more than asked whenever N doesn't divide T
    (e.g. T=500, N=300 would silently run the full 500-step chain)."""
    return (np.arange(num_inference_steps)
            * (num_timesteps / num_inference_steps)).astype(np.int64)[::-1]


def _make_guidance(classifier_cfg, classifier_params, class_label,
                   guidance_scale, b):
    if classifier_cfg is None:
        return None
    return {"params": classifier_params,
            "label": jnp.broadcast_to(
                jnp.asarray(class_label, jnp.int32), (b,)),
            "scale": jnp.float32(guidance_scale)}


# Few-step chains up to this length run as one fused device program
# (_sample_fused). Longer chains keep the segmented dispatch so no single
# device program outgrows execution-watchdog limits; their fixed overhead
# amortizes over hundreds of steps anyway.
_FUSED_MAX_STEPS = 128


def _sample_impl(
    state, cond_frame_uint8, audio_wave, key, cfg, snapshot_every,
    use_ema, segment_size, num_inference_steps, eta, mesh_spec=None,
    sampler="ddim", classifier_cfg=None, classifier_params=None,
    class_label=None, guidance_scale=1.0, fused=None, out_uint8=False,
) -> Tuple[jax.Array, jax.Array]:
    b = cond_frame_uint8.shape[0]
    few_step = (num_inference_steps is not None
                and num_inference_steps < cfg.num_timesteps)
    dpmpp = few_step and sampler == "dpmpp"
    if few_step:
        ts_all = ddim_timesteps(cfg.num_timesteps, num_inference_steps)
        ts_prev_all = np.concatenate([ts_all[1:], [-1]])
        # multistep history: each step's previous EVAL timestep; the
        # second-order correction is off on the first step (no history)
        # and the final step to x0 (lower_order_final: h is infinite there)
        ts_last_all = np.concatenate([ts_all[:1], ts_all[:-1]])
        use_2m_all = (np.arange(len(ts_all)) > 0) & (ts_prev_all >= 0)
        want_fused = (fused if fused is not None
                      else len(ts_all) <= _FUSED_MAX_STEPS)
        if want_fused and mesh_spec is None:
            # single-dispatch path: the whole chain (encode + scan + final
            # rescale) is one device program — see _sample_fused
            return _sample_fused(
                state, cond_frame_uint8, audio_wave, key,
                cfg, sampler, len(ts_all), eta, use_ema, classifier_cfg,
                _make_guidance(classifier_cfg, classifier_params, class_label,
                               guidance_scale, b),
                snapshot_every, out_uint8)
    else:
        ts_all = np.arange(cfg.num_timesteps - 1, -1, -1)

    cond_map = encode_condition(state, cond_frame_uint8, audio_wave, cfg, use_ema)
    guidance = _make_guidance(classifier_cfg, classifier_params, class_label,
                              guidance_scale, b)
    k0, kloop = jax.random.split(key)
    xt = jax.random.normal(k0, (b, cfg.im_size, cfg.im_size, cfg.im_channels))
    if mesh_spec is not None:
        from ..parallel.mesh import batch_sharding

        xt = jax.device_put(xt, batch_sharding(mesh_spec, xt.ndim))
    seg = max(1, min(segment_size, len(ts_all)))
    # full-size segments share one compiled program; a trailing remainder
    # segment (different static length) compiles once more at most.
    snaps = []
    d_prev = jnp.zeros_like(xt)
    for i in range(0, len(ts_all), seg):
        chunk = jnp.asarray(ts_all[i : i + seg])
        if dpmpp:
            (xt, d_prev), x0_traj = _scan_segment_dpmpp(
                state, xt, d_prev, cond_map, chunk,
                jnp.asarray(ts_prev_all[i : i + seg]),
                jnp.asarray(ts_last_all[i : i + seg]),
                jnp.asarray(use_2m_all[i : i + seg]), cfg, use_ema,
                classifier_cfg, guidance)
        elif few_step:
            prev_chunk = jnp.asarray(ts_prev_all[i : i + seg])
            xt, x0_traj = _scan_segment_ddim(
                state, xt, cond_map, chunk, prev_chunk, kloop, cfg, eta,
                use_ema, classifier_cfg, guidance)
        else:
            xt, x0_traj = _scan_segment(state, xt, cond_map, chunk, kloop, cfg,
                                        use_ema, classifier_cfg, guidance)
        snaps.append(x0_traj[::snapshot_every])
    if not snaps:
        return _finalize(xt, [jnp.zeros((0,) + xt.shape, xt.dtype)])
    return _finalize(xt, snaps)


@jax.jit
def _finalize(xt, snaps):
    """Concat + [-1,1]→[0,1] rescale as one dispatch (eager jnp ops here
    would each pay a relay round trip — ~6 dispatches on the old path)."""
    snapshots = jnp.concatenate(snaps, axis=0)
    final = (jnp.clip(xt, -1.0, 1.0) + 1.0) / 2.0
    snapshots = (jnp.clip(snapshots, -1.0, 1.0) + 1.0) / 2.0
    return final, snapshots


@functools.partial(jax.jit, static_argnames=("cfg", "eta"))
def _sr_fused(sr_params, low_sym, key, ts, ts_prev, cfg, eta=0.0):
    """Whole SR few-step chain as ONE device program (draw + DDIM scan +
    rescale) — same single-dispatch shape as ``_sample_fused``."""
    from .train_superres import make_sr_model

    model = make_sr_model(cfg)
    scheduler = make_scheduler(cfg.scheduler, cfg.num_timesteps,
                               cfg.beta_start, cfg.beta_end)
    b = low_sym.shape[0]
    k0, kloop = jax.random.split(key)
    xt = jax.random.normal(k0, (b, cfg.im_size, cfg.im_size, cfg.im_channels))

    def step(carry, t_pair):
        xt = carry
        t, t_prev = t_pair
        tb = jnp.full((b,), t, jnp.int32)
        eps = model.apply({"params": sr_params}, xt, low_sym, tb)
        xt_prev, x0 = scheduler.ddim_prev(
            xt, eps, tb, jnp.full((b,), t_prev, jnp.int32),
            jax.random.fold_in(kloop, t), eta=eta)
        return xt_prev, x0

    xt, _ = jax.lax.scan(step, xt, (ts, ts_prev))
    return (jnp.clip(xt, -1.0, 1.0) + 1.0) / 2.0


@functools.partial(jax.jit, static_argnames=("cfg", "eta"))
def _sr_segment(sr_params, xt, low_sym, key, ts, ts_prev, cfg, eta=0.0):
    from .train_superres import make_sr_model

    model = make_sr_model(cfg)
    scheduler = make_scheduler(cfg.scheduler, cfg.num_timesteps,
                               cfg.beta_start, cfg.beta_end)
    b = low_sym.shape[0]

    def step(carry, t_pair):
        xt = carry
        t, t_prev = t_pair
        tb = jnp.full((b,), t, jnp.int32)
        eps = model.apply({"params": sr_params}, xt, low_sym, tb)
        xt_prev, x0 = scheduler.ddim_prev(
            xt, eps, tb, jnp.full((b,), t_prev, jnp.int32),
            jax.random.fold_in(key, t), eta=eta)
        return xt_prev, x0

    return jax.lax.scan(step, xt, (ts, ts_prev))


def sample_superres(
    sr_params,
    low01: jax.Array,               # (B, low, low, C) in [0, 1]
    key: jax.Array,
    cfg,                            # SuperResConfig
    num_inference_steps: int | None = None,
    eta: float = 0.0,
) -> jax.Array:
    """Low-res samples → high-res (B, im_size, im_size, C) in [0, 1]:
    the second stage of the guided-diffusion cascade, driving
    ``SuperResModel`` (reference unet.py:678-693, never driven there).
    Few-step DDIM over the strided subsequence; one device program when the
    chain fits (the serving default, cfg.sr_inference_steps=50)."""
    steps = num_inference_steps or cfg.sr_inference_steps
    ts_all = ddim_timesteps(cfg.num_timesteps, min(steps, cfg.num_timesteps))
    ts_prev_all = np.concatenate([ts_all[1:], [-1]])
    low_sym = low01.astype(jnp.float32) * 2.0 - 1.0
    if len(ts_all) <= _FUSED_MAX_STEPS:
        return _sr_fused(sr_params, low_sym, key, jnp.asarray(ts_all),
                         jnp.asarray(ts_prev_all), cfg, eta)
    k0, kloop = jax.random.split(key)
    b = low_sym.shape[0]
    xt = jax.random.normal(k0, (b, cfg.im_size, cfg.im_size, cfg.im_channels))
    for i in range(0, len(ts_all), _FUSED_MAX_STEPS):
        xt, _ = _sr_segment(
            sr_params, xt, low_sym, kloop,
            jnp.asarray(ts_all[i:i + _FUSED_MAX_STEPS]),
            jnp.asarray(ts_prev_all[i:i + _FUSED_MAX_STEPS]), cfg, eta)
    return (jnp.clip(xt, -1.0, 1.0) + 1.0) / 2.0


def sample_cascade(
    state: DiffusionTrainState,
    cond_frame_uint8: jax.Array,
    audio_wave: jax.Array,
    key: jax.Array,
    cfg: DiffusionConfig,
    sr_params,
    sr_cfg,
    num_inference_steps: int | None = None,
    sr_inference_steps: int | None = None,
    use_ema: bool = False,
    sampler: str = "ddim",
    **sample_kwargs,
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage cascade: base model samples at ``cfg.im_size`` (==
    ``sr_cfg.low_size``), the SR stage lifts to ``sr_cfg.im_size``.
    Returns (high01, low01). The guided-diffusion deployment pattern the
    reference's SuperResModel was written for."""
    if cfg.im_size != sr_cfg.low_size:
        raise ValueError(
            f"cascade mismatch: base im_size {cfg.im_size} != SR low_size "
            f"{sr_cfg.low_size}")
    k_base, k_sr = jax.random.split(key)
    low01, _ = sample(state, cond_frame_uint8, audio_wave, k_base, cfg,
                      num_inference_steps=num_inference_steps,
                      use_ema=use_ema, sampler=sampler, **sample_kwargs)
    high01 = sample_superres(sr_params, low01, k_sr, sr_cfg,
                             num_inference_steps=sr_inference_steps)
    return high01, low01


def sample_video(
    state: DiffusionTrainState,
    cond_frame_uint8: jax.Array,   # (h, w, 3) uint8 — one condition frame
    audio_windows: jax.Array,      # (T, samples) per-target-frame slices
    key: jax.Array,
    cfg: DiffusionConfig,
    use_ema: bool = False,
    segment_size: int = 50,
    num_inference_steps: int | None = None,
    eta: float = 0.0,
    mesh_spec=None,
    sampler: str = "ddim",
    classifier_cfg=None,
    classifier_params=None,
    class_label=None,
    guidance_scale: float = 1.0,
) -> jax.Array:
    """Generate a T-frame clip: (T, im_size, im_size, 3) uint8.

    Frames are conditionally independent given the (first-frame, audio
    window) pairs the model was trained on (dataset.py:105-130), so the
    whole clip denoises as ONE batched trajectory — one ``sample`` call at
    batch=T instead of T sequential 500-step loops (the reference's
    test.py:51-83 samples a single frame per full loop). Per-frame xt is
    seeded independently by the batched normal draw.

    ``mesh_spec`` shards the clip's frames over the mesh ``data`` axis —
    an n-chip clip generates n× faster (see ``sample``)."""
    t = audio_windows.shape[0]
    cond = jnp.broadcast_to(cond_frame_uint8[None], (t,) + tuple(cond_frame_uint8.shape))
    x0, _ = sample(
        state, cond, audio_windows, key, cfg,
        snapshot_every=cfg.num_timesteps + 1,   # no snapshots needed
        use_ema=use_ema, segment_size=segment_size,
        num_inference_steps=num_inference_steps, eta=eta, mesh_spec=mesh_spec,
        sampler=sampler, classifier_cfg=classifier_cfg,
        classifier_params=classifier_params, class_label=class_label,
        guidance_scale=guidance_scale,
        out_uint8=True,   # on-device conversion: 4x smaller host fetch
    )
    return x0

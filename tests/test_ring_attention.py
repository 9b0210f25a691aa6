"""Ring (sequence-parallel) attention vs dense reference on the 8-device
CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.core.config import MeshConfig
from lipreading_video_generation_tpu.ops.attention import attention_reference
from lipreading_video_generation_tpu.ops.ring_attention import ring_attention
from lipreading_video_generation_tpu.parallel import mesh as pmesh


def _qkv(rng, b=2, h=2, s=256, d=32):
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    return mk(), mk(), mk()


def test_ring_matches_dense(rng):
    spec = pmesh.build_mesh(MeshConfig())
    q, k, v = _qkv(rng)
    got = ring_attention(q, k, v, spec.mesh, axis_name="data")
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_ring_under_jit_with_sharded_inputs(rng):
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = pmesh.build_mesh(MeshConfig())
    q, k, v = _qkv(rng, s=512)
    shard = NamedSharding(spec.mesh, P(None, None, "data", None))
    qs, ks, vs = (jax.device_put(x, shard) for x in (q, k, v))

    @jax.jit
    def f(q, k, v):
        return ring_attention(q, k, v, spec.mesh, axis_name="data")

    got = f(qs, ks, vs)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
    assert got.sharding.spec == P(None, None, "data", None)


def test_ring_rejects_indivisible_seq(rng):
    spec = pmesh.build_mesh(MeshConfig())
    q, k, v = _qkv(rng, s=100)
    with pytest.raises(ValueError):
        ring_attention(q, k, v, spec.mesh, axis_name="data")


def test_ring_causal_matches_dense(rng):
    spec = pmesh.build_mesh(MeshConfig())
    q, k, v = _qkv(rng, s=256)
    got = ring_attention(q, k, v, spec.mesh, axis_name="data", causal=True)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_vivit_sequence_parallel_matches_local():
    """A MODEL forward (not a bare op) exercises the ring: ViViT with
    ``sequence_parallel=True`` on a model=8 mesh must reproduce the local
    flash-attention logits at a sentence-scale sequence (16 frames × 16
    patch tokens = 256 tokens sharded over 8 devices)."""
    import jax.numpy as jnp

    from lipreading_video_generation_tpu.core.config import ViViTConfig
    from lipreading_video_generation_tpu.models.vivit import ViViT

    base = ViViTConfig(num_classes=8, hidden_size=64, num_layers=2, num_heads=4,
                       mlp_dim=128, num_frames=16, dtype="float32")
    seq_par = __import__("dataclasses").replace(base, sequence_parallel=True)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.standard_normal(
        (2, base.num_frames, base.image_size, base.image_size, 1)).astype(np.float32))

    params = ViViT(base).init(jax.random.key(0), clips)["params"]
    want = ViViT(base).apply({"params": params}, clips)

    spec = pmesh.build_mesh(MeshConfig(data_parallel=1, model_parallel=8))
    with spec.mesh:
        got = ViViT(seq_par).apply({"params": params}, clips)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # off-mesh, the sequence_parallel config falls back to the local path
    got_off = ViViT(seq_par).apply({"params": params}, clips)
    np.testing.assert_allclose(np.asarray(got_off), np.asarray(want), rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_unet_sequence_parallel_matches_local():
    """The diffusion U-Net's spatial attention through the ring: UNetAudio
    with ``sequence_parallel=True`` on a model=2 mesh must reproduce the
    local flash-attention denoise output (attention at ds=2: 8×8 = 64
    tokens sharded over 2 devices). At the production config this is the
    16,384-token ds=1 attention — the repo's FLOP-heaviest op."""
    import dataclasses

    from lipreading_video_generation_tpu.core.config import DiffusionConfig
    from lipreading_video_generation_tpu.models.unet_audio import UNetAudio

    base = DiffusionConfig(
        im_size=16, base_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), num_heads=2, time_embed_dim=64,
        audio_embed_dim=64, audio_proj_dim=16, im_cond_channels=8,
        audio_samples=800, num_timesteps=10, dtype="float32", dropout=0.0,
    )
    seq_par = dataclasses.replace(base, sequence_parallel=True)
    rng = np.random.default_rng(0)
    # batch 4: the audio tower's TP activation constraints pin batch to the
    # data axis (4 here), like every production entrypoint's padded batches
    xt = jnp.asarray(rng.standard_normal((4, 16, 16, 3)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((4, 16, 16, 3)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((4, 800)).astype(np.float32))
    t = jnp.asarray([3, 7, 1, 9], jnp.int32)

    params = UNetAudio(base).init(jax.random.key(0), xt, cond, audio, t)["params"]
    want = UNetAudio(base).apply({"params": params}, xt, cond, audio, t)

    spec = pmesh.build_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    with spec.mesh:
        got = UNetAudio(seq_par).apply({"params": params}, xt, cond, audio, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # off-mesh, the sequence_parallel config falls back to the local path
    got_off = UNetAudio(seq_par).apply({"params": params}, xt, cond, audio, t)
    np.testing.assert_allclose(np.asarray(got_off), np.asarray(want), rtol=1e-6, atol=1e-6)

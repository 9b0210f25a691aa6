"""DenseNet-121 per-frame feature extractor (Flax NHWC).

Capability target: the reference embeds every mouth-ROI frame with Keras
DenseNet121 (imagenet weights, global-average-pooled 1024-d output) at
lipreading/feature_extraction.py:22-36 — one ``predict`` call **per frame**
(:78-88), the reference's main throughput sin. Here the extractor is a
single jitted forward over the whole (B·T) frame batch.

Weight port: ``convert_torch_state_dict`` maps torchvision's
``densenet121().state_dict()`` onto this module (same layer topology:
init 7×7/2 conv + maxpool, dense blocks (6, 12, 24, 16), growth 32,
transitions with ×0.5 compression, final BN → GAP → 1024-d).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class _DenseLayer(nn.Module):
    growth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="norm1")(x)
        h = nn.relu(h)
        h = nn.Conv(4 * self.growth, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="norm2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class _Transition(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="norm")(x)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(h)
        return nn.avg_pool(h, (2, 2), strides=(2, 2))


class DenseNet121(nn.Module):
    """(B, H, W, 3) imagenet-normalized frames → (B, 1024) pooled features."""

    growth: int = 32
    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    init_features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Conv(self.init_features, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv0")(x.astype(self.dtype))
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="norm0")(h)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        ch = self.init_features
        for bi, layers in enumerate(self.block_config):
            for li in range(layers):
                h = _DenseLayer(self.growth, self.dtype, name=f"block{bi}_layer{li}")(h, train)
            ch += layers * self.growth
            if bi != len(self.block_config) - 1:
                ch //= 2
                h = _Transition(ch, self.dtype, name=f"transition{bi}")(h, train)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="norm_final")(h)
        h = nn.relu(h)
        return jnp.mean(h, axis=(1, 2)).astype(jnp.float32)  # GAP → (B, 1024)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def imagenet_preprocess(frames_uint8: jax.Array) -> jax.Array:
    """uint8 RGB → imagenet-normalized float32 (torchvision convention)."""
    x = frames_uint8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray]):
    """torchvision densenet121 state_dict → (params, batch_stats) pytrees."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf, val):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = val

    def map_name(torch_key: str):
        # features.denseblock{i}.denselayer{j}.{norm1|conv1|norm2|conv2}
        parts = torch_key.split(".")
        if parts[0] != "features":
            return None
        if parts[1].startswith("denseblock"):
            bi = int(parts[1][len("denseblock"):]) - 1
            li = int(parts[2][len("denselayer"):]) - 1
            return [f"block{bi}_layer{li}", parts[3]]
        if parts[1].startswith("transition"):
            ti = int(parts[1][len("transition"):]) - 1
            return [f"transition{ti}", parts[2]]
        if parts[1] in ("conv0", "norm0"):
            return [parts[1]]
        if parts[1] == "norm5":
            return ["norm_final"]
        return None

    for key, val in state_dict.items():
        val = np.asarray(val)
        leaf = key.split(".")[-1]
        path = map_name(key.rsplit(".", 1)[0])
        if path is None:
            continue
        if leaf == "weight" and val.ndim == 4:
            put(params, path, "kernel", val.transpose(2, 3, 1, 0))
        elif leaf == "weight":
            put(params, path, "scale", val)
        elif leaf == "bias":
            put(params, path, "bias", val)
        elif leaf == "running_mean":
            put(stats, path, "mean", val)
        elif leaf == "running_var":
            put(stats, path, "var", val)
    return params, stats

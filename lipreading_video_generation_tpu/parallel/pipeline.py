"""GPipe-style pipeline parallelism over the mesh's ``model`` axis.

The reference has no distributed training at all (SURVEY.md §2.5 — its only
multi-device mechanism is a ThreadPoolExecutor fanning preprocessing over
GPUs); this framework already scales by data (dp), tensor (tp), and
sequence (sp, ring attention) axes. This module completes the set with
**pipeline parallelism (pp)**: a stack of homogeneous transformer blocks is
split into contiguous stages over the ``model`` mesh axis, and microbatches
stream through the stages with activations rotating device-to-device via
``ppermute`` over ICI.

TPU-native design notes:
- One ``shard_map`` over the whole (data, model) mesh; inside, a single
  ``lax.scan`` over ``M + S - 1`` pipeline ticks. Every tick, every stage
  runs its layers on its current microbatch and passes the result to the
  next stage — XLA compiles this to a static loop with one ``ppermute``
  collective per tick, no host involvement.
- The executor is a plain differentiable function: ``jax.grad`` through
  ``scan``/``ppermute``/``psum`` yields the reverse pipeline automatically,
  so the same code path serves training and inference.
- Stage parameters live stacked with a leading layer axis, sharded over the
  model axis (``shard_pp_state``): each stage holds only its own layers'
  params + Adam moments — the memory win that motivates pp.
- The pipeline bubble is the usual ``(S - 1) / (M + S - 1)`` fraction;
  ``n_micro`` trades bubble overhead against per-microbatch efficiency.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MeshSpec

BLOCKS_KEY = "blocks"


def stack_blocks(params: dict, num_layers: int, prefix: str = "block_") -> dict:
    """Canonical per-block params ``{prefix}{i}`` → one ``blocks`` tree whose
    leaves gain a leading layer axis (the layout ``pipeline_blocks`` and
    ``lax.scan`` consume). Non-block entries pass through unchanged."""
    blocks = [params[f"{prefix}{i}"] for i in range(num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in params.items() if not k.startswith(prefix)}
    return {**rest, BLOCKS_KEY: stacked}


def unstack_blocks(params: dict, num_layers: int, prefix: str = "block_") -> dict:
    """Inverse of ``stack_blocks`` — back to the canonical flax layout (for
    checkpoints interchangeable with the non-pp trainer)."""
    stacked = params[BLOCKS_KEY]
    out = {k: v for k, v in params.items() if k != BLOCKS_KEY}
    for i in range(num_layers):
        out[f"{prefix}{i}"] = jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
    return out


def scan_blocks(block_apply: Callable, stacked_params, x: jax.Array) -> jax.Array:
    """Apply a layer stack sequentially: ``lax.scan`` over the leading layer
    axis of ``stacked_params`` — the single-stage (S=1) degenerate pipeline,
    also useful on its own to keep HLO size O(1) in depth."""

    def step(h, p):
        return block_apply(p, h), None

    return jax.lax.scan(step, x, stacked_params)[0]


def pipeline_blocks(
    block_apply: Callable,
    stacked_params,
    x: jax.Array,
    spec: MeshSpec,
    n_micro: Optional[int] = None,
) -> jax.Array:
    """Run ``x`` through a stack of homogeneous blocks, pipelined over the
    mesh's model axis.

    ``stacked_params``: pytree whose leaves have a leading layer axis L
    (L % S == 0, S = model-axis size); stage s owns layers
    ``[s·L/S, (s+1)·L/S)``. ``x``: (B, ...) activations, batch sharded over
    the data axis (B % data_size == 0); each data-row of the mesh pipelines
    its own batch shard independently. ``n_micro`` microbatches per device
    (default: S, the minimum that keeps every stage busy in steady state;
    must divide the per-device batch).

    Equivalent to ``scan_blocks`` exactly (same float ops, reordered only
    across microbatches), verified in tests/test_pipeline.py.
    """
    S = spec.model_size
    if S == 1:
        return scan_blocks(block_apply, stacked_params, x)

    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % S:
        raise ValueError(f"{L} layers do not split over {S} pipeline stages")
    if x.shape[0] % spec.data_size:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by data axis {spec.data_size}")
    local_b = x.shape[0] // spec.data_size
    M = n_micro if n_micro is not None else min(S, local_b)
    if local_b % M:
        raise ValueError(f"per-device batch {local_b} not divisible by n_micro {M}")
    perm = [(i, (i + 1) % S) for i in range(S)]
    axis = spec.model_axis

    def run(stage_params, xl):
        # stage_params leaves: (L/S, ...) — this stage's layers.
        # xl: (local_b, ...) — this data-row's batch shard.
        idx = jax.lax.axis_index(axis)
        mb = xl.shape[0] // M
        xm = xl.reshape((M, mb) + xl.shape[1:])
        state0 = jnp.zeros_like(xm[0])
        outs0 = jnp.zeros_like(xm)

        def tick(carry, t):
            state, outs = carry
            # stage 0 ingests microbatch t (clamped reads past M are garbage
            # that is never collected); later stages consume the rotation
            inp = jnp.where(idx == 0, xm[jnp.minimum(t, M - 1)], state)
            out = scan_blocks(block_apply, stage_params, inp)
            # the last stage finishes microbatch t-(S-1) at tick t
            j = jnp.clip(t - (S - 1), 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, j, 0, keepdims=False)
            done = jnp.where(jnp.logical_and(idx == S - 1, t >= S - 1), out, cur)
            outs = jax.lax.dynamic_update_index_in_dim(outs, done, j, 0)
            state = jax.lax.ppermute(out, axis, perm)
            return (state, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (state0, outs0), jnp.arange(M + S - 1))
        # broadcast the collected outputs from the last stage to all stages
        outs = jax.lax.psum(
            jnp.where(idx == S - 1, outs, jnp.zeros_like(outs)), axis)
        return outs.reshape(xl.shape)

    fn = shard_map(
        run,
        mesh=spec.mesh,
        in_specs=(P(axis), P(spec.data_axis)),
        out_specs=P(spec.data_axis),
        check_vma=False,
    )
    return fn(stacked_params, x)


def pp_state_sharding(spec: MeshSpec, tree, blocks_key: str = BLOCKS_KEY):
    """Sharding pytree for a pp train state: every leaf under a ``blocks``
    subtree shards its leading (layer) axis over the model axis; everything
    else replicates. Matches params, Adam moments, and EMA shadows alike
    (they mirror the params tree)."""

    def _spec(path, x):
        in_blocks = any(
            getattr(p, "key", getattr(p, "name", None)) == blocks_key for p in path
        )
        if (
            in_blocks
            and spec.model_size > 1
            and hasattr(x, "ndim")
            and x.ndim >= 1
            and x.shape[0] % spec.model_size == 0
        ):
            return NamedSharding(spec.mesh, P(spec.model_axis))
        return NamedSharding(spec.mesh, P())

    return jax.tree_util.tree_map_with_path(_spec, tree)


def shard_pp_state(spec: MeshSpec, tree, blocks_key: str = BLOCKS_KEY):
    """Place a pp train-state pytree on the mesh: stage-local layer params
    (and their optimizer moments) shard over the model axis, the rest
    replicates — the pp analog of ``mesh.shard_state``."""
    shardings = pp_state_sharding(spec, tree, blocks_key)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)

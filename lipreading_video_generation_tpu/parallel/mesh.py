"""Device mesh / sharding core — the framework's distributed backend.

The reference has **no** distributed communication backend (SURVEY.md §2.5:
no torch.distributed / NCCL / MPI anywhere; only a ThreadPoolExecutor GPU
fan-out in gan-model/preprocessing/preprocess.py:36-37 and a commented-out
``nn.DataParallel``). The TPU-native replacement is this module: one
``jax.sharding.Mesh`` with named ``data`` and ``model`` axes, shardings
expressed as ``NamedSharding``/``PartitionSpec``, and XLA inserting the
collectives (psum over ICI for data-parallel gradients, all-gather /
reduce-scatter when the model axis is used).

Every trainer in ``pipelines/`` goes through this module so the whole
framework shares a single communication story. Multi-host extension:
call ``jax.distributed.initialize()`` before ``build_mesh`` and the same
code spans slices over DCN.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig


@dataclass(frozen=True)
class MeshSpec:
    """Resolved mesh: axis names plus sizes."""

    mesh: Mesh
    data_axis: str
    model_axis: str
    # tensor-parallel policy knob (from MeshConfig.model_shard_threshold)
    model_shard_threshold: int = 2**22
    # ZeRO-1 optimizer-state sharding over the data axis (MeshConfig.zero1)
    zero1: bool = False
    zero1_min_size: int = 2**16

    @property
    def data_size(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def model_size(self) -> int:
        return self.mesh.shape[self.model_axis]


def build_mesh(
    cfg: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshSpec:
    """Build a 2-D ``(data, model)`` mesh over the available devices.

    ``data_parallel=-1`` consumes all devices not claimed by the model axis.
    On a single chip this degenerates to a 1x1 mesh and every sharding
    below becomes a no-op — the same trainer code runs anywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    if n % mp != 0:
        raise ValueError(f"model_parallel={mp} does not divide device count {n}")
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"data_parallel*model_parallel = {dp * mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    mesh = Mesh(arr, (cfg.data_axis, cfg.model_axis))
    return MeshSpec(
        mesh=mesh,
        data_axis=cfg.data_axis,
        model_axis=cfg.model_axis,
        model_shard_threshold=cfg.model_shard_threshold,
        zero1=cfg.zero1,
        zero1_min_size=cfg.zero1_min_size,
    )


def batch_sharding(spec: MeshSpec, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; replicate the rest."""
    parts = (spec.data_axis,) + (None,) * (ndim - 1)
    return NamedSharding(spec.mesh, P(*parts))


def replicated(spec: MeshSpec) -> NamedSharding:
    return NamedSharding(spec.mesh, P())


def shard_batch(spec: MeshSpec, batch):
    """Place a pytree of host arrays on the mesh, batch-sharded on axis 0.

    Arrays whose leading dim doesn't divide the data axis (e.g. a small
    final batch) are replicated instead — correctness is preserved, only
    that batch loses the sharding speedup.
    """
    def _put(x):
        if np.ndim(x) >= 1 and np.shape(x)[0] % spec.data_size == 0:
            return jax.device_put(x, batch_sharding(spec, np.ndim(x)))
        return jax.device_put(x, replicated(spec))

    return jax.tree_util.tree_map(_put, batch)


def shard_stacked_batch(spec: MeshSpec, batches):
    """Place a pytree of host arrays stacked over a leading STEP axis:
    axis 0 (step) replicated, axis 1 (batch) sharded over the data axis —
    the layout a ``lax.scan`` over train steps consumes."""
    def _put(x):
        if np.ndim(x) >= 2 and np.shape(x)[1] % spec.data_size == 0:
            parts = (None, spec.data_axis) + (None,) * (np.ndim(x) - 2)
            return jax.device_put(x, NamedSharding(spec.mesh, P(*parts)))
        return jax.device_put(x, replicated(spec))

    return jax.tree_util.tree_map(_put, batches)


def param_partition_spec(path_leaf, spec: MeshSpec, model_shard_threshold: Optional[int] = None):
    """Default parameter layout: replicate everything (pure DP).

    With a >1 model axis, large 2-D kernels are sharded on their output
    dimension over the model axis — the simple tensor-parallel layout for
    the MLP/attention projection matrices in this repo's models. The size
    cutoff comes from ``MeshConfig.model_shard_threshold`` (carried on the
    spec) unless overridden here.
    """
    leaf = path_leaf
    if model_shard_threshold is None:
        model_shard_threshold = spec.model_shard_threshold
    if (
        spec.model_size > 1
        and hasattr(leaf, "ndim")
        and leaf.ndim >= 2
        and leaf.size >= model_shard_threshold
        and leaf.shape[-1] % spec.model_size == 0
    ):
        parts = [None] * leaf.ndim
        parts[-1] = spec.model_axis
        return P(*parts)
    return P()


def shard_params(spec: MeshSpec, params):
    """Place a parameter pytree on the mesh per ``param_partition_spec``."""
    def _put(x):
        return jax.device_put(x, NamedSharding(spec.mesh, param_partition_spec(x, spec)))

    return jax.tree_util.tree_map(_put, params)


def zero1_partition_spec(leaf, spec: MeshSpec):
    """ZeRO-1 layout for one optimizer-moment leaf: start from the
    tensor-parallel param policy (moments mirror their params' TP layout so
    the elementwise Adam update stays local over the model axis), then
    additionally shard the LARGEST data-axis-divisible dim the TP policy
    left unsharded. Leaves below ``zero1_min_size`` or with no divisible
    free dim replicate — correctness is unaffected, they just don't save
    memory (classic ZeRO-1 shards the flattened vector instead; per-dim
    sharding keeps leaves as plain NamedShardings the existing jit/scan
    carries handle with zero trainer changes)."""
    base = param_partition_spec(leaf, spec)
    if not hasattr(leaf, "ndim") or leaf.ndim == 0 \
            or leaf.size < spec.zero1_min_size or spec.data_size == 1:
        return base
    parts = list(base) + [None] * (leaf.ndim - len(base))
    free = [d for d in range(leaf.ndim)
            if parts[d] is None and leaf.shape[d] % spec.data_size == 0]
    if not free:
        return base
    d = max(free, key=lambda i: leaf.shape[i])
    parts[d] = spec.data_axis
    return P(*parts)


#: Train-state attribute names whose subtrees hold optimizer moments —
#: the ZeRO-1 shard targets (flax TrainState / DiffusionTrainState use
#: ``opt_state``; GanTrainState splits generator/discriminator).
_OPT_STATE_FIELDS = ("opt_state", "gen_opt", "disc_opt")


def shard_opt_state(spec: MeshSpec, tree):
    """Place an optimizer-state pytree per the ZeRO-1 policy."""
    def _put(x):
        return jax.device_put(
            x, NamedSharding(spec.mesh, zero1_partition_spec(x, spec)))

    return jax.tree_util.tree_map(_put, tree)


def shard_state(spec: MeshSpec, tree):
    """Place a FULL train-state pytree on the mesh through the
    ``param_partition_spec`` policy: large 2-D+ kernels (params, their Adam
    moments, EMA shadows — all shape-mirrored leaves) shard over the model
    axis; scalars/small leaves replicate. Under pure DP (model axis size 1)
    this degenerates to ``replicate_state`` exactly, so the production
    loops call it unconditionally.

    With ``spec.zero1`` (MeshConfig.zero1) the subtrees under the
    ``_OPT_STATE_FIELDS`` attributes additionally shard over the DATA axis
    (``zero1_partition_spec``) — pure DP stops paying 3x param memory per
    chip for Adam. Params/EMA stay replicated (the forward needs them);
    GSPMD keeps the moments sharded across scan-carried steps and
    all-gathers only the applied updates."""
    if not spec.zero1 or spec.data_size == 1:
        return shard_params(spec, tree)
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        names = {getattr(k, "name", getattr(k, "key", None)) for k in path}
        in_opt = bool(names & set(_OPT_STATE_FIELDS))
        pspec = (zero1_partition_spec(leaf, spec) if in_opt
                 else param_partition_spec(leaf, spec))
        out.append(jax.device_put(leaf, NamedSharding(spec.mesh, pspec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def replicate_state(spec: MeshSpec, tree):
    """Replicate every array leaf of a train-state pytree over the mesh —
    the pure-DP layout (params/opt/EMA live on every chip; psum'd grads
    keep them in sync). Production loops use ``shard_state`` instead, which
    is identical when the model axis is 1."""
    sharding = replicated(spec)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def activation_constraint(x, *parts):
    """``with_sharding_constraint(x, P(*parts))`` when a physical mesh with
    the named axes (sized > 1) is active; identity otherwise — so model code
    can annotate tensor-parallel activation layouts unconditionally and
    still run un-meshed (unit tests, single chip).

    The trace cache keys on the ambient resource env, so the same model
    traced with and without a live mesh compiles separately."""
    from jax._src import mesh as mesh_lib

    env_mesh = mesh_lib.thread_resources.env.physical_mesh
    if env_mesh.empty:
        return x
    names = dict(env_mesh.shape)
    axes = [
        ax
        for p in parts
        for ax in (p if isinstance(p, (tuple, list)) else (p,))
        if ax is not None
    ]
    if any(ax not in names for ax in axes):
        return x
    # Inside a shard_map body the mesh axes are manual — a sharding
    # constraint over them is both illegal and meaningless (the collective
    # layout is already explicit). E.g. the pipeline-parallel executor
    # (parallel/pipeline.py) runs TransformerBlock under shard_map.
    manual = set(getattr(mesh_lib.get_abstract_mesh(), "manual_axes", ()) or ())
    if any(ax in manual for ax in axes):
        return x
    if all(names[ax] == 1 for ax in axes):
        return x
    # drop constraints on dimensions the mesh axis doesn't divide — pjit
    # would hard-error otherwise (e.g. an odd serving batch under a live
    # mesh); the production entrypoints pad to mesh multiples, but library
    # callers with ragged batches should degrade to "unconstrained", not
    # crash. Composite axes (tuples) drop as a unit.
    def _fits(p, dim):
        if p is None:
            return True
        sz = 1
        for ax in (p if isinstance(p, (tuple, list)) else (p,)):
            sz *= names[ax]
        return dim % sz == 0

    parts = tuple(
        p if i < x.ndim and _fits(p, x.shape[i]) else None
        for i, p in enumerate(parts)
    )
    if all(p is None for p in parts):
        return x
    return jax.lax.with_sharding_constraint(x, P(*parts))


def per_device_batch(global_batch: int, spec: MeshSpec) -> int:
    if global_batch % spec.data_size != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {spec.data_size}"
        )
    return global_batch // spec.data_size


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)

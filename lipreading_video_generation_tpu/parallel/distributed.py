"""Multi-host / multi-slice initialization.

The reference's "cluster story" is a SLURM script that launches a single
python process (gan-model/run_preprocess.sh:8-19 — no srun/torchrun, no
inter-node communication). The TPU-native story: every host runs the same
program, ``initialize()`` wires them into one JAX runtime (ICI within a
slice, DCN across slices), and the same ``build_mesh`` + sharded-batch
trainers from parallel/mesh.py scale out unchanged — each host feeds its
local devices (``local_batch_slice``), XLA handles the collectives.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Call once at startup on every host; no-op for single-process runs.

    Args default from the standard JAX env vars / TPU metadata. Returns
    (process_id, num_processes).
    """
    explicit = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    multi = explicit or os.environ.get("JAX_NUM_PROCESSES") or num_processes
    if multi and (num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))) > 1:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of a global batch — the per-host
    input-pipeline contract (each host decodes only its own share)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    return jax.process_index() * per, per


def global_batch_from_local(spec, batch, global_batch: int):
    """Assemble each host's LOCAL batch slice (produced per
    ``local_batch_slice``) into global batch-sharded arrays on ``spec``'s
    mesh — the multi-host analog of ``parallel.mesh.shard_batch`` (which
    expects the full batch on every host). Accepts a pytree of host arrays
    whose leading dim is this host's slice size.

    Exercised end-to-end by scripts/multihost_smoke.py (2 CPU processes).
    """
    from ..parallel.mesh import batch_sharding

    import numpy as np

    def _make(x):
        x = np.asarray(x)
        shape = (global_batch,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            batch_sharding(spec, x.ndim), x, shape)

    return jax.tree_util.tree_map(_make, batch)


def is_primary() -> bool:
    """True on the checkpoint/metrics-writing host."""
    return jax.process_index() == 0

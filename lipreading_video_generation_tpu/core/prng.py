"""PRNG discipline.

The reference relies on ambient ``random``/``np.random``/``torch`` RNG state
(e.g. gan-model/preprocessing/dataset.py:107-120's ``random.choice`` resample
loop). Here every source of randomness is an explicit ``jax.random`` key
threaded through the train state, so runs are reproducible and per-step keys
are derivable without host round-trips.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp


def make_root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def step_key(root: jax.Array, step) -> jax.Array:
    """Deterministic per-step key: fold the step counter into the root key.

    Works under jit (step may be a traced int32), so the train step never
    needs a host-side key split.
    """
    return jax.random.fold_in(root, step)


def split_for(key: jax.Array, *names: str) -> Tuple[jax.Array, ...]:
    """Named splits: stable mapping from name to subkey independent of order."""
    return tuple(jax.random.fold_in(key, _stable_hash(n)) for n in names)


def _stable_hash(name: str) -> int:
    h = 2166136261
    for c in name.encode():
        h = (h ^ c) * 16777619 % (1 << 32)
    return h


def key_iterator(seed: int) -> Iterator[jax.Array]:
    """Host-side infinite key stream (for data shuffling etc.)."""
    key = make_root_key(seed)
    i = 0
    while True:
        yield jax.random.fold_in(key, i)
        i += 1


def uniform_timesteps(key: jax.Array, batch: int, num_timesteps: int) -> jax.Array:
    """t ~ U[0, num_timesteps) — fixing the reference's out-of-range sampling
    (video-generation/diffusion/train.py:125 sampled [0,500) with T=100)."""
    return jax.random.randint(key, (batch,), 0, num_timesteps, dtype=jnp.int32)

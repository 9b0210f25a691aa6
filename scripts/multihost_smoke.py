"""Multi-host smoke: 2 REAL processes through the production multi-host path.

The reference's cluster story is a single-process SLURM script
(gan-model/run_preprocess.sh:8-19) — it never runs inter-node. The
TPU-native story is SPMD: every host runs this same program,
``parallel.distributed.initialize`` wires them into one JAX runtime, each
host feeds only its own batch slice (``local_batch_slice`` →
``global_batch_from_local``), and the jitted trainer runs unchanged with
XLA/gloo inserting the cross-process collectives.

This script proves that contract end-to-end on CPU (2 processes × 2
virtual devices = a 4-way data-parallel mesh, gloo collectives):

1. parent spawns 2 worker copies of itself;
2. each worker initializes the distributed runtime, builds the SAME
   ``build_mesh`` the production trainers use, assembles its local slice of
   one deterministic global batch, and runs ONE real ViViT ``train_step``;
3. each worker reports its loss + post-step parameter checksum;
4. the parent asserts both hosts agree bit-for-bit-ish (same loss, same
   params — i.e. gradients were really psum'd across processes) AND that
   the loss matches a single-process run on the identical global batch.

Run: python scripts/multihost_smoke.py        (exit 0 = smoke green)
Exercised by tests/test_multihost.py (slow tier).
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

GLOBAL_BATCH = 8
NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 2


def _force_cpu_devices(n: int) -> None:
    """CPU backend with n local devices, surviving an already-initialized
    backend (the TPU plugin's sitecustomize initializes one at startup)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.extend import backend as jex_backend

    try:
        jax.config.update("jax_num_cpu_devices", n)
    except RuntimeError:
        jex_backend.clear_backends()
        jax.config.update("jax_num_cpu_devices", n)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # drop any live backend so device count / collectives / the distributed
    # runtime are picked up at the next (re-)initialization
    jex_backend.clear_backends()


def _tiny_cfg():
    from lipreading_video_generation_tpu.core.config import ViViTConfig

    return ViViTConfig(
        num_classes=8, hidden_size=32, num_layers=1, num_heads=2, mlp_dim=64,
        num_frames=4, image_size=16, tubelet_size=(2, 8, 8), dtype="float32",
    )


def _global_batch(cfg):
    import numpy as np

    rng = np.random.default_rng(7)
    return {
        "clips": rng.integers(
            0, 256,
            (GLOBAL_BATCH, cfg.num_frames, cfg.image_size, cfg.image_size,
             cfg.num_channels),
            dtype=np.uint8),
        "labels": rng.integers(0, cfg.num_classes, (GLOBAL_BATCH,)).astype(
            np.int32),
    }


def worker(process_id: int, coordinator: str, out_path: str) -> None:
    _force_cpu_devices(DEVICES_PER_PROCESS)
    import jax
    import numpy as np

    from lipreading_video_generation_tpu.core import prng
    from lipreading_video_generation_tpu.core.config import MeshConfig
    from lipreading_video_generation_tpu.parallel import distributed
    from lipreading_video_generation_tpu.parallel.mesh import (
        build_mesh, replicated, shard_state)
    from lipreading_video_generation_tpu.pipelines import train_vivit

    pid, nproc = distributed.initialize(
        coordinator_address=coordinator,
        num_processes=NUM_PROCESSES,
        process_id=process_id,
    )
    assert (pid, nproc) == (process_id, NUM_PROCESSES), (pid, nproc)
    assert jax.device_count() == NUM_PROCESSES * DEVICES_PER_PROCESS

    cfg = _tiny_cfg()
    spec = build_mesh(MeshConfig())  # dp=4 over both hosts' devices

    # the per-host input-pipeline contract: decode ONLY this host's slice
    start, size = distributed.local_batch_slice(GLOBAL_BATCH)
    full = _global_batch(cfg)  # deterministic; sliced per host below
    local = {k: v[start : start + size] for k, v in full.items()}

    key = prng.make_root_key(0)
    state = train_vivit.create_state(cfg, key)
    with spec.mesh:
        state = shard_state(spec, state)
        batch = distributed.global_batch_from_local(spec, local, GLOBAL_BATCH)
        state, metrics = train_vivit.train_step(state, batch, key)
        fetch = jax.jit(lambda t: t, out_shardings=replicated(spec))
        loss = float(fetch(metrics["loss"]))
        checksum = float(fetch(sum(
            jax.numpy.abs(x).sum()
            for x in jax.tree_util.tree_leaves(state.params))))

    with open(out_path, "w") as f:
        json.dump({
            "process_id": pid,
            "num_processes": nproc,
            "global_devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "slice": [start, size],
            "loss": loss,
            "param_checksum": checksum,
            "is_primary": distributed.is_primary(),
        }, f)
    print(f"[worker {pid}] loss={loss:.6f} checksum={checksum:.4f}", flush=True)


def single_process_reference() -> dict:
    """The same step on one process / one device — the ground truth the
    multi-host run must reproduce."""
    _force_cpu_devices(1)
    import jax

    from lipreading_video_generation_tpu.core import prng
    from lipreading_video_generation_tpu.pipelines import train_vivit

    cfg = _tiny_cfg()
    state = train_vivit.create_state(cfg, prng.make_root_key(0))
    batch = {k: jax.numpy.asarray(v) for k, v in _global_batch(cfg).items()}
    state, metrics = train_vivit.train_step(state, batch, prng.make_root_key(0))
    checksum = float(sum(
        float(jax.numpy.abs(x).sum())
        for x in jax.tree_util.tree_leaves(state.params)))
    return {"loss": float(metrics["loss"]), "param_checksum": checksum}


def main() -> int:
    with socket.socket() as s:  # reserve a free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    with tempfile.TemporaryDirectory() as tmp:
        outs = [os.path.join(tmp, f"worker{i}.json") for i in range(NUM_PROCESSES)]
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--process-id",
                 str(i), "--coordinator", coordinator, "--out", outs[i]],
                env=env)
            for i in range(NUM_PROCESSES)
        ]
        rcs = [p.wait(timeout=600) for p in procs]
        if any(rcs):
            print(f"MULTIHOST SMOKE FAILED: worker exit codes {rcs}")
            return 1
        reports = []
        for path in outs:
            with open(path) as f:
                reports.append(json.load(f))

    ref = single_process_reference()
    ok = True

    def check(name, cond):
        nonlocal ok
        print(f"  {'PASS' if cond else 'FAIL'}  {name}")
        ok = ok and cond

    r0, r1 = sorted(reports, key=lambda r: r["process_id"])
    check("4 global devices on both hosts",
          all(r["global_devices"] == 4 and r["local_devices"] == 2
              for r in reports))
    check("disjoint covering batch slices",
          sorted([tuple(r0["slice"]), tuple(r1["slice"])]) == [(0, 4), (4, 4)])
    check("exactly one primary (checkpoint-writing) host",
          [r["is_primary"] for r in (r0, r1)] == [True, False])
    check("hosts agree on loss", abs(r0["loss"] - r1["loss"]) < 1e-6)
    check("hosts agree on post-step params (grads really psum'd)",
          abs(r0["param_checksum"] - r1["param_checksum"]) < 1e-3)
    check(f"multi-host loss == single-process loss "
          f"({r0['loss']:.6f} vs {ref['loss']:.6f})",
          abs(r0["loss"] - ref["loss"]) < 1e-4)
    check("multi-host post-step params == single-process",
          abs(r0["param_checksum"] - ref["param_checksum"])
          < 1e-3 * max(1.0, abs(ref["param_checksum"])))

    print(json.dumps({"multihost_smoke_ok": ok, "reports": reports,
                      "reference": ref}))
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.process_id is None:
        sys.exit(main())
    worker(args.process_id, args.coordinator, args.out)

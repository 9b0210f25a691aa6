"""Bench-regression gate: run the headline bench and FAIL if it drops
below a pinned floor.

Round-3 postmortem (VERDICT.md): a kernel-dispatch change regressed the
driver headline 1.7x (99.6k -> 58.5k frames/s) and nothing failed, because
microbenches measured the kernel in isolation while the end-to-end program
told the opposite story. This gate pins the end-to-end number so a
committed perf regression fails loudly before the driver measures it.

The floor is deliberately ~10%% below the measured record (97-101k
frames/s across rounds 3-4) to absorb run-to-run variance on the shared
TPU while still catching anything structural (the r3 regression was -40%%).

Usage: python scripts/bench_gate.py        # exits 1 on TPU if below floor
CPU backends are informational only (no floor - CPU perf is not the target).
"""
import json
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

# metric name -> (floor, unit) on the TPU backend
FLOORS = {
    "preprocess+vivit_inference_frames_per_sec_per_chip": (88_000.0, "frames/sec/chip"),
}


def main() -> int:
    out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                         text=True, cwd=ROOT)
    parsed = None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
    if parsed is None:
        print("bench_gate: bench.py produced no JSON line", file=sys.stderr)
        print(out.stderr[-2000:], file=sys.stderr)
        return 1

    # backend comes from the JSON contract (bench.py emits it), not from
    # parsing the free-form stderr diagnostic — a reformat there must not
    # fail the gate open
    backend = parsed.get("backend", "unknown")
    metric = parsed.get("metric")
    value = float(parsed.get("value", 0.0))
    floor, unit = FLOORS.get(metric, (None, None))

    if backend == "unknown":
        print("bench_gate: bench.py JSON carries no 'backend' field — "
              "refusing to fail open", file=sys.stderr)
        return 1
    if backend != "tpu":
        print(f"bench_gate: backend={backend}, floor not enforced "
              f"({metric}={value})")
        return 0
    if floor is None:
        print(f"bench_gate: no floor pinned for metric {metric!r}", file=sys.stderr)
        return 1
    if value < floor:
        print(f"bench_gate: FAIL {metric} = {value:.1f} {unit} "
              f"< floor {floor:.1f} (record ~97-101k; see BENCH_NOTES.md)",
              file=sys.stderr)
        return 1
    print(f"bench_gate: OK {metric} = {value:.1f} {unit} >= floor {floor:.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

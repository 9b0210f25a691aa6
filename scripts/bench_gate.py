"""Bench-regression gate: FAIL if any benched surface drops below its
pinned floor.

Round-3 postmortem (VERDICT.md): a kernel-dispatch change regressed the
driver headline 1.7x (99.6k -> 58.5k frames/s) and nothing failed, because
microbenches measured the kernel in isolation while the end-to-end program
told the opposite story. Round 4 gated the headline; round 5 extends the
floors to EVERY surface of record (VERDICT r4 #3) so a committed >10%%
regression anywhere fails loudly before the driver measures it.

Floors are ~10%% below the round-4/5 records to absorb the shared chip's
run-to-run variance (~±3%%) while catching anything structural (the r3
regression was -40%%).

Usage:
  python scripts/bench_gate.py                 # headline only (fast gate)
  python scripts/bench_gate.py --all           # run bench_all, gate every row
  python scripts/bench_gate.py --summary F.json  # gate a pre-computed summary
CPU backends are informational only (no floor - CPU perf is not the target).
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

# headline metric -> (floor, unit) on the TPU backend (fast gate)
FLOORS = {
    "preprocess+vivit_inference_frames_per_sec_per_chip": (95_000.0, "frames/sec/chip"),
}

# bench_all summary row -> (floor, record, unit). Records: round-5
# (batch-384 headline, fused single-dispatch few-step sampler with uint8
# fetch — wall-clock steps/s; the marginal per-step rate is higher, see
# bench_summary fields).
SUMMARY_FLOORS = {
    "pipeline": (95_000.0, "105.8k", "frames/s"),
    "vivit_train": (50_000.0, "56.6k", "frames/s"),
    "gan_train": (13.5, "15.4", "steps/s"),
    "lipsync_serving": (3_300.0, "3713", "frames/s"),
    "lipsync_serving_int8_static": (3_100.0, "3495", "frames/s"),
    "face_detect": (520.0, "578", "frames/s"),
    "diffusion_sampling": (92.0, "102.5", "steps/s"),
    "diffusion_sampling_ddim50": (85.0, "96.8 wall (109.7 marginal)", "steps/s"),
    "diffusion_sampling_dpmpp20": (76.0, "85.4 wall (~104 marginal)", "steps/s"),
    "diffusion_train": (4.0, "4.47", "steps/s"),
}


def _headline_gate() -> int:
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


def _summary_gate(summary: dict) -> int:
    failures, missing = [], []
    for row, (floor, record, unit) in SUMMARY_FLOORS.items():
        entry = summary.get(row)
        if not isinstance(entry, dict) or "value" not in entry:
            missing.append(row)
            continue
        value = float(entry["value"])
        if value < floor:
            failures.append(f"{row} = {value:.1f} {unit} < floor {floor:.1f} "
                            f"(record {record})")
        else:
            print(f"bench_gate: OK {row} = {value:.1f} {unit} "
                  f">= floor {floor:.1f}")
    for row in missing:
        print(f"bench_gate: MISSING row {row!r} in summary — refusing to "
              "fail open", file=sys.stderr)
    for f in failures:
        print(f"bench_gate: FAIL {f}", file=sys.stderr)
    return 1 if (failures or missing) else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="run bench_all.py and gate every surface")
    ap.add_argument("--summary", default=None,
                    help="gate a pre-computed bench_all summary JSON "
                         "(no TPU run)")
    args = ap.parse_args()

    if args.summary:
        with open(args.summary) as f:
            return _summary_gate(json.load(f))
    if args.all:
        out = subprocess.run(
            [sys.executable, "scripts/bench_all.py", "--out",
             "bench_summary_gate.json"],
            capture_output=True, text=True, cwd=ROOT)
        path = os.path.join(ROOT, "bench_summary_gate.json")
        if out.returncode != 0 or not os.path.exists(path):
            print("bench_gate: bench_all failed", file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            return 1
        with open(path) as f:
            return _summary_gate(json.load(f))
    return _headline_gate()


if __name__ == "__main__":
    sys.exit(main())

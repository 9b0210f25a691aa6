"""Run every benchmark surface (BASELINE.md rows) and write one JSON
summary. Usage: python scripts/bench_all.py [--out bench_summary.json]"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def run(cmd):
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return {"error": out.stderr[-500:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_summary.json")
    ap.add_argument("--skip-diffusion", action="store_true")
    args = ap.parse_args()

    summary = {}
    summary["pipeline"] = run([sys.executable, "bench.py"])
    summary["vivit_train"] = run([sys.executable, "scripts/bench_vivit_train.py", "--steps", "24"])
    summary["gan_train"] = run([sys.executable, "scripts/bench_gan.py", "--steps", "5"])
    summary["lipsync_serving"] = run(
        [sys.executable, "scripts/bench_lipsync_serving.py"])
    summary["lipsync_serving_int8_static"] = run(
        [sys.executable, "scripts/bench_lipsync_serving.py", "--int8-static"])
    summary["face_detect"] = run([sys.executable, "scripts/bench_face_detect.py"])
    if not args.skip_diffusion:
        summary["diffusion_sampling"] = run([sys.executable, "scripts/bench_diffusion.py"])
        summary["diffusion_sampling_ddim50"] = run(
            [sys.executable, "scripts/bench_diffusion.py", "--ddim-steps", "50"])
        summary["diffusion_sampling_dpmpp20"] = run(
            [sys.executable, "scripts/bench_diffusion.py", "--ddim-steps", "20",
             "--sampler", "dpmpp"])
        summary["diffusion_train"] = run(
            [sys.executable, "scripts/bench_diffusion_train.py", "--steps", "3"])
    with open(os.path.join(ROOT, args.out), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

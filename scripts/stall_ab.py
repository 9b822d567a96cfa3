"""Trainer wall-rate A/B: async metric fetch on vs off (VERDICT r4 #1d).

Round 4 instrumented the trainer's periodic ~2 s host stalls
(``perf/*`` attribution scalars) and shipped the fix —
``profiling.async_fetch`` starts each step's D2H metric copies at
dispatch so the report-interval ``device_get`` stops paying one blocking
tunnel round trip per metric leaf per step. This script produces the
missing *evidence*: it runs the real trainer twice on the same world
(STAIR_ASYNC_METRICS=1 then 0), parses each run's ``metrics.jsonl``,
and reports steady-state wall rate + stall attribution for both arms.

Statistical hygiene (VERDICT r4 #10): every reported number is the
per-window distribution (median / IQR over report windows, first window
dropped as compile), not a single point estimate; raw windows are kept
in the artifact.

Usage:
  PYTHONPATH=. python scripts/stall_ab.py --root /tmp/parity \
      [--epochs 8] [--out STALL_AB.json]
Requires a built parity world (scripts/parity_study.py --func build).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def run_arm(args, async_on: bool) -> dict:
    name = "async" if async_on else "blocking"
    run_dir = os.path.join(args.root, f"stall_ab_{name}")
    out = os.path.join(args.root, "out")
    env = dict(os.environ)
    env["STAIR_ASYNC_METRICS"] = "1" if async_on else "0"
    env.setdefault("PYTHONPATH", os.getcwd())
    with open(os.path.join(args.root, "build_meta.json")) as f:
        train_n = json.load(f)["train"]
    steps_per_epoch = max(1, train_n // args.batch_size)
    cmd = [
        sys.executable, "-m", "stair_tpu.train.loop",
        "--rgb-path", os.path.join(args.root, "features"),
        "--glove-filename", os.path.join(args.root, "glove.txt"),
        "--train-filename", os.path.join(out, "train.pkl"),
        "--valid-filename", os.path.join(out, "valid.pkl"),
        "--test-filename", os.path.join(out, "test.pkl"),
        "--video-secs-path", os.path.join(args.root, "video_secs.json"),
        "--word2id-filename", os.path.join(args.root, "IDX.json"),
        "--vocab-filename", os.path.join(out, "vocab.json"),
        "--hidden-size", str(args.hidden), "--text-size", "50",
        "--max-video-length", str(args.frames), "--video-size", "64",
        "--output", run_dir, "--num-epochs", str(args.epochs),
        "--batch-size", str(args.batch_size),
        "--report-interval", str(args.report_interval),
        # Eval only at the very end so the measured windows are pure
        # train-loop wall rate.
        "--evaluate-interval", str(10 ** 9),
        "--scheduler-total-iters", str(steps_per_epoch * args.epochs),
        "--contrastive-window", "32",
    ]
    t0 = time.time()
    res = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    if res.returncode != 0:
        print(res.stdout[-3000:], res.stderr[-3000:])
        raise SystemExit(f"{name} arm failed rc={res.returncode}")

    windows = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "perf/steps_per_sec" in rec:
                windows.append({
                    k.removeprefix("perf/"): rec[k]
                    for k in rec if k.startswith("perf/")
                })
    # Drop the first window (compile + warmup dominate it).
    steady = windows[1:] if len(windows) > 1 else windows

    def dist(key):
        vals = sorted(w[key] for w in steady if key in w)
        if not vals:
            return None
        n = len(vals)
        return {
            "median": vals[n // 2],
            "iqr": [vals[n // 4], vals[(3 * n) // 4]],
            "n_windows": n,
        }

    return {
        "arm": name,
        "wall_seconds": round(wall, 1),
        "steps_per_sec": dist("steps_per_sec"),
        "step_ms_p50": dist("step_ms_p50"),
        "step_ms_p99": dist("step_ms_p99"),
        "report_fetch_ms": dist("report_fetch_ms"),
        "batch_wait_ms": dist("batch_wait_ms"),
        "dispatch_ms": dist("dispatch_ms"),
        "gc_ms": dist("gc_ms"),
        "raw_windows": steady,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--report-interval", type=int, default=50)
    ap.add_argument("--out", default="STALL_AB.json")
    args = ap.parse_args()

    # Interleaved A-B-A-B: a first single-pass run showed a large
    # ORDER effect (the second arm reuses the server-side compile cache
    # and runs on a settled host), so each arm runs twice in alternating
    # order and windows pool across its two runs.
    runs = [run_arm(args, True), run_arm(args, False),
            run_arm(args, True), run_arm(args, False)]

    def pooled(arm_name):
        arm_runs = [r for r in runs if r["arm"] == arm_name]
        windows = [w for r in arm_runs for w in r["raw_windows"]]

        def dist(key):
            vals = sorted(w[key] for w in windows if key in w)
            if not vals:
                return None
            n = len(vals)
            return {"median": vals[n // 2],
                    "iqr": [vals[n // 4], vals[(3 * n) // 4]],
                    "n_windows": n}

        return {
            "wall_seconds": [r["wall_seconds"] for r in arm_runs],
            "steps_per_sec": dist("steps_per_sec"),
            "step_ms_p50": dist("step_ms_p50"),
            "step_ms_p99": dist("step_ms_p99"),
            "report_fetch_ms": dist("report_fetch_ms"),
            "batch_wait_ms": dist("batch_wait_ms"),
            "dispatch_ms": dist("dispatch_ms"),
            "gc_ms": dist("gc_ms"),
        }

    result = {
        "config": {
            "epochs": args.epochs, "batch_size": args.batch_size,
            "hidden": args.hidden, "frames": args.frames,
            "report_interval": args.report_interval,
            "design": "A-B-A-B interleaved, windows pooled per arm",
        },
        "async": pooled("async"),
        "blocking": pooled("blocking"),
        "raw": {
            f"{r['arm']}_{i}": r["raw_windows"]
            for i, r in enumerate(runs)
        },
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    for name in ("async", "blocking"):
        print(name, json.dumps(
            {k: result[name][k] for k in ("steps_per_sec", "step_ms_p50",
                                          "report_fetch_ms")}))
    print("wrote", args.out)


if __name__ == "__main__":
    main()

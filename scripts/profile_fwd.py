"""Profile the deterministic NMN forward (bench headline shape) on TPU.

Captures a jax.profiler trace around a chained forward loop and prints a
per-op time breakdown aggregated from the trace's device lanes, so
executor-stream optimizations target measured traffic, not theory.

Usage: python scripts/profile_fwd.py [--batch 1024] [--iters 8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from stair_tpu.testing import workload


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/fwd_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    cfg = workload.workload_config(
        hidden_size=args.hidden, video_size=1024,
        max_video_length=args.frames,
    )
    cfg = type(cfg)(**{**cfg.to_dict(), "compute_dtype": "bfloat16"})
    model, params = workload.build_model(cfg)
    batch = workload.make_batch(cfg, batch_size=args.batch)
    batch = jax.device_put(batch)
    params = jax.device_put(params)

    @jax.jit
    def chained(p, b):
        def body(carry, _):
            bb = dict(b)
            bb["video"] = b["video"] + (carry * 1e-12).astype(
                b["video"].dtype
            )
            logits = model.forward(p, bb, deterministic=True)["logits"]
            return jnp.float32(jnp.sum(logits)), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(args.iters)
        )
        return acc

    out = chained(params, batch)
    np.asarray(out)

    t0 = time.perf_counter()
    np.asarray(chained(params, batch))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"fwd @ B={args.batch}: {dt * 1e3:.1f} ms/batch "
          f"({args.batch / dt:.0f} q/s)")

    # HLO name -> jax scope (metadata op_name) for labeling trace ops.
    hlo_scopes = {}
    try:
        hlo = chained.lower(params, batch).compile().as_text()
        import re

        for m in re.finditer(
            r"%?([\w.\-]+)\s*=\s*[^\n]*metadata=\{[^}]*op_name=\"([^\"]+)\"",
            hlo,
        ):
            hlo_scopes[m.group(1)] = m.group(2)
    except Exception as e:  # pragma: no cover - best effort
        print("hlo scope extraction failed:", e)

    os.system(f"rm -rf {args.dir}")
    jax.profiler.start_trace(args.dir)
    np.asarray(chained(params, batch))
    jax.profiler.stop_trace()

    traces = glob.glob(
        os.path.join(args.dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not traces:
        print("no trace file found under", args.dir)
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Device lanes: pids whose process name mentions TPU/device.
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "tpu" in n or "Device" in n or "/device" in n
    }
    # Self-time aggregation: trace events nest (jit > while > fusion), so
    # subtract each event's children before aggregating per op name.
    lanes = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if "step" in tname.lower():
            continue
        lanes.setdefault((e["pid"], e.get("tid")), []).append(e)
    agg = {}
    total = 0.0
    for evs in lanes.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack2 = []
        for e in evs:
            dur = e.get("dur", 0)
            while stack2 and e["ts"] >= stack2[-1][0]:
                top = stack2.pop()
                self_t = top[1] - top[2]
                agg[top[3]] = agg.get(top[3], 0.0) + self_t
                total += self_t
            if stack2:
                stack2[-1][2] += dur
            stack2.append([e["ts"] + dur, dur, 0.0, e.get("name", "?")])
        while stack2:
            top = stack2.pop()
            self_t = top[1] - top[2]
            agg[top[3]] = agg.get(top[3], 0.0) + self_t
            total += self_t
    print(f"device lanes: {sorted(pid_names[p] for p in dev_pids)}")
    print(f"total device self time: {total / 1e3:.1f} ms "
          f"({total / 1e3 / args.iters:.2f} ms/iter)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        scope = hlo_scopes.get(name, "")
        print(f"  {dur / 1e3 / args.iters:8.3f} ms/iter  "
              f"{100 * dur / max(total, 1):5.1f}%  {name[:60]}"
              f"  {scope[-90:]}")


if __name__ == "__main__":
    main()

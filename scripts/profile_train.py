"""Profile the NMN TRAIN step (bench shape) on TPU.

Same trace-aggregation recipe as profile_fwd.py, applied to the full
value_and_grad + Adam step, so backward-side optimizations target the
measured op mix.

Usage: python -m scripts.profile_train [--batch 128] [--iters 8]
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
import optax

from stair_tpu.testing import workload
from stair_tpu.train.losses import total_loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/train_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--prng", default="rbg")
    args = ap.parse_args()
    jax.config.update("jax_default_prng_impl", args.prng)

    cfg = workload.workload_config(
        hidden_size=args.hidden, video_size=1024,
        max_video_length=args.frames,
    )
    cfg = type(cfg)(**{**cfg.to_dict(), "compute_dtype": "bfloat16"})
    model, params = workload.build_model(cfg)
    batch = workload.make_batch(cfg, batch_size=args.batch)
    batch = workload.add_fake_supervision(batch, cfg)
    batch = jax.device_put(batch)
    params = jax.device_put(params)
    optimizer = optax.adam(1e-4)
    opt_state = jax.jit(optimizer.init)(params)

    def loss_fn(p, rng):
        return total_loss(
            model, p, batch, rng, 1.0, 1.0,
            jnp.float32(1.0), jnp.float32(1.0), deterministic=False,
        )[0]

    @jax.jit
    def chained(params, opt_state, rng):
        def body(carry, i):
            p, s, r = carry
            r = jax.random.fold_in(r, i)
            loss, grads = jax.value_and_grad(loss_fn)(p, r)
            updates, s = optimizer.update(grads, s, p)
            return (optax.apply_updates(p, updates), s, r), loss

        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, rng), jnp.arange(args.iters)
        )
        return losses

    rng = jax.random.PRNGKey(0)
    np.asarray(chained(params, opt_state, rng))
    t0 = time.perf_counter()
    np.asarray(chained(params, opt_state, rng))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train @ B={args.batch}: {dt * 1e3:.1f} ms/step")

    os.system(f"rm -rf {args.dir}")
    jax.profiler.start_trace(args.dir)
    np.asarray(chained(params, opt_state, rng))
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
            name = e.get("name", "?")
            scope = (e.get("args") or {}).get("long_name", "")
            key = f"{name}  {scope[:70]}"
            end = e["ts"] + dur
            if stack2:
                stack2[-1][2] += dur
            stack2.append([end, dur, 0.0, key])
        while stack2:
            top = stack2.pop()
            self_t = top[1] - top[2]
            agg[top[3]] = agg.get(top[3], 0.0) + self_t
            total += self_t
    print(f"total device self time: {total / 1e3:.1f} ms "
          f"({total / 1e3 / args.iters:.2f} ms/iter)")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {t / 1e3 / args.iters:8.3f} ms/iter {t / total:6.1%}  "
              f"{name}")


if __name__ == "__main__":
    main()

"""Microbenchmark: NMN train step at the VERDICT target shape.

B=128, H=512, F=64, bf16 (the REPORT.md roofline shape). Uses the axon
timing recipe: N chained iterations inside ONE jit (lax.scan with a real
data dependency) and a single block, so tunnel latency and dispatch async
don't pollute the numbers.

Usage: python scripts/bench_train_step.py [--iters 8] [--batch 128]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stair_tpu.testing import workload
from stair_tpu.train.losses import total_loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--no-dropout", action="store_true")
    ap.add_argument("--encoder", default=None)
    ap.add_argument("--decoder-only", action="store_true")
    ap.add_argument("--prng", default="threefry2x32",
                    choices=["threefry2x32", "rbg", "unsafe_rbg"])
    ap.add_argument("--ab-rev", action="store_true",
                    help="time the autodiff scan and the reversible "
                         "executor (STAIR_REV=1) alternately in one "
                         "process, so shared-host/chip contention hits "
                         "both arms equally")
    ap.add_argument("--ab-mega", action="store_true",
                    help="time the autodiff scan vs the training "
                         "megakernel (STAIR_MEGA_TRAIN=auto, "
                         "ops/mega_grad.py custom VJP) alternately in "
                         "one process")
    ap.add_argument("--ab-rounds", type=int, default=3)
    args = ap.parse_args()
    if args.ab_rev and args.ab_mega:
        ap.error("--ab-rev and --ab-mega are mutually exclusive "
                 "(each A/B owns the process's env-var routing)")
    jax.config.update("jax_default_prng_impl", args.prng)

    cfg = workload.workload_config(
        hidden_size=args.hidden, video_size=1024,
        max_video_length=args.frames,
    )
    over = {"compute_dtype": args.dtype}
    if args.no_dropout:
        over["dropout"] = 0.0
    if args.encoder:
        over["encoder"] = args.encoder
    cfg = type(cfg)(**{**cfg.to_dict(), **over})
    model, params = workload.build_model(cfg)
    batch = workload.make_batch(cfg, batch_size=args.batch)
    batch = workload.add_fake_supervision(batch, cfg)
    batch = jax.device_put(batch)
    params = jax.device_put(params)
    optimizer = optax.adam(1e-4)
    opt_state = jax.jit(optimizer.init)(params)

    if args.decoder_only:
        # Bypass the supervision-loss machinery: isolates the executor +
        # encoders + decoder fwd/bwd cost from the loss-side cost.
        def loss_fn(p, rng):
            out = model.forward(p, batch, rng=rng, deterministic=False)
            logits = out["logits"]
            lse = jax.nn.logsumexp(logits, axis=-1)
            picked = jnp.take_along_axis(
                logits, batch["answer"][:, None], axis=-1
            )[:, 0]
            return jnp.mean(lse - picked)
    else:
        def loss_fn(p, rng):
            return total_loss(
                model, p, batch, rng, 1.0, 1.0,
                jnp.float32(1.0), jnp.float32(1.0), deterministic=False,
            )[0]

    if args.fwd_only:
        def one(p, opt_state, rng):
            return p, opt_state, loss_fn(p, rng)
    else:
        def one(p, opt_state, rng):
            loss, grads = jax.value_and_grad(loss_fn)(p, rng)
            updates, opt_state = optimizer.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

    def make_chained():
        # Fresh function object per call: nmn.forward reads STAIR_REV at
        # trace time, so the A/B mode re-traces under each env setting.
        @jax.jit
        def chained(params, opt_state, rng):
            def body(carry, i):
                p, s, r = carry
                r = jax.random.fold_in(r, i)
                p, s, loss = one(p, s, r)
                return (p, s, r), loss

            (params, opt_state, _), losses = jax.lax.scan(
                body, (params, opt_state, rng), jnp.arange(args.iters)
            )
            return params, opt_state, losses

        return chained

    rng = jax.random.PRNGKey(0)

    if args.ab_rev or args.ab_mega:
        import os

        var = "STAIR_REV" if args.ab_rev else "STAIR_MEGA_TRAIN"
        alt = "1" if args.ab_rev else "auto"
        alt_name = "reversible" if args.ab_rev else "megakernel"
        # Pin BOTH kernel toggles so the "autodiff" arm is the plain XLA
        # scan regardless of the model's env defaults (STAIR_MEGA_TRAIN
        # defaults to auto on TPU since the accuracy study).
        os.environ["STAIR_REV"] = "0"
        os.environ["STAIR_MEGA_TRAIN"] = "0"
        arms = {}
        for name, env in (("autodiff", "0"), (alt_name, alt)):
            os.environ[var] = env
            fn = make_chained()
            t0 = time.perf_counter()
            _, _, losses = fn(params, opt_state, rng)
            np.asarray(losses)
            print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s, "
                  f"losses[-1]={losses[-1]:.4f}")
            arms[name] = fn
        times = {k: [] for k in arms}
        for _ in range(args.ab_rounds):
            for name, fn in arms.items():
                t0 = time.perf_counter()
                _, _, losses = fn(params, opt_state, rng)
                np.asarray(losses)
                times[name].append((time.perf_counter() - t0) / args.iters)
        for name, ts in times.items():
            ms = sorted(t * 1e3 for t in ts)
            print(f"{name}: best {ms[0]:.1f} ms/step, "
                  f"median {ms[len(ms) // 2]:.1f}, all "
                  + " ".join(f"{t:.1f}" for t in ms))
        return

    chained = make_chained()
    t0 = time.perf_counter()
    p2, s2, losses = chained(params, opt_state, rng)
    np.asarray(losses)  # fetch: block_until_ready is unreliable over tunnel
    compile_and_run = time.perf_counter() - t0

    t0 = time.perf_counter()
    p2, s2, losses = chained(params, opt_state, rng)
    np.asarray(losses)
    dt = time.perf_counter() - t0

    per_step = dt / args.iters
    print(f"compile+first: {compile_and_run:.1f}s")
    print(f"{'fwd' if args.fwd_only else 'train'} step @ B={args.batch} "
          f"H={args.hidden} F={args.frames} {args.dtype}: "
          f"{per_step * 1e3:.1f} ms/step "
          f"({args.batch / per_step:.0f} q/s), losses[-1]={losses[-1]:.3f}")

    from stair_tpu.utils.mfu import compiled_flops, format_mfu

    flops = compiled_flops(chained.lower(params, opt_state, rng).compile())
    per_step_flops = flops / args.iters if flops else None
    print(f"mfu: {format_mfu(per_step_flops, per_step)}"
          + (f" [{per_step_flops / 1e9:.1f} GFLOP/step]"
             if per_step_flops else ""))


if __name__ == "__main__":
    main()

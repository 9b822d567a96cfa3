"""Flash-attention block-shape sweep at the Video-ChatGPT flagship shape
(L=896 = 356 video + 540 text) — VERDICT r4 #5 (win at L=896 or prove
the ceiling).

Measures fwd+bwd wall time for dense XLA vs the padded Pallas kernel at
several (block_q, block_kv) shapes, with the q-tile skip (padded q rows
>= valid_len skip their whole KV loop). Timing is tunnel-robust: R
data-dependent repetitions chained inside ONE jit, fetch-terminated,
best of N calls.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/bench_attn_896.py \
    [--batch 4] [--heads 32] [--dhead 128] [--len 896] [--reps 8]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from stair_tpu.ops import attention as A


def timed_fn(fn, args_tuple, reps, calls=3):
    @jax.jit
    def run(*args):
        def body(carry, _):
            q = args[0] + carry * 1e-6
            out = fn(q, *args[1:])
            return jnp.sum(out).astype(jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return total

    np.asarray(run(*args_tuple))          # compile + warm
    best = float("inf")
    for _ in range(calls):
        t0 = time.perf_counter()
        np.asarray(run(*args_tuple))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--dhead", type=int, default=128)
    ap.add_argument("--len", type=int, default=896, dest="length")
    ap.add_argument("--prefix", type=int, default=356)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    B, H, L, D = args.batch, args.heads, args.length, args.dhead
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    pl_ = jnp.full((B,), args.prefix, jnp.int32)
    vl = jnp.full((B,), L, jnp.int32)
    scale = 1.0 / D ** 0.5

    def fwd_bwd(attn_fn):
        def f(q, k, v, pl_, vl):
            def loss(q, k, v):
                return jnp.sum(attn_fn(q, k, v, pl_, vl)
                               .astype(jnp.float32) ** 2)

            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
            return l + sum(jnp.sum(g.astype(jnp.float32) ** 2)
                           for g in grads)
        return f

    # Dense XLA reference at the raw length.
    dense = fwd_bwd(functools.partial(
        A.reference_attention, causal=True, sm_scale=scale))
    t_dense = timed_fn(dense, (q, k, v, pl_, vl), args.reps)
    print(f"dense L={L}: {t_dense * 1e3:.2f} ms (fwd+bwd)")

    # Padded kernel at several block shapes: force the router's decision
    # per arm (the public flash_attention keeps its custom-vjp backward).
    pq = -(-L // 512) * 512
    results = {"dense_ms": t_dense * 1e3}
    for bq, bkv in ((512, 512), (256, 512), (128, 512), (512, 256),
                    (256, 256)):
        orig = A._route

        def forced_route(q_, k_, bq=bq, bkv=bkv):
            return ("pad", bq, bkv, pq, pq)

        A._route = forced_route
        try:
            flash = fwd_bwd(functools.partial(
                A.flash_attention, causal=True, sm_scale=scale))
            t = timed_fn(flash, (q, k, v, pl_, vl), args.reps)
        finally:
            A._route = orig
        results[f"flash_bq{bq}_bkv{bkv}_ms"] = t * 1e3
        print(f"flash pad->{pq} bq={bq} bkv={bkv}: {t * 1e3:.2f} ms "
              f"({t_dense / t:.2f}x vs dense)")

    best_key = min((k for k in results if k.startswith("flash")),
                   key=lambda k: results[k])
    print("best:", best_key, f"{results[best_key]:.2f} ms, "
          f"{results['dense_ms'] / results[best_key]:.2f}x vs dense")


if __name__ == "__main__":
    main()

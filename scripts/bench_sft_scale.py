"""Billion-parameter Video-ChatGPT SFT feasibility on ONE TPU chip.

The reference trains a 7B Llama Video-ChatGPT on 8xA100-40GB
(video_chatgpt/train/train.py + scripts). This benchmark demonstrates the
single-chip regime our stack supports on a 16GB v5e: bf16 parameters,
adafactor (factored second moments, no momentum state), per-layer
rematerialization (DecoderConfig.remat), and the Pallas flash-attention
path — then reports step time, achieved TFLOP/s, MFU, and device memory.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/bench_sft_scale.py \
    [--size 1b|2b|3b] [--batch 4] [--seq 1024] [--iters 3]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stair_tpu.llm.clip import ClipVisionConfig
from stair_tpu.llm.decoder import DecoderConfig
from stair_tpu.llm.videochat import VideoChatConfig, VideoChatModel

SIZES = {
    # name: (d_model, heads, layers, d_ff)
    "1b": (2048, 16, 22, 5504),
    "2b": (2560, 20, 24, 6912),
    "3b": (2560, 20, 36, 6912),
}


def mem_report(tag):
    try:
        stats = jax.devices()[0].memory_stats()
        used = stats.get("bytes_in_use", 0) / 2**30
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        print(f"{tag}: {used:.2f} GiB in use, {peak:.2f} GiB peak")
    except Exception as err:
        print(f"{tag}: memory stats unavailable ({err!r})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1b", choices=sorted(SIZES))
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true")
    args = ap.parse_args()

    d, heads, layers, ff = SIZES[args.size]
    dec = DecoderConfig.llama(
        vocab_size=32000, d_model=d, num_heads=heads, num_layers=layers,
        d_ff=ff, max_len=max(args.seq, 1024), remat=not args.no_remat,
    )
    # Vision tower unused in SFT (video features arrive precomputed);
    # keep it tiny so its parameters don't count against the budget.
    vis = ClipVisionConfig(image_size=28, patch_size=14, d_model=1024,
                           num_heads=2, num_layers=1, d_ff=128)
    cfg = VideoChatConfig(decoder=dec, vision=vis, max_temporal=100)
    model = VideoChatModel(cfg)

    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    n_dec = sum(
        x.size for x in jax.tree_util.tree_leaves(params["decoder"])
    )
    print(f"{args.size}: {n_params/1e9:.2f}B params "
          f"({n_dec/1e9:.2f}B decoder), d={d} L{layers} ff={ff}, "
          f"B={args.batch} seq={args.seq}, remat={dec.remat}")
    params = jax.device_put(params)
    mem_report("after params")

    B, L = args.batch, args.seq
    V = cfg.video_token_len
    rng = np.random.RandomState(0)
    batch = {
        "token_ids": jnp.asarray(rng.randint(4, 32000, (B, L)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 32000, (B, L)), jnp.int32),
        "video_tokens": jnp.asarray(
            rng.randn(B, V, vis.d_model), jnp.bfloat16
        ),
        "splice_start": jnp.asarray(np.full(B, 2), jnp.int32),
        "valid_len": jnp.asarray(np.full(B, L), jnp.int32),
    }

    opt = optax.adafactor(learning_rate=2e-5)
    opt_state = jax.jit(opt.init)(params)
    mem_report("after opt init")

    def one(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(
            lambda p: model.sft_loss(p, batch)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    K = args.iters

    @jax.jit
    def run(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), jnp.arange(K)
        )
        return params, opt_state, losses

    t0 = time.perf_counter()
    p2, o2, losses = run(params, opt_state)
    np.asarray(losses)  # fetch: block_until_ready unreliable over tunnel
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(losses[-1]):.3f}")
    mem_report("after first run")

    t0 = time.perf_counter()
    p2, o2, losses = run(params, opt_state)
    np.asarray(losses)
    dt = (time.perf_counter() - t0) / K

    # Analytic model FLOPs (the Pallas attention is invisible to XLA cost
    # analysis): 6*P per token fwd+bwd + attention 12*B*L^2*d per layer,
    # +fwd recompute under remat (~1/3 more on the matmul terms).
    tokens = B * L
    matmul = 6.0 * n_dec * tokens
    attn = 12.0 * B * L * L * d * layers
    remat_factor = 4.0 / 3.0 if dec.remat else 1.0
    flops = (matmul + attn) * remat_factor
    from stair_tpu.utils.mfu import chip_peak_flops

    peak = chip_peak_flops() or float("nan")
    print(f"SFT step {args.size} B={B} L={L}: {dt*1e3:.1f} ms/step "
          f"({tokens/dt:.0f} tok/s), analytic {flops/dt/1e12:.1f} TFLOP/s "
          f"= {flops/dt/peak*100:.1f}% MFU "
          f"(incl. remat recompute), loss={float(losses[-1]):.3f}")
    mem_report("steady state")


if __name__ == "__main__":
    main()

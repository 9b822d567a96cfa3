"""Video-ChatGPT generation throughput: prefill + KV-cache decode.

The reference's inference path (video_chatgpt/inference.py:100-107,
eval/model_utils.py:127-131) is HF ``model.generate`` on a 7B Llama fp16
with a ~356-video-token + question prompt. This benchmark measures our
equivalent on one TPU chip at billion-parameter scale: flash-kernel
prefill over the spliced prompt, then a ``lax.scan`` KV-cache decode.

Decode is bandwidth-bound (every parameter is read once per generated
token), so alongside tokens/s this reports **MBU** — bytes of parameters
per token / decode time / chip peak HBM bandwidth — the
hardware-normalized utilization for generation, complementing the SFT
benchmarks' MFU.

Timing is tunnel-robust: ``generate`` runs prefill + all decode steps in
ONE jit; the per-token cost is the slope between a short and a long
generation (both fetch-terminated), so the fetch round trip cancels.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/bench_decode.py \
    [--size 1b|2b|3b] [--batch 1] [--prompt 536] [--new 16 128]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from stair_tpu.llm.clip import ClipVisionConfig
from stair_tpu.llm.decoder import DecoderConfig
from stair_tpu.llm.videochat import VideoChatConfig, VideoChatModel
from stair_tpu.utils.mfu import chip_peak_hbm_bw

SIZES = {
    # name: (d_model, heads, layers, d_ff) — Llama-class shapes
    "tiny": (256, 4, 2, 688),          # CPU smoke
    "1b": (2048, 16, 22, 5504),
    "2b": (2560, 20, 24, 6912),
    "3b": (2560, 20, 36, 6912),
    # Llama-7B shape (reference deployed regime, eval/model_utils.py:127):
    # 6.7B decoder params = 13.5 GB bf16 weights; decode fits one 16 GB
    # chip (training does not — that's the tp=2 regime).
    "7b": (4096, 32, 32, 11008),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1b", choices=sorted(SIZES))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt", type=int, default=536,
                    help="prompt length incl. the 356 video tokens "
                         "(reference regime: 356 video + question)")
    ap.add_argument("--new", type=int, nargs=2, default=(16, 128),
                    help="short/long generation lengths; per-token cost "
                         "is the slope between them")
    ap.add_argument("--reps-in-jit", type=int, default=8,
                    help="generations chained inside one jit so the "
                         "tunnel's fixed per-call cost amortizes")
    ap.add_argument("--fast-init", action="store_true",
                    help="constant bf16 weights via eval_shape instead "
                         "of RNG init. Decode wall time is weight-value-"
                         "independent (dense math), and sampling 6.7B "
                         "normals on this single host core costs tens "
                         "of minutes — the 7b arm's round-4/5 timeout.")
    args = ap.parse_args()

    d, heads, layers, ff = SIZES[args.size]
    n_short, n_long = args.new
    Lmax = args.prompt + n_long
    dec = DecoderConfig.llama(
        vocab_size=32000, d_model=d, num_heads=heads, num_layers=layers,
        d_ff=ff, max_len=Lmax,
    )
    vis = ClipVisionConfig(image_size=28, patch_size=14, d_model=1024,
                           num_heads=2, num_layers=1, d_ff=128)
    cfg = VideoChatConfig(decoder=dec, vision=vis, max_temporal=100)
    model = VideoChatModel(cfg)

    with jax.default_device(jax.devices("cpu")[0]):
        if args.fast_init:
            shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0))
            params = jax.tree_util.tree_map(
                lambda s: jnp.full(
                    s.shape, 0.01,
                    jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype,
                ),
                shapes,
            )
        else:
            params = model.init(jax.random.PRNGKey(0))
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params
            )
    n_dec = sum(
        x.size for x in jax.tree_util.tree_leaves(params["decoder"])
    )
    print(f"{args.size}: {n_dec/1e9:.2f}B decoder params, d={d} L{layers} "
          f"ff={ff}, B={args.batch} prompt={args.prompt} "
          f"decode {n_short}/{n_long}")
    params = jax.device_put(params)

    B, V = args.batch, cfg.video_token_len
    rng = np.random.RandomState(0)
    token_ids = jnp.asarray(
        rng.randint(4, 32000, (B, Lmax)), jnp.int32
    )
    video_tokens = jnp.asarray(rng.randn(B, V, vis.d_model), jnp.bfloat16)
    splice_start = jnp.asarray(np.full(B, 2), jnp.int32)
    prompt_len = jnp.asarray(np.full(B, args.prompt), jnp.int32)

    # Per-CALL overhead through the axon tunnel is huge (~a minute for a
    # graph this size) and independent of n, so a single generate per
    # timing call drowns the 112-token delta. Chain R generations inside
    # ONE jit (lax.scan, carry-dependent prompt so XLA cannot CSE the
    # repetitions) and slope-time between the short and long arms: the
    # fixed per-call cost cancels in the subtraction and the compute
    # delta is R-fold amplified above tunnel jitter.
    R = args.reps_in_jit

    @functools.partial(jax.jit, static_argnums=(1,))
    def gen(params, n):
        def body(carry, _):
            tid = token_ids.at[:, 0].set(4 + (carry % 8))
            out = model.generate(
                params, tid, video_tokens, splice_start, prompt_len,
                max_new_tokens=n, temperature=0.0,
            )
            return carry + jnp.sum(out[:, -1]).astype(jnp.int32), None

        total, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(R))
        return total

    def timed(n, reps=3):
        np.asarray(gen(params, n))      # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(gen(params, n))  # fetch-terminated
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = timed(n_short)
    t_long = timed(n_long)
    per_tok = (t_long - t_short) / (R * (n_long - n_short))
    prefill = max(t_short / R - n_short * per_tok, 0.0)

    # MBU: decode reads the decoder weights (2 bytes/param bf16) plus the
    # growing KV cache once per token; weights dominate at small batch.
    kv_bytes = 4 * layers * heads * (d // heads) * (
        args.prompt + (n_short + n_long) / 2
    ) * B * 2  # k+v, bf16
    bytes_per_tok = 2.0 * n_dec + kv_bytes
    bw = bytes_per_tok / per_tok
    peak_bw = chip_peak_hbm_bw()
    mbu = f"{bw / peak_bw * 100:.1f}% MBU" if peak_bw else "peak BW unknown"
    print(f"prefill({args.prompt} tok): <={prefill*1e3:.1f} ms "
          f"(incl. 1/{R} of the per-call dispatch); "
          f"decode: {per_tok*1e3:.2f} ms/tok "
          f"({1/per_tok:.1f} tok/s/seq x B={B} = {B/per_tok:.0f} tok/s), "
          f"{bw/1e9:.0f} GB/s = {mbu}")


if __name__ == "__main__":
    main()

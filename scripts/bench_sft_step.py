"""Microbenchmark: Video-ChatGPT SFT train step at GPT-2-small scale.

A ~161M-param Llama-class decoder with the reference's 356-token video
splice (100 temporal + 256 spatial), B=8 x L=512 conversation batches,
full fwd+bwd+adamw. Chains steps inside one jit (lax.scan) and blocks
once, per the axon timing recipe.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/bench_sft_step.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from stair_tpu.llm.videochat import VideoChatConfig, VideoChatModel
from stair_tpu.llm.decoder import DecoderConfig
from stair_tpu.llm.clip import ClipVisionConfig

# A ~125M-param Llama-class decoder (GPT-2-small scale) + CLIP-small-ish
# tower features, 356 video tokens + text, the reference SFT shape.
dec = DecoderConfig.llama(
    vocab_size=32000, d_model=768, num_heads=12, num_layers=12, d_ff=2048,
    max_len=1024,
)
vis = ClipVisionConfig(
    image_size=224, patch_size=14, d_model=1024, num_heads=16,
    num_layers=2, d_ff=4096,
)
cfg = VideoChatConfig(decoder=dec, vision=vis, max_temporal=100)
model = VideoChatModel(cfg)
params = model.init(jax.random.PRNGKey(0))
n = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"params: {n/1e6:.0f}M, video_token_len={cfg.video_token_len}")

B, L = 8, 512
rng = np.random.RandomState(0)
batch = {
    "token_ids": jnp.asarray(rng.randint(4, 32000, (B, L)), jnp.int32),
    "labels": jnp.asarray(rng.randint(0, 32000, (B, L)), jnp.int32),
    "video_tokens": jnp.asarray(rng.randn(B, cfg.video_token_len, 1024), jnp.float32),
    "splice_start": jnp.asarray(np.full(B, 2), jnp.int32),
    "valid_len": jnp.asarray(np.full(B, L), jnp.int32),
}
opt = optax.adamw(2e-5)
opt_state = jax.jit(opt.init)(params)

def one(carry, _):
    params, opt_state = carry
    loss, grads = jax.value_and_grad(lambda p: model.sft_loss(p, batch))(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return (optax.apply_updates(params, updates), opt_state), loss

@jax.jit
def run(params, opt_state):
    (params, opt_state), losses = jax.lax.scan(one, (params, opt_state), jnp.arange(6))
    return params, opt_state, losses

p2, o2, losses = run(params, opt_state)
np.asarray(losses)  # fetch: block_until_ready is unreliable over tunnel
t0 = time.perf_counter()
p2, o2, losses = run(params, opt_state)
np.asarray(losses)
dt = (time.perf_counter() - t0) / 6
print(f"SFT step B={B} L={L}: {dt*1e3:.1f} ms/step ({B/dt:.1f} seq/s), loss={float(losses[-1]):.3f}")

from stair_tpu.utils.mfu import compiled_flops, format_mfu

flops = compiled_flops(run.lower(params, opt_state).compile())
per_step_flops = flops / 6 if flops else None
print(f"mfu: {format_mfu(per_step_flops, dt)}"
      + (f" [{per_step_flops / 1e12:.2f} TFLOP/step]" if per_step_flops else ""))

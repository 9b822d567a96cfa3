"""Fused attention: a Pallas TPU flash-attention kernel with prefix-LM masks.

Replaces the reference's two attention mechanisms with one kernel:

  * the flash-attn CUDA monkey-patch used for Llama SFT
    (yellow-binary-tree/STAIR ``video_chatgpt/train/llama_flash_attn_monkey_patch.py``)
    — plain causal masking;
  * the VideoGPT2 dual mask (``VideoGPT2.py:56-82``), where video-prefix
    tokens are visible to every position on top of the causal triangle and
    padding is masked — expressed here as per-example scalars
    (``prefix_len``, ``valid_len``) rather than materialized mask tensors,
    so the kernel reads two SMEM integers per example instead of an
    [L, L] mask from HBM.

Forward is a tiled online-softmax kernel (one KV tile in VMEM at a time,
running max/sum correction — the standard flash recipe). Backward is a
``custom_vjp`` that recomputes attention with the same masking in plain XLA:
at this framework's sequence lengths (<=1-2k tokens) the recomputed backward
is bandwidth-comparable to a hand-written kernel and keeps the derivative
exactly consistent with the masked reference semantics.

Falls back to a pure-XLA path on non-TPU backends (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e30
LANES = 128


def _attention_mask(prefix_len, valid_len, q_len, kv_len, causal, q_offset=0):
    """[Lq, Lkv] boolean mask for one example."""
    rows = jnp.arange(q_len)[:, None] + q_offset
    cols = jnp.arange(kv_len)[None, :]
    ok = cols < valid_len
    if causal:
        ok &= (cols <= rows) | (cols < prefix_len)
    return ok


def reference_attention(q, k, v, prefix_len, valid_len, causal=True,
                        sm_scale=None):
    """Plain-XLA attention with identical masking (also the backward path).

    q: [B, H, Lq, D]; k/v: [B, H, Lkv, D]; prefix_len/valid_len: [B] int32.
    """
    B, H, Lq, D = q.shape
    Lkv = k.shape[2]
    scale = sm_scale if sm_scale is not None else 1.0 / jnp.sqrt(D)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    mask = jax.vmap(
        lambda p, n: _attention_mask(p, n, Lq, Lkv, causal)
    )(prefix_len, valid_len)                      # [B, Lq, Lkv]
    scores = jnp.where(mask[:, None], scores, MASK_VALUE)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------

def _flash_kernel(
    prefix_ref, valid_ref,               # scalar prefetch: [B] each
    q_ref, k_ref, v_ref,                 # [1, 1, block, D] VMEM tiles
    o_ref,                               # [1, 1, block_q, D]
    m_scratch, l_scratch, acc_scratch,
    *, block_q, block_kv, kv_len, causal, sm_scale,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    prefix = prefix_ref[b]
    valid = valid_ref[b]

    q_start = qi * block_q
    kv_start = ki * block_kv
    # Skip tiles that are entirely masked: strictly above the causal diagonal
    # AND beyond the visible prefix, or entirely past the valid length.
    run = kv_start < valid
    if causal:
        run &= (kv_start <= q_start + block_q - 1) | (kv_start < prefix)

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]                                   # [block_q, D]
        k = k_ref[0, 0]                                   # [block_kv, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                      # [block_q, block_kv]

        rows = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 0) + q_start
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1) + kv_start
        ok = cols < valid
        if causal:
            ok &= (cols <= rows) | (cols < prefix)
        s = jnp.where(ok, s, MASK_VALUE)

        m_prev = m_scratch[...]                           # [block_q, LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1)[:, None]              # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)              # [block_q, LANES]
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])                    # [block_q, block_kv]
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.sum(p, axis=1)[:, None]
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, 0]                                   # [block_kv, D]
        acc_scratch[...] = (
            acc_scratch[...] * alpha[:, : acc_scratch.shape[-1]]
            + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
        )

    @pl.when(ki == pl.num_programs(3) - 1)
    def _store():
        l = l_scratch[...][:, : o_ref.shape[-1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scratch[...] / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, prefix_len, valid_len, causal, sm_scale,
                   block_q=128, block_kv=128, interpret=False):
    B, H, Lq, D = q.shape
    Lkv = k.shape[2]
    block_q = min(block_q, Lq)
    block_kv = min(block_kv, Lkv)
    if Lq % block_q or Lkv % block_kv:
        raise ValueError(f"seq lengths ({Lq},{Lkv}) must divide blocks "
                         f"({block_q},{block_kv})")
    grid = (B, H, Lq // block_q, Lkv // block_kv)
    kernel = functools.partial(
        _flash_kernel,
        block_q=block_q, block_kv=block_kv, kv_len=Lkv,
        causal=causal, sm_scale=sm_scale,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, block_kv, D),
                             lambda b, h, qi, ki, *_: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, block_kv, D),
                             lambda b, h, qi, ki, *_: (b, h, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D),
                                   lambda b, h, qi, ki, *_: (b, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary"
            ),
        ),
        interpret=interpret,
    )(prefix_len.astype(jnp.int32), valid_len.astype(jnp.int32), q, k, v)


# ---------------------------------------------------------------------------
# Public API with custom VJP (recompute backward)
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            return dev.platform == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pick_block(length: int, preferred: int = 128) -> int | None:
    """Largest MXU-friendly block that divides ``length`` (None = no fit)."""
    for b in (preferred, 256, 128, 64, 32, 16, 8):
        if b <= length and length % b == 0:
            return b
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention(q, k, v, prefix_len, valid_len, causal=True,
                    sm_scale=None):
    """Fused masked attention.

    q: [B, H, Lq, D]; k/v: [B, H, Lkv, D];
    prefix_len: [B] — per-example fully-visible prefix (0 = plain causal);
    valid_len:  [B] — per-example number of real (non-pad) KV positions.
    """
    scale = sm_scale if sm_scale is not None else 1.0 / q.shape[-1] ** 0.5
    bq = _pick_block(q.shape[2])
    bkv = _pick_block(k.shape[2])
    if _on_tpu() and bq and bkv and q.shape[-1] <= LANES:
        return _flash_forward(
            q, k, v, prefix_len, valid_len, causal, scale,
            block_q=bq, block_kv=bkv,
        )
    return reference_attention(q, k, v, prefix_len, valid_len, causal, scale)


def _fwd(q, k, v, prefix_len, valid_len, causal, sm_scale):
    out = flash_attention(q, k, v, prefix_len, valid_len, causal, sm_scale)
    return out, (q, k, v, prefix_len, valid_len)


def _bwd(causal, sm_scale, residuals, g):
    q, k, v, prefix_len, valid_len = residuals

    def f(q, k, v):
        return reference_attention(
            q, k, v, prefix_len, valid_len, causal, sm_scale
        )

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


flash_attention.defvjp(_fwd, _bwd)

"""Masked bidirectional LSTM via ``lax.scan``.

The reference encodes questions and videos with cuDNN BiLSTMs
(yellow-binary-tree/STAIR ``video_nmn/module_net.py:39-47``). On TPU the
input projection is hoisted out of the recurrence as one big MXU matmul
([L, D] @ [D, 4h]) and only the [h, 4h] recurrent matmul rides the scan.
Sequences are padded; masked steps carry state through unchanged, which makes
the final forward carry equal the state at the true last token and (running
the reverse direction over the reversed sequence) the final backward carry
equal the state at token 0 — exactly torch's ``h_n`` semantics for packed
sequences.

Gate layout follows torch: [input, forget, cell, output] chunks of size h.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_lstm_params(rng, input_size: int, hidden_size: int) -> dict:
    """One bidirectional layer. torch-style U(-1/sqrt(h), 1/sqrt(h)) init.

    Weights are stored transposed from torch: wi [D, 4h], wh [h, 4h]; torch's
    two bias vectors (b_ih, b_hh) are kept separate for exact parity.
    """
    bound = 1.0 / np.sqrt(hidden_size)
    keys = jax.random.split(rng, 8)

    def u(key, shape):
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

    def direction(ks):
        return {
            "wi": u(ks[0], (input_size, 4 * hidden_size)),
            "wh": u(ks[1], (hidden_size, 4 * hidden_size)),
            "bi": u(ks[2], (4 * hidden_size,)),
            "bh": u(ks[3], (4 * hidden_size,)),
        }

    return {"fwd": direction(keys[:4]), "bwd": direction(keys[4:])}


def _mm(a, b, mm_dtype):
    """Matmul, optionally running the MXU in a lower precision while
    accumulating (and carrying state) in float32."""
    if mm_dtype is None:
        return a @ b
    return jnp.dot(
        a.astype(mm_dtype), b.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )


def _direction_scan(p, x, mask, mm_dtype=None):
    """One direction over [L, D] with mask [L]; returns (h_seq [L, h], h_last)."""
    h_dim = p["wh"].shape[0]
    wh = p["wh"] if mm_dtype is None else p["wh"].astype(mm_dtype)
    if mm_dtype is None:
        x_proj = x @ p["wi"] + p["bi"] + p["bh"]    # [L, 4h], hoisted
        bias = None
    else:
        # Store the hoisted projection in the compute dtype: the f32
        # [L, 4h] stack is the encoder's dominant HBM stream (profiled
        # ~2 x 270 MB per direction per batch at B=1024/F=64 video
        # encode — ~1.5 ms/forward of write+readback). The bias sum is
        # re-added per step in f32 so only the matmul output is rounded.
        x_proj = _mm(x, p["wi"], mm_dtype).astype(mm_dtype)
        bias = (p["bi"] + p["bh"]).astype(jnp.float32)

    def step(carry, inp):
        h, c = carry
        gates_x, valid = inp
        if bias is not None:
            gates_x = gates_x.astype(jnp.float32) + bias
        gates = gates_x + _mm(h, wh, mm_dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        return (h, c), h

    init = (jnp.zeros((h_dim,)), jnp.zeros((h_dim,)))
    (h_last, _), h_seq = jax.lax.scan(step, init, (x_proj, mask[:, None]))
    return h_seq, h_last


def bilstm(params, x, mask, mm_dtype=None):
    """Run the BiLSTM on one sequence.

    Args:
      x: [L, D] padded sequence; mask: [L] validity.
      mm_dtype: optional lower precision for the matmuls (state and
        accumulation stay float32) — set by the model in bf16 compute mode.
    Returns:
      token_features [L, 2h] (zeroed on padding) and the sentence feature
      [2h] = concat(final forward state, final backward state).
    """
    fwd_seq, fwd_last = _direction_scan(params["fwd"], x, mask, mm_dtype)
    bwd_seq_rev, bwd_last = _direction_scan(
        params["bwd"], x[::-1], mask[::-1], mm_dtype
    )
    bwd_seq = bwd_seq_rev[::-1]
    tokens = jnp.concatenate([fwd_seq, bwd_seq], axis=-1) * mask[:, None]
    sentence = jnp.concatenate([fwd_last, bwd_last], axis=-1)
    return tokens, sentence


# ---------------------------------------------------------------------------
# Transformer encoder alternative (--encoder transformer)
# ---------------------------------------------------------------------------

def init_transformer_encoder_params(rng, input_size: int, hidden_size: int,
                                    num_layers: int = 2, num_heads: int = 4,
                                    max_len: int = 512) -> dict:
    """A small pre-norm transformer encoder with the BiLSTM's interface.

    The reference is LSTM-only; SURVEY §7 flags a transformer encoder as the
    config-flagged alternative — parallel over the sequence (no recurrence),
    which maps far better onto the MXU than a 64-step scan.
    """
    from stair_tpu.models.modules import _init_linear

    H = hidden_size
    keys = iter(jax.random.split(rng, 4 + 6 * num_layers))

    def lin(fi, fo):
        return _init_linear(next(keys), fi, fo)

    def ln():
        return {"scale": jnp.ones((H,)), "bias": jnp.zeros((H,))}

    return {
        "in_proj": lin(input_size, H),
        "pos": jax.random.normal(next(keys), (max_len, H)) * 0.02,
        "layers": [
            {
                "ln1": ln(),
                "q": lin(H, H), "k": lin(H, H), "v": lin(H, H),
                "o": lin(H, H),
                "ln2": ln(),
                "up": lin(H, 2 * H), "down": lin(2 * H, H),
            }
            for _ in range(num_layers)
        ],
        "ln_f": ln(),
    }


def transformer_encode(params, x, mask, num_heads: int = 4):
    """[L, D] + [L] mask -> (token_features [L, H], sentence feature [H]).

    Sentence feature = masked mean of token features (the transformer
    counterpart of the BiLSTM's final-state concat).
    """
    from stair_tpu.models.modules import layer_norm, linear

    L = x.shape[0]
    h = linear(params["in_proj"], x) + params["pos"][:L]
    heads = num_heads
    attn_mask = (mask > 0)[None, :]
    for layer in params["layers"]:
        a_in = layer_norm(layer["ln1"], h)
        hd = a_in.shape[-1] // heads
        q = linear(layer["q"], a_in).reshape(L, heads, hd)
        k = linear(layer["k"], a_in).reshape(L, heads, hd)
        v = linear(layer["v"], a_in).reshape(L, heads, hd)
        s = jnp.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
        s = jnp.where(attn_mask[None], s, -1e30)
        w = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", w, v).reshape(L, -1)
        h = h + linear(layer["o"], attn)
        m_in = layer_norm(layer["ln2"], h)
        h = h + linear(layer["down"], jax.nn.gelu(linear(layer["up"], m_in)))
    tokens = layer_norm(params["ln_f"], h) * mask[:, None]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    sentence = jnp.sum(tokens, axis=0) / denom
    return tokens, sentence

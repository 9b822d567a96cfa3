"""Pre-norm encoder-decoder transformer (the T5-class program parser).

Replaces the reference's fine-tuned Flan-T5-Large path
(yellow-binary-tree/STAIR ``hf_program_parser.py``). The parsing task is a
closed-vocabulary transduction that the reference reports converging in
<0.1 epoch (README.md:152), so a compact from-scratch encoder-decoder is the
TPU-native replacement: same data contract, same beam-decode + validity
filter, no 770M-parameter dependency. Sequence lengths are tiny (<=48), so
plain fused SDPA is the right kernel here; the Pallas flash-attention path
(stair_tpu.ops.attention) serves the long-sequence LLM models.

Incremental decoding re-runs the decoder prefix each step — at these lengths
that is cheaper than maintaining KV caches and keeps the beam-search state a
plain token buffer.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from stair_tpu.models.modules import _init_linear, linear

NEG_INF = -1e30


@dataclass(frozen=True)
class TransformerSeq2SeqConfig:
    src_vocab: int
    tgt_vocab: int
    d_model: int = 256
    num_heads: int = 4
    num_layers: int = 3
    d_ff: int = 512
    max_src_len: int = 32
    max_tgt_len: int = 48


def _layer_norm(p, x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mha(p, q_in, kv_in, mask, num_heads):
    """mask: [B, Lq, Lk] additive-legal boolean."""
    B, Lq, D = q_in.shape
    Lk = kv_in.shape[1]
    h = num_heads
    d = D // h
    q = linear(p["q"], q_in).reshape(B, Lq, h, d)
    k = linear(p["k"], kv_in).reshape(B, Lk, h, d)
    v = linear(p["v"], kv_in).reshape(B, Lk, h, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d)
    scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Lq, D)
    return linear(p["o"], out)


def _ffn(p, x):
    return linear(p["w2"], jax.nn.gelu(linear(p["w1"], x)))


def _init_attn(rng, d):
    ks = jax.random.split(rng, 4)
    return {n: _init_linear(k, d, d) for n, k in zip("qkvo", ks)}


def _init_ln(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _sinusoid(max_len, d):
    pos = jnp.arange(max_len)[:, None]
    dim = jnp.arange(d // 2)[None, :]
    angle = pos / jnp.power(10000.0, 2 * dim / d)
    return jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)


class TransformerSeq2Seq:
    def __init__(self, config: TransformerSeq2SeqConfig):
        self.config = config

    def init(self, rng):
        cfg = self.config
        D, F = cfg.d_model, cfg.d_ff
        keys = iter(jax.random.split(rng, 8 + 8 * cfg.num_layers))

        def enc_layer():
            return {
                "ln1": _init_ln(D), "attn": _init_attn(next(keys), D),
                "ln2": _init_ln(D),
                "ffn": {"w1": _init_linear(next(keys), D, F),
                        "w2": _init_linear(next(keys), F, D)},
            }

        def dec_layer():
            return {
                "ln1": _init_ln(D), "self": _init_attn(next(keys), D),
                "ln2": _init_ln(D), "cross": _init_attn(next(keys), D),
                "ln3": _init_ln(D),
                "ffn": {"w1": _init_linear(next(keys), D, F),
                        "w2": _init_linear(next(keys), F, D)},
            }

        scale = 1.0 / jnp.sqrt(D)
        return {
            "src_embed": jax.random.normal(
                next(keys), (cfg.src_vocab, D)) * scale,
            "tgt_embed": jax.random.normal(
                next(keys), (cfg.tgt_vocab, D)) * scale,
            "enc": [enc_layer() for _ in range(cfg.num_layers)],
            "dec": [dec_layer() for _ in range(cfg.num_layers)],
            "enc_ln": _init_ln(D),
            "dec_ln": _init_ln(D),
            "logit": _init_linear(next(keys), D, cfg.tgt_vocab),
        }

    def encode(self, params, src_ids, src_mask):
        cfg = self.config
        x = params["src_embed"][src_ids]
        x = x + _sinusoid(x.shape[1], cfg.d_model)[None]
        attn_mask = (src_mask[:, None, :] > 0) & jnp.ones(
            (1, x.shape[1], 1), bool
        )
        for layer in params["enc"]:
            x = x + _mha(layer["attn"], _layer_norm(layer["ln1"], x),
                         _layer_norm(layer["ln1"], x), attn_mask,
                         cfg.num_heads)
            x = x + _ffn(layer["ffn"], _layer_norm(layer["ln2"], x))
        return _layer_norm(params["enc_ln"], x)

    def _decode(self, params, encoded, src_mask, tgt_in, tgt_mask):
        """tgt_in [B, T] -> logits [B, T, V] (causal)."""
        cfg = self.config
        B, T = tgt_in.shape
        x = params["tgt_embed"][tgt_in]
        x = x + _sinusoid(T, cfg.d_model)[None]
        causal = jnp.tril(jnp.ones((T, T), bool))
        self_mask = causal[None] & (tgt_mask[:, None, :] > 0)
        cross_mask = jnp.broadcast_to(
            (src_mask[:, None, :] > 0), (B, T, src_mask.shape[1])
        )
        for layer in params["dec"]:
            h = _layer_norm(layer["ln1"], x)
            x = x + _mha(layer["self"], h, h, self_mask, cfg.num_heads)
            x = x + _mha(layer["cross"], _layer_norm(layer["ln2"], x),
                         encoded, cross_mask, cfg.num_heads)
            x = x + _ffn(layer["ffn"], _layer_norm(layer["ln3"], x))
        x = _layer_norm(params["dec_ln"], x)
        return linear(params["logit"], x)

    def logits(self, params, src_ids, src_mask, tgt_in):
        encoded = self.encode(params, src_ids, src_mask)
        tgt_mask = jnp.ones_like(tgt_in, jnp.float32)
        return self._decode(params, encoded, src_mask, tgt_in, tgt_mask)

    # -- incremental interface for beam search -------------------------------

    def init_state(self, params, encoded, src_mask):
        cfg = self.config
        B = encoded.shape[0]
        return {
            "encoded": encoded,
            "src_mask": src_mask,
            "tokens": jnp.zeros((B, cfg.max_tgt_len), jnp.int32),
            "pos": jnp.zeros((), jnp.int32),
        }

    def step(self, params, state, token):
        cfg = self.config
        pos = state["pos"]
        tokens = jax.vmap(
            lambda row, t: row.at[pos].set(t)
        )(state["tokens"], token)
        tgt_mask = (
            jnp.arange(cfg.max_tgt_len)[None, :] <= pos
        ).astype(jnp.float32) * jnp.ones((tokens.shape[0], 1))
        logits = self._decode(
            params, state["encoded"], state["src_mask"], tokens, tgt_mask
        )
        step_logits = logits[:, pos, :]
        return dict(state, tokens=tokens, pos=pos + 1), step_logits

"""T5 encoder-decoder (the pretrained Flan-T5 program-parser path).

The reference's best parser recipe fine-tunes Flan-T5-Large via HF Trainer
(yellow-binary-tree/STAIR ``hf_program_parser.py:142-205``). This is the
TPU-native T5 implementation that runs that recipe from imported HF weights
(:func:`stair_tpu.llm.import_weights.import_t5`) or trains from scratch on
the word-level program vocabulary (``--arch t5``).

Architecture notes (numerics match transformers' T5 — parity-tested in
tests/test_llm_parity.py):

  * RMS layer norm (no mean subtraction, no bias), computed in float32;
  * attention projections without bias, inner dim = num_heads * d_kv, and
    NO 1/sqrt(d) score scaling (T5 folds it into initialization);
  * bucketed relative-position bias, embedded once per stack (first block
    owns the table) and added to every self-attention's scores; encoder
    buckets are bidirectional, decoder causal; cross-attention has none;
  * feed-forward: ``relu`` (t5 v1.0) or ``gated-gelu`` (v1.1 / Flan);
  * logits: tied embeddings scale hidden by d_model**-0.5 (v1.0); untied
    checkpoints (Flan) use a separate lm_head without scaling.

Exposes the same ``encode`` / ``init_state`` / ``step`` protocol as the
other parsers, so :func:`stair_tpu.seq2seq.beam.beam_search` drives it
unchanged (decoder start token = pad id, per T5 convention). ``step``
re-runs the decoder prefix — at parser output lengths (<=48 tokens) this is
cheaper than a KV cache and keeps beam state a plain token buffer.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


@dataclass(frozen=True)
class T5Config:
    vocab_size: int
    d_model: int = 512
    d_kv: int = 64
    num_heads: int = 8
    num_layers: int = 6
    num_decoder_layers: int = 6
    d_ff: int = 2048
    feed_forward: str = "relu"          # 'relu' | 'gated-gelu'
    num_buckets: int = 32
    max_distance: int = 128
    rms_eps: float = 1e-6
    tie_word_embeddings: bool = True
    max_src_len: int = 32
    max_tgt_len: int = 48

    # beam_search reads the target vocab size from config.tgt_vocab.
    @property
    def tgt_vocab(self) -> int:
        return self.vocab_size


def rms_norm(scale, x, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def relative_position_bucket(relative_position, bidirectional, num_buckets,
                             max_distance):
    """Standard T5 bucketing of (memory_pos - query_pos) distances."""
    ret = jnp.zeros_like(relative_position)
    n = relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = -jnp.minimum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def _position_bias(table, q_len, k_len, bidirectional, num_buckets,
                   max_distance):
    """[heads, q_len, k_len] from the bucket-embedding ``table``."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, bidirectional, num_buckets, max_distance
    )                                                   # [q, k]
    return jnp.moveaxis(table[buckets], -1, 0)          # [h, q, k]


def _init_dense(rng, d_in, d_out, scale=1.0):
    return {"w": jax.random.normal(rng, (d_in, d_out))
            * (scale / np.sqrt(d_in))}


def _attn(p, q_in, kv_in, bias, num_heads, d_kv):
    """T5 attention: unscaled scores + additive ``bias`` [h or 1, Lq, Lk]."""
    B, Lq, _ = q_in.shape
    Lk = kv_in.shape[1]
    q = (q_in @ p["q"]["w"]).reshape(B, Lq, num_heads, d_kv)
    k = (kv_in @ p["k"]["w"]).reshape(B, Lk, num_heads, d_kv)
    v = (kv_in @ p["v"]["w"]).reshape(B, Lk, num_heads, d_kv)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) + bias
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Lq, -1)
    return out @ p["o"]["w"]


def _ffn(p, x, kind):
    if kind == "gated-gelu":
        h = jax.nn.gelu(x @ p["wi_0"]["w"], approximate=True) * (
            x @ p["wi_1"]["w"]
        )
    else:
        h = jax.nn.relu(x @ p["wi"]["w"])
    return h @ p["wo"]["w"]


class T5Seq2Seq:
    def __init__(self, config: T5Config):
        self.config = config

    # -- init -----------------------------------------------------------------

    def init(self, rng):
        cfg = self.config
        D, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
        n_keys = 8 + 8 * cfg.num_layers + 12 * cfg.num_decoder_layers
        keys = iter(jax.random.split(rng, n_keys))

        def attn_block():
            return {
                "q": _init_dense(next(keys), D, inner),
                "k": _init_dense(next(keys), D, inner),
                "v": _init_dense(next(keys), D, inner),
                "o": _init_dense(next(keys), inner, D),
            }

        def ffn_block():
            if cfg.feed_forward == "gated-gelu":
                return {
                    "wi_0": _init_dense(next(keys), D, cfg.d_ff),
                    "wi_1": _init_dense(next(keys), D, cfg.d_ff),
                    "wo": _init_dense(next(keys), cfg.d_ff, D),
                }
            return {
                "wi": _init_dense(next(keys), D, cfg.d_ff),
                "wo": _init_dense(next(keys), cfg.d_ff, D),
            }

        params = {
            "shared": jax.random.normal(next(keys), (cfg.vocab_size, D)),
            "enc_rel": jax.random.normal(
                next(keys), (cfg.num_buckets, cfg.num_heads)) * 0.1,
            "dec_rel": jax.random.normal(
                next(keys), (cfg.num_buckets, cfg.num_heads)) * 0.1,
            "enc": [
                {"ln1": jnp.ones((D,)), "attn": attn_block(),
                 "ln2": jnp.ones((D,)), "ffn": ffn_block()}
                for _ in range(cfg.num_layers)
            ],
            "dec": [
                {"ln1": jnp.ones((D,)), "self": attn_block(),
                 "ln2": jnp.ones((D,)), "cross": attn_block(),
                 "ln3": jnp.ones((D,)), "ffn": ffn_block()}
                for _ in range(cfg.num_decoder_layers)
            ],
            "enc_ln": jnp.ones((D,)),
            "dec_ln": jnp.ones((D,)),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = _init_dense(next(keys), D, cfg.vocab_size)
        return params

    # -- stacks ---------------------------------------------------------------

    def encode(self, params, src_ids, src_mask):
        cfg = self.config
        x = params["shared"][src_ids]
        L = x.shape[1]
        bias = _position_bias(
            params["enc_rel"], L, L, True, cfg.num_buckets, cfg.max_distance
        )[None]                                         # [1, h, L, L]
        bias = bias + jnp.where(
            src_mask[:, None, None, :] > 0, 0.0, NEG_INF
        )
        for layer in params["enc"]:
            x = x + _attn(
                layer["attn"], rms_norm(layer["ln1"], x, cfg.rms_eps),
                rms_norm(layer["ln1"], x, cfg.rms_eps), bias,
                cfg.num_heads, cfg.d_kv,
            )
            x = x + _ffn(layer["ffn"], rms_norm(layer["ln2"], x, cfg.rms_eps),
                         cfg.feed_forward)
        return rms_norm(params["enc_ln"], x, cfg.rms_eps)

    def _decode(self, params, encoded, src_mask, tgt_in, tgt_mask):
        cfg = self.config
        B, T = tgt_in.shape
        x = params["shared"][tgt_in]
        self_bias = _position_bias(
            params["dec_rel"], T, T, False, cfg.num_buckets, cfg.max_distance
        )[None]
        causal = jnp.tril(jnp.ones((T, T), bool))
        legal = causal[None, :, :] & (tgt_mask[:, None, :] > 0)
        self_bias = self_bias + jnp.where(legal[:, None], 0.0, NEG_INF)
        cross_bias = jnp.where(
            src_mask[:, None, None, :] > 0, 0.0, NEG_INF
        )                                               # [B, 1, 1, Lk]
        for layer in params["dec"]:
            h = rms_norm(layer["ln1"], x, cfg.rms_eps)
            x = x + _attn(layer["self"], h, h, self_bias,
                          cfg.num_heads, cfg.d_kv)
            x = x + _attn(
                layer["cross"], rms_norm(layer["ln2"], x, cfg.rms_eps),
                encoded, cross_bias, cfg.num_heads, cfg.d_kv,
            )
            x = x + _ffn(layer["ffn"], rms_norm(layer["ln3"], x, cfg.rms_eps),
                         cfg.feed_forward)
        x = rms_norm(params["dec_ln"], x, cfg.rms_eps)
        if cfg.tie_word_embeddings:
            return (x * cfg.d_model ** -0.5) @ params["shared"].T
        return x @ params["lm_head"]["w"]

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
        return dict(state, tokens=tokens, pos=pos + 1), logits[:, pos, :]

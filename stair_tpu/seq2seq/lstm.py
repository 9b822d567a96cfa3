"""Attention LSTM encoder-decoder (the fairseq-class program parser).

BiLSTM encoder over question tokens; unidirectional LSTM decoder with dot
attention over encoder states (the architecture family of fairseq's
``--arch lstm`` used by the reference README workflow, README.md:99-126).
Exposes the incremental-decode interface :mod:`stair_tpu.seq2seq.beam`
expects: ``encode``, ``init_state``, ``step``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from stair_tpu.models.modules import _init_linear, linear
from stair_tpu.ops.lstm import bilstm, init_lstm_params


@dataclass(frozen=True)
class LSTMSeq2SeqConfig:
    src_vocab: int
    tgt_vocab: int
    embed_dim: int = 256
    hidden: int = 256
    max_src_len: int = 32
    max_tgt_len: int = 48


class LSTMSeq2Seq:
    def __init__(self, config: LSTMSeq2SeqConfig):
        self.config = config

    def init(self, rng):
        cfg = self.config
        ks = jax.random.split(rng, 8)
        E, H = cfg.embed_dim, cfg.hidden
        bound = 0.1
        dec = init_lstm_params(ks[2], E + H, H)["fwd"]  # decoder input: emb+ctx
        return {
            "src_embed": jax.random.uniform(
                ks[0], (cfg.src_vocab, E), jnp.float32, -bound, bound
            ),
            "tgt_embed": jax.random.uniform(
                ks[1], (cfg.tgt_vocab, E), jnp.float32, -bound, bound
            ),
            "encoder": init_lstm_params(ks[3], E, H // 2),
            "decoder": dec,
            "attn_proj": _init_linear(ks[4], H, H),
            "out_proj": _init_linear(ks[5], 2 * H, H),
            "logit": _init_linear(ks[6], H, cfg.tgt_vocab),
        }

    # -- encoder -------------------------------------------------------------

    def encode(self, params, src_ids, src_mask):
        """[B, S] -> encoder states [B, S, H]."""
        emb = params["src_embed"][src_ids]
        states, _ = jax.vmap(
            lambda x, m: bilstm(params["encoder"], x, m)
        )(emb, src_mask)
        return states

    def init_state(self, params, encoded, src_mask):
        B = encoded.shape[0]
        H = self.config.hidden
        return {
            "h": jnp.zeros((B, H)),
            "c": jnp.zeros((B, H)),
            "ctx": jnp.zeros((B, H)),
            "encoded": encoded,
            "src_mask": src_mask,
        }

    # -- one decode step -----------------------------------------------------

    def step(self, params, state, token):
        """token [B] -> (new_state, logits [B, V])."""
        emb = params["tgt_embed"][token]                       # [B, E]
        x = jnp.concatenate([emb, state["ctx"]], axis=-1)
        p = params["decoder"]
        gates = x @ p["wi"] + p["bi"] + p["bh"] + state["h"] @ p["wh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c = f * state["c"] + i * jnp.tanh(g)
        h = o * jnp.tanh(c)

        # Dot attention over encoder states.
        query = linear(params["attn_proj"], h)                 # [B, H]
        scores = jnp.einsum("bh,bsh->bs", query, state["encoded"])
        scores = jnp.where(state["src_mask"] > 0, scores, -jnp.inf)
        w = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bs,bsh->bh", w, state["encoded"])

        out = jnp.tanh(
            linear(params["out_proj"], jnp.concatenate([h, ctx], axis=-1))
        )
        logits = linear(params["logit"], out)
        new_state = dict(state, h=h, c=c, ctx=ctx)
        return new_state, logits

    # -- teacher-forced training ---------------------------------------------

    def logits(self, params, src_ids, src_mask, tgt_in):
        """Teacher forcing: tgt_in [B, T] (BOS-shifted) -> logits [B, T, V]."""
        encoded = self.encode(params, src_ids, src_mask)
        state0 = self.init_state(params, encoded, src_mask)

        def scan_fn(state, tok):
            state, logits = self.step(params, state, tok)
            return state, logits

        _, out = jax.lax.scan(scan_fn, state0, tgt_in.T)
        return jnp.moveaxis(out, 0, 1)                         # [B, T, V]

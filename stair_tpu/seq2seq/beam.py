"""Batched beam search over the incremental seq2seq interface.

Fully compiled: the whole decode is one ``lax.scan`` over time steps with a
static beam width; works with any model exposing ``encode`` /
``init_state`` / ``step`` (LSTM and transformer parsers). Finished beams are
frozen by forcing PAD continuations at zero cost, matching fairseq-style
n-best output (the reference decodes beam=5, n-best=5,
hf_program_parser.py:180-205).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stair_tpu.seq2seq.vocab import BOS, EOS, PAD

NEG_INF = -1e30


def _tile_beams(tree, beam):
    """[B, ...] -> [B*K, ...] by repeating each row K times."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, beam, axis=0)
        if getattr(x, "ndim", 0) >= 1 and x.shape != () else x,
        tree,
    )


def beam_search(model, params, src_ids, src_mask, beam_size=5, max_len=48,
                bos=BOS, eos=EOS, pad=PAD):
    """Returns (tokens [B, K, max_len], scores [B, K]) sorted best-first.

    ``bos``/``eos``/``pad`` default to the word-level parser vocabulary;
    pretrained T5 decodes with bos=pad=0, eos=1 (sentencepiece convention).
    """
    B = src_ids.shape[0]
    K = beam_size
    V = model.config.tgt_vocab
    BOS_, EOS_, PAD_ = bos, eos, pad

    encoded = model.encode(params, src_ids, src_mask)
    state = model.init_state(
        params,
        jnp.repeat(encoded, K, axis=0),
        jnp.repeat(src_mask, K, axis=0),
    )

    scores0 = jnp.full((B, K), NEG_INF).at[:, 0].set(0.0)
    tokens0 = jnp.full((B, K, max_len), PAD_, jnp.int32)
    prev0 = jnp.full((B * K,), BOS_, jnp.int32)
    fin0 = jnp.zeros((B, K), bool)

    def step_fn(carry, t):
        state, scores, tokens, prev, finished = carry
        state, logits = model.step(params, state, prev)
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
        # Finished beams may only extend with PAD, for free.
        pad_only = jnp.full((V,), NEG_INF).at[PAD_].set(0.0)
        logp = jnp.where(finished[:, :, None], pad_only[None, None, :], logp)

        total = scores[:, :, None] + logp                      # [B, K, V]
        flat = total.reshape(B, K * V)
        new_scores, flat_idx = jax.lax.top_k(flat, K)          # [B, K]
        parent = flat_idx // V                                 # [B, K]
        token = flat_idx % V                                   # [B, K]

        # Reorder beam-major state rows.
        gather = (jnp.arange(B)[:, None] * K + parent).reshape(-1)
        state = jax.tree_util.tree_map(
            lambda x: x[gather]
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == B * K else x,
            state,
        )
        tokens = jnp.take_along_axis(
            tokens, parent[:, :, None], axis=1
        ).at[:, :, t].set(token)
        finished = jnp.take_along_axis(finished, parent, axis=1) | (
            token == EOS_
        )
        return (state, new_scores, tokens, token.reshape(-1), finished), None

    (state, scores, tokens, _, finished), _ = jax.lax.scan(
        step_fn,
        (state, scores0, tokens0, prev0, fin0),
        jnp.arange(max_len),
    )
    order = jnp.argsort(-scores, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    return tokens, scores

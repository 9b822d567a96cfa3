"""Seq2seq parser tests: learning, beam search, round-trip CLI contract."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import optax

from stair_tpu.seq2seq.beam import beam_search
from stair_tpu.seq2seq.lstm import LSTMSeq2Seq, LSTMSeq2SeqConfig
from stair_tpu.seq2seq.transformer import (
    TransformerSeq2Seq,
    TransformerSeq2SeqConfig,
)
from stair_tpu.seq2seq.vocab import BOS, EOS, PAD, Vocab


def _copy_task_data(rng, n, src_len, vocab):
    """Task: copy the source sequence (reversed) — learnable by both archs."""
    src = rng.randint(4, vocab, (n, src_len)).astype(np.int32)
    tgt = np.concatenate(
        [src[:, ::-1], np.full((n, 1), EOS, np.int32)], axis=1
    )
    src_mask = np.ones((n, src_len), np.float32)
    tgt_in = np.concatenate(
        [np.full((n, 1), BOS, np.int32), tgt[:, :-1]], axis=1
    )
    return src, src_mask, tgt_in, tgt


@pytest.mark.parametrize("arch", ["lstm", "transformer"])
def test_learns_copy_task_and_beam_decodes(arch):
    rng = np.random.RandomState(0)
    V, S = 12, 5
    T = S + 1
    if arch == "lstm":
        model = LSTMSeq2Seq(LSTMSeq2SeqConfig(
            src_vocab=V, tgt_vocab=V, embed_dim=32, hidden=32,
            max_src_len=S, max_tgt_len=T,
        ))
    else:
        model = TransformerSeq2Seq(TransformerSeq2SeqConfig(
            src_vocab=V, tgt_vocab=V, d_model=32, num_heads=2,
            num_layers=2, d_ff=64, max_src_len=S, max_tgt_len=T,
        ))
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    src, src_mask, tgt_in, tgt = _copy_task_data(rng, 256, S, V)

    @jax.jit
    def step(params, opt_state, s, sm, ti, to):
        def loss_fn(p):
            logits = model.logits(p, s, sm, ti)
            lse = jax.nn.logsumexp(logits, axis=-1)
            picked = jnp.take_along_axis(logits, to[..., None], -1)[..., 0]
            mask = (to != PAD).astype(jnp.float32)
            return jnp.sum((lse - picked) * mask) / jnp.sum(mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for it in range(300):
        i = (it * 32) % 224
        params, opt_state, loss = step(
            params, opt_state, src[i:i + 32], src_mask[i:i + 32],
            tgt_in[i:i + 32], tgt[i:i + 32],
        )
    assert float(loss) < 0.3, f"{arch} failed to learn copy task: {loss}"

    tokens, scores = beam_search(
        model, params, src[:8], src_mask[:8], beam_size=3, max_len=T
    )
    tokens = np.asarray(tokens)
    correct = 0
    for b in range(8):
        want = list(src[b, ::-1])
        got = [t for t in tokens[b, 0] if t not in (PAD, EOS)]
        correct += got == want
    assert correct >= 6, f"beam top-1 wrong too often ({correct}/8)"
    # Beams are score-sorted.
    assert np.all(np.diff(np.asarray(scores), axis=1) <= 1e-5)


def test_vocab_roundtrip(tmp_path):
    v = Vocab.build([["Filter", "video", "actions"], ["Exists", "video"]])
    ids = v.encode(["Filter", "video", "missing"], max_len=6)
    assert len(ids) == 6
    assert v.decode(ids) == ["Filter", "video"]  # unk + eos dropped
    v.save(tmp_path / "v.json")
    v2 = Vocab.load(tmp_path / "v.json")
    assert v2.word2id == v.word2id

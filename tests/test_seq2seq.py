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


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["lstm", "transformer", "t5"])
def test_learns_copy_task_and_beam_decodes(arch):
    rng = np.random.RandomState(0)
    V, S = 12, 5
    T = S + 1
    if arch == "lstm":
        model = LSTMSeq2Seq(LSTMSeq2SeqConfig(
            src_vocab=V, tgt_vocab=V, embed_dim=32, hidden=32,
            max_src_len=S, max_tgt_len=T,
        ))
    elif arch == "t5":
        from stair_tpu.seq2seq.t5 import T5Config, T5Seq2Seq

        model = T5Seq2Seq(T5Config(
            vocab_size=V, d_model=32, d_kv=8, num_heads=2, num_layers=2,
            num_decoder_layers=2, d_ff=64, feed_forward="gated-gelu",
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
    # T5 (relative-bias, unscaled attention) converges a bit slower from
    # scratch than the sinusoidal transformer at this size.
    for it in range(500 if arch == "t5" else 300):
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


@pytest.mark.slow
def test_pretrained_t5_cli_recipe(tmp_path):
    """--hf-t5-path runs the reference's pretrained-parser recipe end to end
    (hf_program_parser.py:142-205) against a local HF checkpoint: train a
    few steps, save, reload, beam-predict to TSV."""
    import os
    import pickle

    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, processors
    from transformers import (
        PreTrainedTokenizerFast,
        T5Config as HFT5Config,
        T5ForConditionalGeneration,
    )

    from stair_tpu.seq2seq import train as parser_cli

    # A tiny local "Flan-T5" checkpoint: random weights + word-level
    # tokenizer with sentencepiece special-id conventions (pad=0, eos=1).
    words = ["<pad>", "</s>", "<unk>", "Filter", "Exists", "video",
             "objects", "actions", "(", ")", ",", "what", "did", "they",
             "hold", "touch", "?", "dish", "cup", "[", "]"]
    tok = Tokenizer(models.WordLevel(
        {w: i for i, w in enumerate(words)}, unk_token="<unk>"
    ))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 1)],
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", eos_token="</s>",
        unk_token="<unk>",
    )
    ckpt = str(tmp_path / "flan")
    fast.save_pretrained(ckpt)
    torch.manual_seed(0)
    T5ForConditionalGeneration(HFT5Config(
        vocab_size=len(words), d_model=32, d_kv=8, num_heads=4,
        num_layers=1, num_decoder_layers=1, d_ff=64, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0,
    )).save_pretrained(ckpt)

    records = [
        {"qa_id": "q%d" % i,
         "question": "what did they %s ?" % ("hold" if i % 2 else "touch"),
         "nmn_program": ["Exists", "dish" if i % 2 else "cup",
                         "Filter", "video", "objects"]}
        for i in range(16)
    ]
    pkl = str(tmp_path / "train.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(records, f)

    out = str(tmp_path / "parser")
    parser_cli.main([
        "--func", "train", "--hf-t5-path", ckpt,
        "--train-filename", pkl, "--output", out,
        "--num-epochs", "4", "--batch-size", "8", "--lr", "1e-3",
        "--max-src-len", "12", "--max-tgt-len", "10",
        "--report-interval", "1000",
    ])
    assert os.path.exists(os.path.join(out, "params.msgpack"))

    tsv = str(tmp_path / "gen.tsv")
    parser_cli.main([
        "--func", "predict", "--model-dir", out,
        "--test-filename", pkl, "--result-filename", tsv,
        "--batch-size", "8", "--beam-size", "3",
        "--max-src-len", "12", "--max-tgt-len", "10",
    ])
    lines = open(tsv).read().strip().split("\n")
    assert len(lines) == 16 * 3
    assert all(len(line.split("\t")) == 3 for line in lines)

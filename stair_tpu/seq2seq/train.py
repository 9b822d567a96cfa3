"""Program-parser train/predict CLI.

The TPU-native replacement for both reference parser workflows
(yellow-binary-tree/STAIR ``hf_program_parser.py`` and the fairseq README
CLI): trains a seq2seq model on (question -> space-joined nmn_program) pairs
from converted record pickles, then beam-decodes test questions into the TSV
format (``qa_id\\tquestion\\tprogram``, n-best rows per question) that
``stair_tpu.programs.preprocess --func upgrade`` merges back into records.

Functions: ``train``, ``predict``, ``check_valid`` (validity-rate report,
ref hf_program_parser.py:207-222).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flax import serialization

from stair_tpu.programs.parser import program_is_valid, repair_generated_program
from stair_tpu.seq2seq.beam import beam_search
from stair_tpu.seq2seq.lstm import LSTMSeq2Seq, LSTMSeq2SeqConfig
from stair_tpu.seq2seq.t5 import T5Config, T5Seq2Seq
from stair_tpu.seq2seq.transformer import (
    TransformerSeq2Seq,
    TransformerSeq2SeqConfig,
)
from stair_tpu.seq2seq.vocab import BOS, EOS, PAD, Vocab, question_tokens


class HFTokenizerVocab:
    """Vocab-protocol adapter over a sentencepiece tokenizer (the pretrained
    Flan-T5 path, ref hf_program_parser.py:45-70: questions and space-joined
    programs are both plain text to the tokenizer)."""

    def __init__(self, tokenizer, vocab_size):
        self.tokenizer = tokenizer
        self.vocab_size = vocab_size

    def __len__(self):
        return self.vocab_size

    def encode(self, tokens, max_len, add_eos=True):
        return self.encode_text(" ".join(tokens), max_len, add_eos)

    def encode_text(self, text, max_len, add_eos=True):
        ids = self.tokenizer(
            text, add_special_tokens=add_eos
        )["input_ids"][:max_len]
        return ids + [self.tokenizer.pad_token_id] * (max_len - len(ids))

    def decode(self, ids):
        text = self.tokenizer.decode(
            [int(i) for i in ids], skip_special_tokens=True
        )
        return text.split()


def specials_for(arch):
    """(bos, eos, pad) decode ids: T5 decodes from the pad id."""
    if arch in ("t5", "t5-pretrained"):
        return 0, 1, 0
    return BOS, EOS, PAD


def load_pairs(filename):
    with open(filename, "rb") as f:
        records = pickle.load(f)
    pairs = []
    for rec in records:
        if not rec.get("nmn_program"):
            continue
        pairs.append((
            rec.get("qa_id"),
            question_tokens(rec["question"]),
            list(rec["nmn_program"]),
            rec["question"],
        ))
    return pairs


def encode_pairs(pairs, src_vocab, tgt_vocab, max_src, max_tgt):
    if isinstance(src_vocab, HFTokenizerVocab):
        # Pretrained path tokenizes the RAW question text (the reference
        # feeds the untokenized question, hf_program_parser.py:45-58).
        src = np.array(
            [src_vocab.encode_text(raw, max_src) for _, _, _, raw in pairs],
            np.int32,
        )
    else:
        src = np.array(
            [src_vocab.encode(q, max_src, add_eos=False)
             for _, q, _, _ in pairs],
            np.int32,
        )
    tgt = np.array(
        [tgt_vocab.encode(p, max_tgt) for _, _, p, _ in pairs], np.int32
    )
    src_mask = (src != PAD).astype(np.float32)
    return src, src_mask, tgt


def build_model(arch, src_vocab_size, tgt_vocab_size, args):
    if arch == "lstm":
        cfg = LSTMSeq2SeqConfig(
            src_vocab=src_vocab_size, tgt_vocab=tgt_vocab_size,
            embed_dim=args.embed_dim, hidden=args.hidden,
            max_src_len=args.max_src_len, max_tgt_len=args.max_tgt_len,
        )
        return LSTMSeq2Seq(cfg)
    if arch in ("t5", "t5-pretrained"):
        # T5 shares one embedding table between source and target.
        cfg = T5Config(
            vocab_size=max(src_vocab_size, tgt_vocab_size),
            d_model=args.embed_dim, d_kv=args.embed_dim // 4, num_heads=4,
            num_layers=args.num_layers, num_decoder_layers=args.num_layers,
            d_ff=args.embed_dim * 2, feed_forward="gated-gelu",
            tie_word_embeddings=True,
            max_src_len=args.max_src_len, max_tgt_len=args.max_tgt_len,
        )
        return T5Seq2Seq(cfg)
    cfg = TransformerSeq2SeqConfig(
        src_vocab=src_vocab_size, tgt_vocab=tgt_vocab_size,
        d_model=args.embed_dim, num_heads=4,
        num_layers=args.num_layers, d_ff=args.embed_dim * 2,
        max_src_len=args.max_src_len, max_tgt_len=args.max_tgt_len,
    )
    return TransformerSeq2Seq(cfg)


def load_pretrained_t5(path, args):
    """Local HF Flan-T5 checkpoint -> (model, params, tokenizer). Runs the
    reference's exact parser recipe (hf_program_parser.py:142-205) when the
    released weights are on disk."""
    from transformers import AutoTokenizer, T5ForConditionalGeneration

    from stair_tpu.llm.import_weights import import_t5, t5_config_from_hf

    tokenizer = AutoTokenizer.from_pretrained(path)
    hf = T5ForConditionalGeneration.from_pretrained(path)
    cfg = t5_config_from_hf(
        hf.config, max_src_len=args.max_src_len, max_tgt_len=args.max_tgt_len
    )
    params = import_t5(hf.state_dict())
    vocab = HFTokenizerVocab(tokenizer, cfg.vocab_size)
    return T5Seq2Seq(cfg), params, vocab


def build_vocabs(args, train_pairs):
    """(src_vocab, tgt_vocab) — word-level for from-scratch archs; a joint
    vocabulary for from-scratch t5 (shared embedding)."""
    if args.arch == "t5":
        joint = Vocab.build(
            [q for _, q, _, _ in train_pairs]
            + [p for _, _, p, _ in train_pairs]
        )
        return joint, joint
    return (
        Vocab.build([q for _, q, _, _ in train_pairs]),
        Vocab.build([p for _, _, p, _ in train_pairs]),
    )


def train(args):
    train_pairs = load_pairs(args.train_filename)
    valid_pairs = load_pairs(args.valid_filename) if args.valid_filename else []
    print(f"train pairs: {len(train_pairs)}, valid: {len(valid_pairs)}")
    if args.hf_t5_path:
        args.arch = "t5-pretrained"
        model, params, vocab = load_pretrained_t5(args.hf_t5_path, args)
        src_vocab = tgt_vocab = vocab
    else:
        src_vocab, tgt_vocab = build_vocabs(args, train_pairs)
        model = build_model(args.arch, len(src_vocab), len(tgt_vocab), args)
        params = model.init(jax.random.PRNGKey(args.seed))
    print(f"src vocab {len(src_vocab)}, tgt vocab {len(tgt_vocab)}")
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    bos_id, _eos, pad_id = specials_for(args.arch)
    src, src_mask, tgt = encode_pairs(
        train_pairs, src_vocab, tgt_vocab, args.max_src_len, args.max_tgt_len
    )
    bos = np.full((len(src), 1), bos_id, np.int32)
    tgt_in = np.concatenate([bos, tgt[:, :-1]], axis=1)

    @jax.jit
    def step(params, opt_state, s, sm, ti, to):
        def loss_fn(p):
            logits = model.logits(p, s, sm, ti)
            lse = jax.nn.logsumexp(logits, axis=-1)
            picked = jnp.take_along_axis(
                logits, to[..., None], axis=-1
            )[..., 0]
            mask = (to != PAD).astype(jnp.float32)
            return jnp.sum((lse - picked) * mask) / jnp.maximum(
                jnp.sum(mask), 1.0
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(args.seed)
    n = len(src)
    bs = min(args.batch_size, n)
    t0 = time.time()
    it = 0
    for epoch in range(args.num_epochs):
        order = rng.permutation(n)
        for i in range(0, n - bs + 1, bs):
            idx = order[i:i + bs]
            params, opt_state, loss = step(
                params, opt_state, src[idx], src_mask[idx],
                tgt_in[idx], tgt[idx],
            )
            it += 1
            if it % args.report_interval == 0:
                print(f"epoch {epoch} it {it} loss {float(loss):.4f} "
                      f"({it / (time.time() - t0):.1f} it/s)")

    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    if not args.hf_t5_path:
        src_vocab.save(os.path.join(args.output, "src_vocab.json"))
        tgt_vocab.save(os.path.join(args.output, "tgt_vocab.json"))
    with open(os.path.join(args.output, "parser_config.json"), "w") as f:
        json.dump({
            "arch": args.arch, "embed_dim": args.embed_dim,
            "hidden": args.hidden, "num_layers": args.num_layers,
            "max_src_len": args.max_src_len, "max_tgt_len": args.max_tgt_len,
            "hf_t5_path": args.hf_t5_path,
        }, f)
    print("saved parser to", args.output)

    if valid_pairs:
        acc = exact_match(args, model, params, src_vocab, tgt_vocab,
                          valid_pairs)
        print(f"valid exact-match (top beam): {acc:.4f}")
    return params


def load_parser(model_dir, args=None):
    with open(os.path.join(model_dir, "parser_config.json")) as f:
        cfg = json.load(f)

    class _A:
        pass

    a = _A()
    for k, v in cfg.items():
        setattr(a, k, v)
    if cfg.get("hf_t5_path"):
        model, params, vocab = load_pretrained_t5(cfg["hf_t5_path"], a)
        src_vocab = tgt_vocab = vocab
    else:
        src_vocab = Vocab.load(os.path.join(model_dir, "src_vocab.json"))
        tgt_vocab = Vocab.load(os.path.join(model_dir, "tgt_vocab.json"))
        model = build_model(cfg["arch"], len(src_vocab), len(tgt_vocab), a)
        params = model.init(jax.random.PRNGKey(0))
    with open(os.path.join(model_dir, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(params, f.read())
    return model, params, src_vocab, tgt_vocab


_DECODE_CACHE: dict = {}


def decode_beams(model, params, src_vocab, tgt_vocab, pairs, args):
    """Beam-decode all pairs; yields (qa_id, question, [program tokens] x K)."""
    src, src_mask, _ = encode_pairs(
        pairs, src_vocab, tgt_vocab, args.max_src_len, args.max_tgt_len
    )
    bs = min(args.batch_size, len(pairs))

    bos_id, eos_id, pad_id = specials_for(
        "t5" if isinstance(model, T5Seq2Seq) else "word"
    )

    # One jitted beam search per (model, decode config): a fresh closure per
    # call would re-trace and recompile on every decode_beams invocation, so
    # a "warm pass" before timing would warm nothing and the timed pass
    # would pay compile (ADVICE r4).
    key = (id(model), args.beam_size, args.max_tgt_len, bos_id, eos_id,
           pad_id)
    decode = _DECODE_CACHE.get(key)
    if decode is None:
        @jax.jit
        def decode(params, s, sm):
            return beam_search(
                model, params, s, sm, beam_size=args.beam_size,
                max_len=args.max_tgt_len, bos=bos_id, eos=eos_id, pad=pad_id,
            )

        _DECODE_CACHE[key] = decode

    for i in range(0, len(pairs), bs):
        chunk = pairs[i:i + bs]
        s = src[i:i + bs]
        sm = src_mask[i:i + bs]
        if len(chunk) < bs:  # pad to the compiled batch shape
            pad = bs - len(chunk)
            s = np.concatenate([s, np.zeros((pad, s.shape[1]), np.int32)])
            sm = np.concatenate([sm, np.zeros((pad, sm.shape[1]), np.float32)])
            sm[len(chunk):, 0] = 1.0
        tokens, _scores = decode(params, s, sm)
        tokens = np.asarray(tokens)
        for b, (qa_id, _, _, question) in enumerate(chunk):
            beams = [tgt_vocab.decode(tokens[b, k]) for k in range(tokens.shape[1])]
            yield qa_id, question, beams


def predict(args):
    model, params, src_vocab, tgt_vocab = load_parser(args.model_dir)
    pairs = load_pairs(args.test_filename)
    print(f"decoding {len(pairs)} questions (beam {args.beam_size})")
    os.makedirs(os.path.dirname(args.result_filename) or ".", exist_ok=True)
    with open(args.result_filename, "w") as f:
        for qa_id, question, beams in decode_beams(
            model, params, src_vocab, tgt_vocab, pairs, args
        ):
            for beam in beams:
                f.write("%s\t%s\t%s\n" % (qa_id, question, " ".join(beam)))
    print("wrote", args.result_filename)


def check_valid(args):
    """Validity rate of generated programs (ref hf_program_parser.py:207-222)."""
    total = valid_first = valid_any = 0
    by_qa: dict[str, list] = {}
    with open(args.result_filename) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 3:
                continue
            by_qa.setdefault(parts[0], []).append(parts[2].split(" "))
    for qa_id, beams in by_qa.items():
        total += 1
        if beams and program_is_valid(beams[0]):
            valid_first += 1
        if any(
            repair_generated_program(b) is not None for b in beams
        ):
            valid_any += 1
    print(f"{total} questions: top-beam valid {valid_first / max(total,1):.4f},"
          f" any-beam valid (after repair) {valid_any / max(total,1):.4f}")
    return valid_first / max(total, 1), valid_any / max(total, 1)


def exact_match(args, model, params, src_vocab, tgt_vocab, pairs):
    hits = 0
    decoded = decode_beams(model, params, src_vocab, tgt_vocab, pairs, args)
    for (qa_id, _question, beams), (_, _, gold, _) in zip(decoded, pairs):
        if beams and beams[0] == gold:
            hits += 1
    return hits / max(len(pairs), 1)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--func", choices=["train", "predict", "check_valid"],
                   required=True)
    p.add_argument("--arch", choices=["lstm", "transformer", "t5"],
                   default="transformer")
    p.add_argument("--hf-t5-path", default=None,
                   help="local HF Flan-T5 checkpoint dir: run the "
                        "reference's pretrained-parser recipe "
                        "(hf_program_parser.py:142-205)")
    p.add_argument("--train-filename")
    p.add_argument("--valid-filename", default=None)
    p.add_argument("--test-filename")
    p.add_argument("--output", default="parser_out")
    p.add_argument("--model-dir", default=None)
    p.add_argument("--result-filename", default="generated_programs.tsv")
    p.add_argument("--embed-dim", type=int, default=256)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--num-layers", type=int, default=3)
    p.add_argument("--max-src-len", type=int, default=32)
    p.add_argument("--max-tgt-len", type=int, default=48)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--report-interval", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    args.model_dir = args.model_dir or args.output
    if args.func == "train":
        train(args)
    elif args.func == "predict":
        predict(args)
    else:
        check_valid(args)


if __name__ == "__main__":
    main()

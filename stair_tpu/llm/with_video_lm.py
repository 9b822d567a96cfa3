"""CLI: train/evaluate the video-prefix LM on AGQA records.

The entry point mirroring the reference ``with_pt.py`` workflow: records +
npy video features + optional STAIR filter-output pickles in, answer
exact-match out. ``--lm-model VideoGPT`` uses the GPT-2-class decoder,
``--lm-model Llama`` the Llama-class one (prompt template
'Question: %s Answer:' as in with_pt.py:252); ``--bert-path`` loads an HF
checkpoint + tokenizer when available, otherwise a word-level tokenizer and
fresh weights are used (air-gapped mode).

Run: ``python -m stair_tpu.llm.with_video_lm --func train ...``
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

from stair_tpu.data.dataset import load_video_features
from stair_tpu.llm.decoder import DecoderConfig
from stair_tpu.llm.video_prefix import (
    VideoPrefixConfig,
    VideoPrefixLM,
    answer_exact_match,
    load_tokenizer,
    pack_text_batch,
    splice_filter_outputs,
)


def load_records(filename, novel_comp=None, more_steps=None):
    with open(filename, "rb") as f:
        records = pickle.load(f)
    if novel_comp is not None:
        records = [r for r in records if r.get("novel_comp") == novel_comp]
    if more_steps is not None:
        records = [r for r in records if r.get("more_steps") == more_steps]
    return records


def load_filter_outputs(path_template, split):
    """Shard-aware filter-result pickle loading (ref with_pt.py:92-104)."""
    if not path_template:
        return None
    merged = {}
    if "%d" in path_template:
        i = 0
        while True:
            path = path_template % (split, i)
            if not os.path.exists(path):
                break
            with open(path, "rb") as f:
                merged.update(pickle.load(f))
            i += 1
    else:
        path = path_template % split if "%s" in path_template else path_template
        if os.path.exists(path):
            with open(path, "rb") as f:
                merged.update(pickle.load(f))
    return merged or None


class VideoLMData:
    def __init__(self, args, split, tokenizer=None):
        self.args = args
        self.records = load_records(
            {"train": args.train_filename, "valid": args.valid_filename,
             "test": args.test_filename}[split],
            args.novel_comp, args.more_steps,
        )
        used = {r["video_id"] for r in self.records}
        self.video_feats = load_video_features(
            args.rgb_path, None, used, args.max_video_length
        )
        self.video_size = next(iter(self.video_feats.values())).shape[-1]
        self.filter_outputs = load_filter_outputs(
            args.gpt_filter_result_path, split
        )
        prompt = (
            "Question: %s Answer:" if args.lm_model == "Llama" else "%s"
        )
        self.questions = []
        self.answers = []
        for rec in self.records:
            q = splice_filter_outputs(
                prompt % rec["question"],
                (self.filter_outputs or {}).get(rec.get("qa_id")),
                max_per_module=args.gpt_max_per_filter_module,
                max_total=args.gpt_max_filter_output_list_length,
                by_level=args.gpt_filter_output_by_level,
            )
            self.questions.append(q)
            self.answers.append(str(rec["answer"]))
        self.tokenizer = tokenizer or load_tokenizer(
            args.bert_path, corpus_texts=self.questions + self.answers
        )

    def __len__(self):
        return len(self.records)

    def batches(self, batch_size, max_text_len, Fmax, shuffle=True, seed=0):
        order = np.arange(len(self.records))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        total_len = Fmax + max_text_len
        for i in range(0, len(order), batch_size):
            idx = list(order[i:i + batch_size])
            while len(idx) < batch_size:
                idx.append(idx[len(idx) % max(1, len(idx))])
            real = min(batch_size, len(order) - i)
            video = np.zeros((batch_size, Fmax, self.video_size), np.float32)
            video_len = np.zeros((batch_size,), np.int32)
            for b, j in enumerate(idx):
                v = self.video_feats[self.records[j]["video_id"]][:Fmax]
                video[b, : len(v)] = v
                video_len[b] = len(v)
            token_ids, text_len, labels = pack_text_batch(
                self.tokenizer,
                [self.questions[j] for j in idx],
                [self.answers[j] for j in idx],
                max_text_len, video_len, total_len,
            )
            yield {
                "video": video, "video_len": video_len,
                "token_ids": token_ids, "text_len": text_len,
                "labels": labels, "real": real,
                "qa_ids": [self.records[j].get("qa_id") for j in idx],
            }


def build_lm(args, video_size, vocab_size):
    if args.lm_model == "Llama":
        dec = DecoderConfig.llama(
            vocab_size=vocab_size, d_model=args.hidden_size,
            num_heads=max(2, args.hidden_size // 64),
            num_layers=args.lm_layers, d_ff=args.hidden_size * 3,
            max_len=args.max_video_length + args.tokenizer_max_length,
            lora_rank=8 if args.llm_lora else 0,
        )
    else:
        dec = DecoderConfig.gpt2(
            vocab_size=vocab_size, d_model=args.hidden_size,
            num_heads=max(2, args.hidden_size // 64),
            num_layers=args.lm_layers, d_ff=args.hidden_size * 4,
            max_len=args.max_video_length + args.tokenizer_max_length,
        )
    cfg = VideoPrefixConfig(
        video_size=video_size, decoder=dec,
        max_video_length=args.max_video_length,
        max_text_length=args.tokenizer_max_length,
    )
    return VideoPrefixLM(cfg)


def _device_batch(batch):
    return {k: batch[k] for k in
            ("video", "video_len", "token_ids", "text_len", "labels")}


def evaluate(model, params, data, args, Fmax):
    hits, losses = [], []

    @jax.jit
    def step(params, b):
        loss, logits = model.reply_loss(params, b)
        return loss, logits

    for batch in data.batches(args.batch_size, args.tokenizer_max_length,
                              Fmax, shuffle=False):
        loss, logits = step(params, _device_batch(batch))
        losses.append(float(loss))
        hits.extend(
            answer_exact_match(logits, batch["labels"])[: batch["real"]]
        )
    acc = float(np.mean(hits)) if hits else 0.0
    return acc, float(np.mean(losses))


def train(args):
    train_data = VideoLMData(args, "train")
    valid_data = VideoLMData(args, "valid", tokenizer=train_data.tokenizer)
    Fmax = args.max_video_length
    model = build_lm(args, train_data.video_size, len(train_data.tokenizer))
    rng = jax.random.PRNGKey(args.rand_seed)
    params = model.init(rng)
    if args.llm_lora and args.lm_model == "Llama":
        params["decoder"] = model.decoder.add_lora(
            params["decoder"], jax.random.PRNGKey(1)
        )

    steps_per_epoch = max(1, len(train_data) // args.batch_size)
    schedule = optax.linear_schedule(
        args.lr, 0.0, steps_per_epoch * args.num_epochs
    )
    optimizer = optax.adamw(schedule)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            loss, _ = model.reply_loss(p, batch)
            if args.gpt_video_loss_weight:
                loss = loss + args.gpt_video_loss_weight * model.video_loss(
                    p, batch
                )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    os.makedirs(args.output, exist_ok=True)
    best_acc, step_i = 0.0, 0
    t0 = time.time()
    from stair_tpu.runtime.loader import device_prefetch

    for epoch in range(args.num_epochs):
        for dbatch in device_prefetch(
            _device_batch(batch) for batch in train_data.batches(
                args.batch_size, args.tokenizer_max_length, Fmax,
                shuffle=True, seed=args.rand_seed + epoch,
            )
        ):
            params, opt_state, loss = train_step(params, opt_state, dbatch)
            step_i += 1
            if step_i % args.report_interval == 0:
                print(f"step {step_i} loss {float(loss):.4f} "
                      f"({step_i / (time.time() - t0):.2f} it/s)")
        acc, vloss = evaluate(model, params, valid_data, args, Fmax)
        print(f"epoch {epoch}: valid acc {acc:.4f} loss {vloss:.4f}")
        if acc >= best_acc:
            best_acc = acc
            save(args.output, model, params, train_data.tokenizer, args)
    print(f"best valid acc {best_acc:.4f}")
    return best_acc


def save(out_dir, model, params, tokenizer, args):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    cfg = {
        "lm_model": args.lm_model, "hidden_size": args.hidden_size,
        "lm_layers": args.lm_layers,
        "max_video_length": args.max_video_length,
        "tokenizer_max_length": args.tokenizer_max_length,
        "video_size": model.config.video_size,
        "vocab_size": model.config.decoder.vocab_size,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    if hasattr(tokenizer, "word2id"):
        with open(os.path.join(out_dir, "tokenizer.json"), "w") as f:
            json.dump({"word2id": tokenizer.word2id,
                       "eos": tokenizer.eos_token_id,
                       "pad": tokenizer.pad_token_id}, f)


def test(args):
    from stair_tpu.llm.video_prefix import SimpleTokenizer

    with open(os.path.join(args.model_ckpt, "config.json")) as f:
        cfg = json.load(f)
    tok_path = os.path.join(args.model_ckpt, "tokenizer.json")
    tokenizer = None
    if os.path.exists(tok_path):
        with open(tok_path) as f:
            t = json.load(f)
        tokenizer = SimpleTokenizer(t["word2id"], t["eos"], t["pad"])
    for k in ("lm_model", "hidden_size", "lm_layers", "max_video_length",
              "tokenizer_max_length"):
        setattr(args, k, cfg[k])
    data = VideoLMData(args, "test", tokenizer=tokenizer)
    model = build_lm(args, cfg["video_size"], cfg["vocab_size"])
    params = model.init(jax.random.PRNGKey(0))
    with open(os.path.join(args.model_ckpt, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(params, f.read())
    acc, loss = evaluate(model, params, data, args, cfg["max_video_length"])
    print(f"test acc {acc:.4f} loss {loss:.4f}")
    return acc


def main(argv=None):
    from stair_tpu.train.args import build_parser

    p = build_parser()
    p.add_argument("--func", choices=["train", "test"], default="train")
    p.add_argument("--lm-layers", type=int, default=4)
    args = p.parse_args(argv)
    if args.func == "train" and not args.gpt_test:
        train(args)
    else:
        test(args)


if __name__ == "__main__":
    main()

"""Video-prefix language model: answer questions with video features + STAIR
filter outputs spliced into the prompt.

The TPU-native rebuild of the reference's VideoGPT-2/Llama path
(yellow-binary-tree/STAIR ``VideoGPT2.py`` + ``with_pt.py``):

  * video features pass through a ``video_ff`` adapter into the embedding
    stream ahead of the text (``VideoGPT2.py:284``, ``with_pt.py:357-365``);
  * the "reply" loss is answer-span CE with shifted labels
    (``VideoGPT2.py:355-361``); the optional "video" loss regresses the
    next frame's feature via ``video_inverse_ff`` under a mask where video
    tokens are visible to everyone (``VideoGPT2.py:65-68, 362-382``) —
    realized here by the flash kernel's per-example ``prefix_len``;
  * STAIR Filter-module retrievals are formatted as "<keyword> <answer>."
    strings and prepended to the question, lowest tree level first, with
    per-module and total caps (``with_pt.py:148-165``).

Design deviation (documented): sequences are packed contiguously
[video | prompt | answer | pad] with per-example lengths instead of the
reference's interior padding after the video block — interior padding exists
in the reference only as an artifact of fixed-offset batching and wastes
compute; packing preserves the loss semantics exactly.
"""

from __future__ import annotations

import json
import os
import pickle
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from stair_tpu.llm.decoder import Decoder, DecoderConfig
from stair_tpu.models.modules import _init_linear, linear
from stair_tpu.programs.text import tokenize

IGNORE = -1


# ---------------------------------------------------------------------------
# Tokenizer protocol: word-level fallback or HF tokenizer
# ---------------------------------------------------------------------------

class SimpleTokenizer:
    """Deterministic word-level tokenizer for environments without HF
    tokenizer data; shares the Vocab special-token layout."""

    def __init__(self, word2id: dict[str, int], eos_token_id: int,
                 pad_token_id: int):
        self.word2id = word2id
        self.id2word = {i: w for w, i in word2id.items()}
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id

    @classmethod
    def build(cls, texts):
        words = sorted({
            w.lower() for t in texts for w in tokenize(t)
        })
        word2id = {"<pad>": 0, "<eos>": 1, "<unk>": 2}
        for w in words:
            word2id[w] = len(word2id)
        return cls(word2id, eos_token_id=1, pad_token_id=0)

    def encode(self, text: str, max_length: int | None = None):
        ids = [
            self.word2id.get(w.lower(), 2) for w in tokenize(text)
        ]
        return ids[:max_length] if max_length else ids

    def decode(self, ids):
        return " ".join(
            self.id2word.get(int(i), "<unk>")
            for i in ids
            if int(i) not in (self.pad_token_id, self.eos_token_id)
        )

    def __len__(self):
        return len(self.word2id)


def load_tokenizer(path_or_none, corpus_texts=None):
    if path_or_none:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path_or_none)
        if tok.pad_token_id is None:
            tok.pad_token = tok.eos_token
        return tok
    return SimpleTokenizer.build(corpus_texts or [])


# ---------------------------------------------------------------------------
# Filter-output prompt splicing
# ---------------------------------------------------------------------------

def splice_filter_outputs(
    question_text: str,
    filter_outputs: dict | None,
    max_per_module: int = 1,
    max_total: int = 5,
    by_level: int = 0,
) -> str:
    """Prepend '<keyword> <answer>.' strings from STAIR Filter retrievals.
    ref: with_pt.py:148-165"""
    if not filter_outputs:
        return question_text
    entries = list(filter_outputs.values())
    if by_level:
        entries = [e for e in entries if e[0] <= by_level]
    entries.sort(key=lambda e: -e[0])       # low tree level last -> first
    texts = []
    for _level, keyword, answers in entries:
        for ans in answers[:max_per_module]:
            texts.append(f"{keyword} {ans}.")
    if not by_level and len(texts) > max_total:
        texts = texts[:max_total]
    if texts:
        return " ".join(texts) + " " + question_text
    return question_text


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VideoPrefixConfig:
    video_size: int
    decoder: DecoderConfig
    max_video_length: int = 64
    max_text_length: int = 64


class VideoPrefixLM:
    def __init__(self, config: VideoPrefixConfig):
        self.config = config
        self.decoder = Decoder(config.decoder)

    def init(self, rng, decoder_params=None):
        k1, k2, k3 = jax.random.split(rng, 3)
        D = self.config.decoder.d_model
        return {
            "decoder": decoder_params or self.decoder.init(k1),
            "video_ff": _init_linear(k2, self.config.video_size, D),
            "video_inverse_ff": _init_linear(k3, D, self.config.video_size),
        }

    def build_embeds(self, params, video, video_len, token_ids):
        """Pack [video | tokens] into one embedding stream.

        video: [B, Fmax, video_size]; video_len: [B]; token_ids: [B, Ltext]
        (already prompt+answer+pad). Returns embeds [B, Fmax+Ltext, D] packed
        contiguously per example, plus the packed video/text offsets.
        """
        B, Fmax, _ = video.shape
        Lt = token_ids.shape[1]
        video_emb = linear(params["video_ff"], video)          # [B, Fmax, D]
        text_emb = params["decoder"]["embed"][token_ids]       # [B, Lt, D]
        D = video_emb.shape[-1]
        L = Fmax + Lt

        #

        def pack_one(vemb, vlen, temb):
            out = jnp.zeros((L, D), vemb.dtype)
            out = jax.lax.dynamic_update_slice(out, vemb, (0, 0))
            # overwrite from vlen with text (shifting out video padding)
            return jax.lax.dynamic_update_slice(out, temb, (vlen, 0))

        embeds = jax.vmap(pack_one)(video_emb, video_len, text_emb)
        return embeds

    def forward(self, params, batch, video_visible=False):
        """batch keys: video [B,F,vd], video_len [B], token_ids [B,Lt],
        text_len [B]. Returns (logits, hidden)."""
        cfg = self.config
        embeds = self.build_embeds(
            params, batch["video"], batch["video_len"], batch["token_ids"]
        )
        B = embeds.shape[0]
        total_len = batch["video_len"] + batch["text_len"]
        prefix = batch["video_len"] if video_visible else jnp.zeros(
            (B,), jnp.int32
        )
        hidden = self.decoder.hidden_states(
            params["decoder"], embeds, prefix.astype(jnp.int32),
            total_len.astype(jnp.int32),
        )
        logits = self.decoder.logits_from_hidden(params["decoder"], hidden)
        return logits, hidden

    # -- losses --------------------------------------------------------------

    def reply_loss(self, params, batch):
        """Answer-span CE with shifted labels (ref VideoGPT2.py:355-361).

        batch['labels'] [B, F+Lt]: token id at answer positions, IGNORE
        elsewhere (already aligned to the packed stream).
        """
        logits, _ = self.forward(params, batch, video_visible=False)
        labels = batch["labels"]
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        mask = (shift_labels != IGNORE).astype(jnp.float32)
        safe = jnp.maximum(shift_labels, 0)
        lse = jax.nn.logsumexp(shift_logits, axis=-1)
        picked = jnp.take_along_axis(
            shift_logits, safe[..., None], axis=-1
        )[..., 0]
        ce = (lse - picked) * mask
        loss = jnp.sum(ce) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss, logits

    def video_loss(self, params, batch):
        """Next-frame feature regression under the video-visible mask.
        ref VideoGPT2.py:362-382"""
        _, hidden = self.forward(params, batch, video_visible=True)
        pred = linear(params["video_inverse_ff"], hidden)      # [B, L, vd]
        video = batch["video"]                                 # [B, F, vd]
        Fmax = video.shape[1]
        target = video[:, 1:]                                  # predict t+1
        pred = pred[:, : Fmax - 1]
        # per-example mean over valid positions, summed over batch (parity
        # with the reference's loop that adds per-example MSE means).
        steps = jnp.arange(Fmax - 1)[None, :]
        valid = (steps < (batch["video_len"][:, None] - 1)).astype(jnp.float32)
        se = jnp.mean(jnp.square(pred - target), axis=-1) * valid
        per_example = jnp.sum(se, axis=1) / jnp.maximum(
            jnp.sum(valid, axis=1), 1.0
        )
        return jnp.sum(per_example)


# ---------------------------------------------------------------------------
# Batch construction (host side)
# ---------------------------------------------------------------------------

def pack_text_batch(
    tokenizer, questions, answers, max_text_len, video_lens, total_len,
):
    """Tokenize prompts/answers; build token_ids, text_len and packed labels.

    Returns token_ids [B, Lt], text_len [B], labels [B, total_len] where
    labels carry answer token ids (plus EOS) at their packed positions.
    """
    B = len(questions)
    token_ids = np.zeros((B, max_text_len), np.int32)
    text_len = np.zeros((B,), np.int32)
    labels = np.full((B, total_len), IGNORE, np.int32)
    eos = tokenizer.eos_token_id
    for b, (q, a) in enumerate(zip(questions, answers)):
        q_ids = tokenizer.encode(q, max_length=max_text_len)
        if hasattr(q_ids, "ids"):
            q_ids = q_ids.ids
        a_ids = list(tokenizer.encode(a, max_length=8)) + [eos]
        ids = (list(q_ids) + a_ids)[:max_text_len]
        token_ids[b, : len(ids)] = ids
        text_len[b] = len(ids)
        ans_start = min(len(q_ids), max_text_len)
        # answer positions within the packed stream
        for j, tok in enumerate(a_ids):
            pos = int(video_lens[b]) + ans_start + j
            if pos < total_len and ans_start + j < max_text_len:
                labels[b, pos] = tok
    return token_ids, text_len, labels


def answer_exact_match(logits, labels):
    """Teacher-forced: all answer tokens predicted correctly
    (ref with_pt.py:219-227)."""
    logits = np.asarray(logits)[:, :-1]
    labels = np.asarray(labels)[:, 1:]
    preds = logits.argmax(-1)
    hits = []
    for b in range(labels.shape[0]):
        pos = labels[b] != IGNORE
        if pos.sum() == 0:
            continue
        hits.append(bool((preds[b][pos] == labels[b][pos]).all()))
    return hits

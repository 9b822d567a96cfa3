"""Canned benchmark/entry workloads: realistic program mix, random tensors.

Builds batches shaped like real AGQA2 work (the I3D regime: 1024-d features,
<=64 frames — see BASELINE.md) without needing dataset files: a pool of
representative program templates covering the module families, random
question/video tensors, and the full lowering path. Used by
``__graft_entry__`` and ``bench.py``.
"""

from __future__ import annotations

import numpy as np

from stair_tpu.ir.lowering import lower_program, pad_traces
from stair_tpu.models.nmn import NMNConfig, VideoNMN
from stair_tpu.programs.parser import parse_nmn_program

#: Annotation-level program templates (the parser rewrites them exactly as it
#: would real AGQA annotations).
PROGRAM_TEMPLATES = [
    "Exists(food, Iterate(video, Filter(frame, [objects])))",
    "Exists(dish, Iterate(Localize(while, holding a dish), Filter(frame, [objects])))",
    "Exists(cup, Iterate(Localize(after, taking a cup), Filter(frame, [objects])))",
    "Exists(food, Iterate(Localize(between, [grasping onto a doorknob, drinking from a cup]), Filter(frame, [relations, holding, objects])))",
    "Choose(dish, blanket, Iterate(video, Filter(frame, [objects])))",
    "Query(class, Superlative(max, Filter(video, [actions]), Subtract(Query(end, action), Query(start, action))))",
    "Query(class, OnlyItem(IterateUntil(forward, video, Exists(touching, Filter(frame, [relations])), Filter(frame, [relations, touching, objects]))))",
    "Compare(Array2(before, after), Exists(dish, Iterate(Localize(temporal_tag, washing a window), Filter(frame, [objects]))))",
    "AND(Exists(food, Iterate(video, Filter(frame, [objects]))), Exists(cup, Iterate(video, Filter(frame, [objects]))))",
    "XOR(Exists(food, Iterate(video, Filter(frame, [objects]))), Exists(cup, Iterate(Localize(before, taking a cup), Filter(frame, [objects]))))",
]


def parse_pool():
    """Parse the template pool once; returns (parsed, traces)."""
    parsed = [parse_nmn_program(p) for p in PROGRAM_TEMPLATES]
    traces = [
        lower_program(p.tokens, p.source_index, {}) for p in parsed
    ]
    return parsed, traces


def workload_config(
    hidden_size=512,
    video_size=1024,
    text_size=300,
    max_video_length=64,
    answer_vocab_length=172,
    traces=None,
) -> NMNConfig:
    if traces is None:
        _, traces = parse_pool()
    return NMNConfig(
        hidden_size=hidden_size,
        video_size=video_size,
        text_size=text_size,
        answer_vocab_length=answer_vocab_length,
        max_video_length=max_video_length,
        object_types=64,
        have_pretrain_head=True,
        max_steps=max(len(t.instrs) for t in traces),
        num_vec=max(t.num_vec for t in traces),
        num_frames=max(t.num_frames for t in traces),
        num_attn=max(t.num_attn for t in traces),
    )


def make_batch(cfg: NMNConfig, batch_size: int, question_len=16, seed=0):
    """One padded batch over the template pool with random tensors."""
    rng = np.random.RandomState(seed)
    _, traces = parse_pool()
    picked = [traces[i % len(traces)] for i in range(batch_size)]
    tb = pad_traces(
        picked, cfg.max_steps, cfg.num_vec, cfg.num_frames, cfg.num_attn
    )
    F, L = cfg.max_video_length, question_len
    batch = {
        "question": rng.randn(batch_size, L, cfg.text_size).astype(np.float32),
        "question_mask": np.ones((batch_size, L), np.float32),
        "video": rng.randn(batch_size, F, cfg.video_size).astype(np.float32),
        "video_mask": np.ones((batch_size, F), np.float32),
        "answer": rng.randint(
            0, cfg.answer_vocab_length, (batch_size,)
        ).astype(np.int32),
        "trace": tb.fields,
        "root_reg": tb.root_reg,
        "root_is_vec": tb.root_is_vec,
    }
    return batch


def add_fake_supervision(batch, cfg: NMNConfig, text_size=None, seed=0):
    """Dense supervision arrays so the full train step can run."""
    rng = np.random.RandomState(seed)
    B, T = batch["trace"]["opcode"].shape
    F = cfg.max_video_length
    text = text_size or cfg.text_size
    C, P, Lc = 16, 2, 4
    batch.update({
        "sup_channel": rng.randint(0, 6, (B, T)).astype(np.int32),
        "sup_bool": rng.randint(0, 2, (B, T)).astype(np.float32),
        "sup_attn": rng.rand(B, T, 2, F).astype(np.float32),
        "sup_attn_rows": rng.randint(1, 3, (B, T)).astype(np.int32),
        "class_emb": rng.randn(C, Lc, text).astype(np.float32),
        "class_emb_mask": np.ones((C, Lc), np.float32),
        "class_valid": np.ones((C,), np.float32),
        "sup_class": rng.randint(-1, C, (B, T, P)).astype(np.int32),
        "ff_index": np.zeros((2, 2), np.int32),
        "ff_gold": np.zeros((2, F, cfg.object_types), np.float32),
        "ff_valid": np.zeros((2,), np.float32),
    })
    return batch


def build_model(cfg: NMNConfig, seed=0):
    import jax

    model = VideoNMN(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    return model, params

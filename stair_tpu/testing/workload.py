"""Canned benchmark/entry workloads: realistic program mix, random tensors.

Builds batches shaped like real AGQA2 work (the I3D regime: 1024-d features,
<=64 frames — see BASELINE.md) without needing dataset files: a pool of
representative program templates covering the module families, random
question/video tensors, and the full lowering path. Used by
``__graft_entry__`` and ``bench.py``.
"""

from __future__ import annotations

import ctypes

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


# Argument vocabularies for instantiating the structural templates into a
# large varied pool (objects/relations/activities in AGQA's register).
_OBJECTS = [
    "food", "cup", "dish", "blanket", "phone", "towel", "shoe", "box",
    "book", "laptop", "pillow", "broom", "mirror", "picture", "sandwich",
    "bottle",
]
_ACTIVITIES = [
    "holding a dish", "taking a cup", "washing a window",
    "drinking from a cup", "opening a door", "closing a book",
    "throwing a pillow", "watching television", "carrying a box",
    "touching a mirror", "eating a sandwich", "grasping onto a doorknob",
]
_RELATIONS = ["touching", "holding", "carrying", "wiping"]
_MODES = ["while", "before", "after"]


def program_pool(n: int = 128, seed: int = 0):
    """>=100 distinct (program, question) pairs over the template grammar.

    Questions contain the free-text arguments so span linking has real work
    to do — the bench's "parse" half must include lemma matching
    (utils/agqa_lite.py:62-119), not just tokenization.
    """
    rng = np.random.RandomState(seed)
    pairs = []
    while len(pairs) < n:
        obj = _OBJECTS[rng.randint(len(_OBJECTS))]
        obj2 = _OBJECTS[rng.randint(len(_OBJECTS))]
        act = _ACTIVITIES[rng.randint(len(_ACTIVITIES))]
        rel = _RELATIONS[rng.randint(len(_RELATIONS))]
        mode = _MODES[rng.randint(len(_MODES))]
        kind = len(pairs) % 6
        if kind == 0:
            prog = f"Exists({obj}, Iterate(video, Filter(frame, [objects])))"
            q = f"were they near the {obj} ?"
        elif kind == 1:
            prog = (f"Exists({obj}, Iterate(Localize({mode}, {act}), "
                    "Filter(frame, [objects])))")
            q = f"was there a {obj} {mode} {act} ?"
        elif kind == 2:
            prog = (f"Choose({obj}, {obj2}, Iterate(video, "
                    "Filter(frame, [objects])))")
            q = f"did they touch the {obj} or the {obj2} ?"
        elif kind == 3:
            prog = ("Query(class, Superlative(max, Filter(video, [actions]), "
                    "Subtract(Query(end, action), Query(start, action))))")
            q = "which activity took the longest time ?"
        elif kind == 4:
            prog = (f"AND(Exists({obj}, Iterate(video, Filter(frame, "
                    f"[objects]))), Exists({obj2}, Iterate(video, "
                    "Filter(frame, [objects]))))")
            q = f"did they have both the {obj} and the {obj2} ?"
        else:
            prog = ("Query(class, OnlyItem(IterateUntil(forward, video, "
                    f"Exists({rel}, Filter(frame, [relations])), "
                    f"Filter(frame, [relations, {rel}, objects]))))")
            q = f"what were they {rel} first ?"
        pairs.append((prog, q))
    return pairs


class HashEmbeddings:
    """Deterministic word->vector table standing in for GloVe in benches
    (same per-question lookup/stack host cost, no 2GB file)."""

    def __init__(self, dim: int = 300):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def _vector(self, word: str) -> np.ndarray:
        vec = self._cache.get(word)
        if vec is None:
            seed = hash(word) % (2 ** 31)
            vec = np.random.RandomState(seed).randn(self.dim).astype(
                np.float32
            )
            self._cache[word] = vec
        return vec

    def embed_sentence(self, sentence: str) -> np.ndarray:
        rows = [self._vector(w) for w in sentence.lower().split()]
        return np.stack(rows) if rows else np.zeros((0, self.dim), np.float32)


#: The arena whose ids currently populate the process-global C++ vocab
#: (stair_tokenize_ids); any other arena must reset + reseed before use.
_native_vocab_owner = None


class EmbeddingArena:
    """Word-embedding table as one contiguous block + native row gather —
    the production shape of per-question GloVe lookup (tokenize -> ids ->
    ``stair_gather_rows_f32``), used by bench.py's timed loop."""

    def __init__(self, dim: int = 300):
        self.dim = dim
        self.word2id: dict[str, int] = {}
        self._rows: list[np.ndarray] = []
        self._source = HashEmbeddings(dim)
        self._arena: np.ndarray | None = None
        self._native_synced = 0  # words mirrored into the C++ vocab

    def _id(self, word: str) -> int:
        idx = self.word2id.get(word)
        if idx is None:
            idx = len(self._rows)
            self.word2id[word] = idx
            self._rows.append(self._source._vector(word))
            self._arena = None
        return idx

    def token_ids(self, sentence: str, max_len: int) -> np.ndarray:
        ids = np.full((max_len,), -1, np.int64)
        for i, w in enumerate(sentence.lower().split()[:max_len]):
            ids[i] = self._id(w)
        return ids

    def token_id_batch(self, questions: list[str], max_len: int):
        """-> ids [B, L] int32 (-1 = pad). For device-side table lookup:
        ship the small id array over H2D and gather rows from a
        device-resident embedding table inside the jitted forward.

        Tokenizes in C++ (``stair_tokenize_ids``) when the native library
        is available, mirroring this arena's first-seen id assignment; new
        words the tokenizer encounters are synced back as embedding rows."""
        from stair_tpu.runtime.loader import _pack_strings, native_lib

        lib = native_lib()
        if lib is None or not all(q.isascii() for q in questions):
            # No native library, or non-ASCII text: the C++ tokenizer is
            # byte-wise (ASCII lower/isspace) while Python str.lower() /
            # str.split() are Unicode — route such batches to Python.
            return np.stack(
                [self.token_ids(q, max_len) for q in questions]
            ).astype(np.int32)
        global _native_vocab_owner
        if (_native_vocab_owner is not self
                or lib.stair_vocab_size() != self._native_synced):
            # Another arena (or stale process state) owns the global C++
            # vocab: rebuild it from scratch to this arena's ids. Size
            # alone is not enough — two arenas can have equal-sized but
            # different vocabularies.
            lib.stair_vocab_reset()
            self._native_synced = 0
            _native_vocab_owner = self
        if self._native_synced < len(self._rows):
            words = [None] * len(self.word2id)
            for w, i in self.word2id.items():
                words[i] = w
            blob, offs = _pack_strings(words[self._native_synced:])
            self._native_synced = lib.stair_vocab_add_words(
                blob, offs, len(words) - self._native_synced
            )
        blob, offs = _pack_strings(questions)
        ids = np.empty((len(questions), max_len), np.int32)
        lib.stair_tokenize_ids(blob, offs, len(questions), max_len, ids, 1)
        new_size = lib.stair_vocab_size()
        if new_size != self._native_synced:
            # The tokenizer minted ids for unseen words: materialize their
            # embedding rows in the same order so ids stay aligned.
            buf = ctypes.create_string_buffer(4096)
            for i in range(self._native_synced, new_size):
                assert lib.stair_vocab_word(i, buf, 4096) >= 0
                got = self._id(buf.value.decode())
                assert got == i, (got, i)
            self._native_synced = new_size
        return ids

    def table(self) -> np.ndarray:
        """The embedding table as one [V, dim] f32 block (device-uploadable)."""
        if self._arena is None:
            self._arena = np.ascontiguousarray(np.stack(self._rows))
        return self._arena

    def encode_batch(self, questions: list[str], max_len: int):
        """-> (emb [B, L, dim] float32, mask [B, L] float32)."""
        B = len(questions)
        ids = np.stack([self.token_ids(q, max_len) for q in questions])
        if self._arena is None:
            self._arena = np.ascontiguousarray(np.stack(self._rows))
        out = np.empty((B * max_len, self.dim), np.float32)
        from stair_tpu.runtime.loader import DEFAULT_THREADS, native_lib

        lib = native_lib()
        flat = np.ascontiguousarray(ids.reshape(-1))
        if lib is not None:
            lib.stair_gather_rows_f32(
                self._arena, flat, B * max_len, self.dim, out,
                DEFAULT_THREADS,
            )
        else:
            valid = flat >= 0
            out[~valid] = 0.0
            out[valid] = self._arena[flat[valid]]
        return (
            out.reshape(B, max_len, self.dim),
            (ids >= 0).astype(np.float32),
        )


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

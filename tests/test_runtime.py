"""Native runtime tests: compiled library vs numpy reference."""

import numpy as np
import pytest

from stair_tpu.data.dataset import span_to_attention
from stair_tpu.runtime.loader import (
    FeatureArena,
    PrefetchIterator,
    native_lib,
    span_to_attention_batch,
)


def test_native_library_compiles():
    lib = native_lib()
    assert lib is not None, "native library failed to build (g++ required)"


def test_feature_arena_gather_matches_numpy():
    rng = np.random.RandomState(0)
    feats = {
        "a": rng.randn(10, 8).astype(np.float32),
        "b": rng.randn(3, 8).astype(np.float32),
        "c": rng.randn(24, 8).astype(np.float32),
    }
    arena = FeatureArena(feats)
    out, mask = arena.gather(["b", "c", "a", "b"], max_rows=16)
    assert out.shape == (4, 16, 8)
    np.testing.assert_array_equal(out[0, :3], feats["b"])
    assert np.all(out[0, 3:] == 0)
    np.testing.assert_array_equal(out[1], feats["c"][:16])
    np.testing.assert_array_equal(mask[0], [1] * 3 + [0] * 13)
    np.testing.assert_array_equal(mask[1], [1] * 16)


def test_span_to_attention_native_matches_python():
    rng = np.random.RandomState(1)
    F = 24
    intervals = np.stack([
        np.sort(rng.rand(64) * F * 1.2 - 2),
        np.sort(rng.rand(64) * F * 1.2),
    ], axis=1).astype(np.float32)
    intervals = np.sort(intervals, axis=1)
    native = span_to_attention_batch(intervals, F)
    for i in range(len(intervals)):
        ref = span_to_attention(tuple(intervals[i]), F)
        np.testing.assert_allclose(native[i], ref, rtol=1e-5, atol=1e-6,
                                   err_msg=str(intervals[i]))


def test_prefetch_iterator():
    def gen():
        for i in range(10):
            yield i * i

    assert list(PrefetchIterator(gen())) == [i * i for i in range(10)]

    def failing():
        yield 1
        raise ValueError("boom")

    it = PrefetchIterator(failing())
    assert next(it) == 1
    with pytest.raises(ValueError):
        for _ in it:
            pass


@pytest.mark.perf
def test_gather_speed_sanity():
    """The native gather must handle a realistic batch quickly.

    Timing-sensitive: marked ``perf`` so correctness runs can deselect it
    (``-m "not perf"``); the bound is deliberately loose to tolerate CPU
    contention while still catching pathological slowness."""
    import time

    rng = np.random.RandomState(0)
    feats = {
        "v%04d" % i: rng.randn(64, 1024).astype(np.float32)
        for i in range(64)
    }
    arena = FeatureArena(feats)
    ids = ["v%04d" % (i % 64) for i in range(256)]
    t0 = time.perf_counter()
    for _ in range(5):
        out, mask = arena.gather(ids, 64)
    dt = (time.perf_counter() - t0) / 5
    # 256 x 64 x 1024 x 4B = 67 MB per gather; expect well under 200ms.
    assert dt < 5.0, f"gather too slow: {dt:.3f}s"


def test_native_tokenizer_matches_python():
    """stair_tokenize_ids mirrors EmbeddingArena.token_ids exactly:
    lower().split() semantics, first-seen id assignment, growth sync."""
    from stair_tpu.runtime.loader import native_lib
    from stair_tpu.testing.workload import EmbeddingArena

    if native_lib() is None:
        pytest.skip("native library unavailable")
    qs = [
        "What did The person take before eating?",
        "was  the towel touched?",
        "",
        "a b c d e f g h i j k",  # truncation past max_len
    ]
    native = EmbeddingArena(16)
    python = EmbeddingArena(16)
    ref = np.stack([python.token_ids(q, 8) for q in qs]).astype(np.int32)
    got = native.token_id_batch(qs, 8)
    np.testing.assert_array_equal(ref, got)
    # Growth after the initial sync: new words mint aligned ids + rows.
    got2 = native.token_id_batch(["zebra towel What"], 8)
    ref2 = python.token_ids("zebra towel What", 8).astype(np.int32)
    np.testing.assert_array_equal(ref2, got2[0])
    assert native.word2id == python.word2id
    np.testing.assert_allclose(native.table(), python.table())

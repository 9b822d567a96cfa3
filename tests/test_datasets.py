"""STAR/MSRVTT datasets, choice head, weight deltas, reformat utility."""

import json
import os
import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from stair_tpu.data.dataset import (
    AGQADataset,
    Batcher,
    DataPaths,
    MSRVTTDataset,
    STARDataset,
)
from stair_tpu.models.nmn import NMNConfig, VideoNMN, choice_logits


def _write_features(dirname, video_ids, frames=24, dim=32):
    os.makedirs(dirname, exist_ok=True)
    rng = np.random.RandomState(0)
    for vid in video_ids:
        np.save(os.path.join(dirname, vid + ".npy"),
                rng.randn(frames * 2, dim).astype(np.float32))


def _base_record(qa_id, vid, program=("Filter", "video", "actions")):
    return {
        "qa_id": qa_id, "question_id": qa_id,
        "question": "what did they do ?",
        "nmn_program": list(program),
        "nmn_program_idx": [None] * len(program),
        "nmn_program_span_by_word": {},
        "sg_res_by_step": {},
        "video_id": vid,
    }


@pytest.fixture()
def star_world(tmp_path):
    vids = ["S0", "S1", "S2"]
    _write_features(str(tmp_path / "feats"), vids)
    records = []
    for i in range(9):
        rec = _base_record(
            "Interaction_T1_%d" % i, vids[i % 3],
            program=("Exists", "dish", "Filter", "video", "objects"),
        )
        rec["choices"] = [
            {"choice_id": j, "choice": "answer %d" % j} for j in range(4)
        ]
        rec["answer"] = "answer %d" % (i % 4)
        rec["start"], rec["end"] = 0.5, 6.0
        records.append(rec)
    pkl = str(tmp_path / "star.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(records, f)
    with open(tmp_path / "secs.json", "w") as f:
        json.dump({v: 8.0 for v in vids}, f)
    glove = tmp_path / "glove.txt"
    rng = np.random.RandomState(1)
    words = ["what", "did", "they", "do", "?", "answer", "0", "1", "2", "3"]
    with open(glove, "w") as f:
        f.write("%d 16\n" % len(words))
        for w in words:
            f.write(w + " " + " ".join(
                "%.4f" % x for x in rng.randn(16)) + "\n")
    return DataPaths(
        rgb_path=str(tmp_path / "feats"), glove_filename=str(glove),
        vocab_filename=str(tmp_path / "vocab.json"),
        video_secs_path=str(tmp_path / "secs.json"),
        train_filename=pkl, valid_filename=pkl, test_filename=pkl,
    )


def test_star_dataset_and_choice_head(star_world):
    ds = STARDataset(star_world, "train", max_video_length=24)
    assert len(ds) == 9
    assert ds.records[0]["answer_id"] == 0
    # video clipping by [start, end]
    v = ds.video_feature(ds.records[0])
    assert 0 < len(v) < 24

    T, NV, NF, NA = ds.trace_geometry()
    batcher = Batcher(ds, batch_size=4, max_steps=T, num_vec=NV,
                      num_frames=NF, num_attn=NA)
    batch = next(batcher.epoch(shuffle=False))
    assert batch.cand_emb is not None
    assert batch.cand_emb.shape[:2] == (4, 4)

    cfg = NMNConfig(
        hidden_size=32, video_size=ds.video_size,
        text_size=ds.embeddings.dim, answer_vocab_length=4,
        max_video_length=24, object_types=1, have_pretrain_head=False,
        max_steps=T, num_vec=NV, num_frames=NF, num_attn=NA,
    )
    model = VideoNMN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    bdict = {
        "question": batch.question, "question_mask": batch.question_mask,
        "video": batch.video, "video_mask": batch.video_mask,
        "trace": batch.trace, "root_reg": batch.root_reg,
        "root_is_vec": batch.root_is_vec,
    }
    out = model.forward(params, bdict)
    scores = choice_logits(
        model, params, out, jnp.asarray(batch.cand_emb),
        jnp.asarray(batch.cand_mask), jnp.asarray(batch.cand_valid),
    )
    assert scores.shape == (4, 4)
    assert np.isfinite(np.asarray(scores)).all()


def test_msrvtt_dataset(tmp_path):
    vids = ["video7010", "video7011"]
    _write_features(str(tmp_path / "feats"), vids)
    records = []
    for i in range(6):
        rec = _base_record("q%d" % i, "")
        rec["video"] = vids[i % 2] + ".mp4"
        del rec["video_id"]
        rec["answer"] = ["cat", "dog", "cat"][i % 3]
        records.append(rec)
    pkl = str(tmp_path / "msrvtt.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(records, f)
    with open(tmp_path / "secs.json", "w") as f:
        json.dump({v: 10.0 for v in vids}, f)
    glove = tmp_path / "glove.txt"
    with open(glove, "w") as f:
        f.write("1 8\n")
        f.write("what " + " ".join(["0.1"] * 8) + "\n")
    paths = DataPaths(
        rgb_path=str(tmp_path / "feats"), glove_filename=str(glove),
        vocab_filename=str(tmp_path / "vocab.json"),
        video_secs_path=str(tmp_path / "secs.json"),
        train_filename=pkl, valid_filename=pkl, test_filename=pkl,
    )
    ds = MSRVTTDataset(paths, "train", max_video_length=24)
    assert len(ds) == 6
    assert ds.records[0]["video_id"] == "video7010"
    w2i = ds.answer_vocab["word2id"]
    assert "cat" in w2i and "<UNK>" in w2i
    assert ds.answer_id(ds.records[0]) == w2i["cat"]


def test_weight_delta_roundtrip():
    from stair_tpu.llm.weight_delta import apply_delta, make_delta

    base = {"a": {"w": np.ones((3, 3)), "b": np.zeros(3)}}
    tuned = {
        "a": {"w": np.full((3, 3), 2.0), "b": np.ones(3)},
        "new_head": {"w": np.full((2,), 7.0)},
    }
    delta = make_delta(base, tuned)
    restored = apply_delta(base, delta)
    np.testing.assert_array_equal(restored["a"]["w"], tuned["a"]["w"])
    np.testing.assert_array_equal(
        restored["new_head"]["w"], tuned["new_head"]["w"]
    )


def test_reformat_agqa(tmp_path):
    from stair_tpu.llm.reformat_agqa import reformat

    src = {
        "q%d" % i: {"question": "what happened ?", "answer": "yes",
                    "video_id": "V%d" % i}
        for i in range(100)
    }
    filt = {
        "q0": {2: (1, "objects", ["dish", "cup"])},
    }
    out = reformat(src, filt, sample_ratio=1.0, seed=0)
    assert len(out) == 100
    by_id = {o["question_id"]: o for o in out}
    assert by_id["q0"]["question"].startswith(
        "Possible useful information in video: objects dish."
    )
    assert by_id["q1"]["question"] == "what happened ?"


def test_aux_prog_word_embeddings(star_world):
    """--use-prog-word-embeddings: spanless text args get own-token
    encodings instead of the whole-question mean."""
    ds = STARDataset(star_world, "train", max_video_length=24,
                     use_prog_word_embeddings=True)
    # Records here carry no spans, so every text push lowers to -2.
    tr = next(t for t in ds.traces if t is not None)
    spans = [i.span_start for i in tr.instrs if i.opcode == 1]
    assert all(s == -2 for s in spans) or not spans

    T, NV, NF, NA = ds.trace_geometry()
    batcher = Batcher(ds, batch_size=4, max_steps=T, num_vec=NV,
                      num_frames=NF, num_attn=NA)
    batch = next(batcher.epoch(shuffle=False))
    assert batch.aux_emb is not None

    cfg = NMNConfig(
        hidden_size=32, video_size=ds.video_size,
        text_size=ds.embeddings.dim, answer_vocab_length=4,
        max_video_length=24, object_types=1, have_pretrain_head=False,
        max_steps=T, num_vec=NV, num_frames=NF, num_attn=NA,
    )
    model = VideoNMN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    bdict = {
        "question": batch.question, "question_mask": batch.question_mask,
        "video": batch.video, "video_mask": batch.video_mask,
        "trace": batch.trace, "root_reg": batch.root_reg,
        "root_is_vec": batch.root_is_vec,
        "aux_emb": batch.aux_emb, "aux_mask": batch.aux_mask,
    }
    out_aux = model.forward(params, bdict)
    bdict2 = dict(bdict)
    del bdict2["aux_emb"], bdict2["aux_mask"]
    out_plain = model.forward(params, bdict2)
    # The aux path must change the computation for spanless programs.
    assert not np.allclose(
        np.asarray(out_aux["logits"]), np.asarray(out_plain["logits"])
    )


def test_star_extra_negatives(star_world):
    ds = STARDataset(star_world, "train", max_video_length=24,
                     extra_negatives=2, seed=0)
    rec = ds.records[0]
    assert len(rec["choices"]) >= 4  # originals plus sampled negatives
    assert ds.num_candidates == 6
    # negatives come from the same question type and differ from the answer
    negs = [c["choice"] for c in rec["choices"][4:]]
    assert all(n != rec["answer"] for n in negs)


def test_star_evaluate_acc_uses_choice_head(star_world, tmp_path):
    """evaluate_acc on a multiple-choice dataset must predict via the choice
    head and report candidate texts — with an empty STAR answer vocab the
    decoder head is 0-wide, so the old argmax-on-logits path crashed
    (and a non-empty vocab would silently score an untrained head)."""
    from stair_tpu.train.evaluate import evaluate_acc

    ds = STARDataset(star_world, "test", max_video_length=24)
    T, NV, NF, NA = ds.trace_geometry()
    cfg = NMNConfig(
        hidden_size=32, video_size=ds.video_size,
        text_size=ds.embeddings.dim,
        answer_vocab_length=ds.answer_vocab_length,
        max_video_length=24, object_types=1, have_pretrain_head=False,
        max_steps=T, num_vec=NV, num_frames=NF, num_attn=NA,
    )
    model = VideoNMN(cfg)
    params = model.init(jax.random.PRNGKey(0))

    class EvalArgs:
        result_filename = "star_preds.json"
        output = str(tmp_path)
        dataset = "STAR"
        batch_size = 4
        max_question_len = 24

    acc = evaluate_acc(EvalArgs(), model, params, ds)
    assert 0.0 <= acc <= 1.0
    with open(tmp_path / "star_preds.json") as f:
        payload = json.load(f)
    # STAR online-eval format, grouped by question type, candidate TEXT.
    assert "Interaction" in payload and payload["Interaction"]
    for row in payload["Interaction"]:
        assert row["answer"].startswith("answer ")


def test_star_device_tables_bit_parity(star_world):
    """STAR device-table mode (clip-aware video gather + candidate ids)
    must reproduce the host-packed batch exactly."""
    jax = pytest.importorskip("jax")
    from stair_tpu.train.loop import make_device_tables, materialize_batch

    ds = STARDataset(star_world, "train", max_video_length=24)
    T, NV, NF, NA = ds.trace_geometry()
    kw = dict(batch_size=4, max_steps=T, num_vec=NV, num_frames=NF,
              num_attn=NA)
    host = next(Batcher(ds, **kw).epoch(shuffle=False))
    dev = next(Batcher(ds, device_tables=True, **kw).epoch(shuffle=False))
    tables = make_device_tables(ds)
    assert tables is not None
    assert dev.cand_ids is not None and dev.video_clip is not None

    from stair_tpu.train.loop import batch_to_device_dict

    mat = jax.jit(
        lambda b: materialize_batch(b, tables)
    )(batch_to_device_dict(dev))
    np.testing.assert_array_equal(np.asarray(mat["video"]), host.video)
    np.testing.assert_array_equal(
        np.asarray(mat["video_mask"]), host.video_mask
    )
    np.testing.assert_array_equal(
        np.asarray(mat["question"]), host.question
    )
    np.testing.assert_array_equal(
        np.asarray(mat["cand_emb"]), host.cand_emb
    )
    np.testing.assert_array_equal(
        np.asarray(mat["cand_mask"]), host.cand_mask
    )
    np.testing.assert_array_equal(
        np.asarray(mat["cand_valid"]), host.cand_valid
    )


def test_star_device_tables_out_of_range_clip(star_world):
    """Clips extending past the stored video (or starting beyond it) must
    mask identically in host and device modes (the host path's feats[lo:hi]
    silently truncates)."""
    jax = pytest.importorskip("jax")
    from stair_tpu.train.loop import (
        batch_to_device_dict,
        make_device_tables,
        materialize_batch,
    )

    ds = STARDataset(star_world, "train", max_video_length=24)
    ds.records[0]["end"] = 10_000.0       # far past the video duration
    ds.records[1]["start"] = 10_000.0     # clip entirely out of range
    ds.records[1]["end"] = 10_001.0
    T, NV, NF, NA = ds.trace_geometry()
    kw = dict(batch_size=4, max_steps=T, num_vec=NV, num_frames=NF,
              num_attn=NA)
    host = next(Batcher(ds, **kw).epoch(shuffle=False))
    dev = next(Batcher(ds, device_tables=True, **kw).epoch(shuffle=False))
    tables = make_device_tables(ds)
    mat = jax.jit(
        lambda b: materialize_batch(b, tables)
    )(batch_to_device_dict(dev))
    np.testing.assert_array_equal(
        np.asarray(mat["video_mask"]), host.video_mask
    )
    np.testing.assert_array_equal(np.asarray(mat["video"]), host.video)

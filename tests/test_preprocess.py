"""End-to-end preprocessing tests over the synthetic world."""

import json
import pickle

from stair_tpu.programs import preprocess
from stair_tpu.programs.scene_graph import SceneGraphExecutor
from stair_tpu.programs.spans import link_program_spans
from stair_tpu.programs.parser import parse_nmn_program

RECORD_KEYS = {
    "question", "answer", "video_id", "program", "qa_id", "novel_comp",
    "more_steps", "nmn_program", "nmn_program_idx", "sg_program",
    "sg_program_idx", "sg_res_by_step", "nmn_program_span_by_word",
    "nmn_program_span_by_char",
}


def test_convert_produces_full_records(synthetic_world):
    with open(synthetic_world["questions"]) as f:
        questions = json.load(f)
    preprocess.set_executor(
        SceneGraphExecutor(
            synthetic_world["scene_graphs"],
            synthetic_world["id2word"],
            synthetic_world["word2id"],
        )
    )
    examples = [dict(rec, qa_id=qa_id) for qa_id, rec in questions.items()]
    records = preprocess.convert_split(examples, num_workers=1)
    assert len(records) == len(examples)
    ok = 0
    for rec in records:
        assert RECORD_KEYS.issubset(rec.keys())
        # Answers came from the executor, so supervision must exist for all.
        assert rec["sg_res_by_step"] is not None
        assert len(rec["nmn_program"]) == len(rec["nmn_program_idx"])
        if rec["nmn_program_span_by_word"] and not any(
            v == (None, None) for v in rec["nmn_program_span_by_word"].values()
        ):
            ok += 1
    # Most examples should have fully-linked spans (templates embed phrases).
    assert ok >= len(records) * 0.6, f"only {ok}/{len(records)} fully linked"


def test_span_linking_basic():
    parsed = parse_nmn_program(
        "Exists(dish, Iterate(Localize(while, holding a dish), Filter(frame, [objects])))"
    )
    question = "was a dish there while holding a dish ?"
    by_word, by_char = link_program_spans(parsed.tokens, question)
    words = question.split()
    for pos, (s, e) in by_word.items():
        assert s is not None, (pos, parsed.tokens[pos])
        # span text must lemma-match the program token
        span_text = " ".join(words[s:e])
        assert parsed.tokens[pos].split("_")[-1] in span_text
    for pos, (s, e) in by_char.items():
        assert question[s:e]  # non-empty char spans


def test_upgrade_path(synthetic_world, tmp_path):
    with open(synthetic_world["questions"]) as f:
        questions = json.load(f)
    preprocess.set_executor(
        SceneGraphExecutor(
            synthetic_world["scene_graphs"],
            synthetic_world["id2word"],
            synthetic_world["word2id"],
        )
    )
    examples = [dict(rec, qa_id=qa_id) for qa_id, rec in questions.items()][:8]
    records = preprocess.convert_split(examples)

    # Fake parser output: first beam invalid, second valid, for each example.
    tsv = tmp_path / "generated.tsv"
    with open(tsv, "w") as f:
        for rec in records:
            f.write("%s\t%s\t%s\n" % (
                rec["qa_id"], rec["question"], "Exists only_half"
            ))
            f.write("%s\t%s\t%s\n" % (
                rec["qa_id"], rec["question"], " ".join(rec["nmn_program"])
            ))
    generated = preprocess.load_generated_programs_tsv(str(tsv))
    assert len(generated) == len(records)
    upgraded = preprocess.upgrade_records(records, generated)
    for old, new in zip(records, upgraded):
        assert new["nmn_program"] == old["nmn_program"]
        assert new["nmn_program_span_by_word"] == old["nmn_program_span_by_word"]


def test_fairseq_format_loader(tmp_path):
    out = tmp_path / "fairseq.txt"
    with open(out, "w") as f:
        f.write("S-3\tsome question\n")
        f.write("D-3\t-0.1\t%s\n" % " ".join(
            reversed(["Filter", "video", "actions"])
        ))
        f.write("S-7\tanother question\n")
        f.write("D-7\t-0.5\tvideo Exists\n")  # invalid even reversed
        f.write("S-9\tthird question\n")
    programs = preprocess.load_generated_programs_fairseq(str(out))
    assert programs[3] == ["Filter", "video", "actions"]
    assert programs[7] is None  # flushed as invalid when S-9 started


def test_merge_json_records_star(tmp_path):
    src = [
        {"question_id": "Interaction_T1_0", "question": "what did they do/use ?",
         "answer": "a book/a cup",
         "choices": [{"choice_id": 0, "choice": "a book/a cup"},
                     {"choice_id": 1, "choice": "a dish"}],
         "video_id": "V1", "start": 1.0, "end": 5.0},
        {"question_id": "Interaction_T1_1", "question": "what happened ?",
         "answer": "a dish", "choices": [], "video_id": "V2"},
    ]
    fn = tmp_path / "star.json"
    with open(fn, "w") as f:
        json.dump(src, f)
    generated = {
        "Interaction_T1_0": ["Filter", "video", "actions"],
    }
    out = preprocess.merge_json_records(str(fn), generated, "STAR")
    assert out[0]["nmn_program"] == ["Filter", "video", "actions"]
    assert out[0]["question"] == "what did they do use ?"
    assert out[0]["answer"] == "a book a cup"
    assert out[1]["nmn_program"] == []
    assert out[1]["nmn_program_span_by_word"] is None

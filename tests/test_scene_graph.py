"""Symbolic scene-graph executor tests: hand-built worlds + reference parity."""

import pytest

from stair_tpu.programs.parser import parse_nmn_program
from stair_tpu.programs.scene_graph import (
    FrameInterval,
    SceneGraphExecutor,
    parse_sg_program,
)
from stair_tpu.testing.synthetic import build_vocab

FPS = 3


def _frame(n):
    return "%06d" % n


def tiny_graph(word2id):
    """12 frames; 'holding a dish' on 3-8; dish on 4-9, cup on 10-12;
    'touching' relation linked to dish on 4-6."""
    g = {}
    for n in range(1, 13):
        g[_frame(n)] = {"secs": n / FPS}
    phrase = "holding a dish"
    g[word2id[phrase] + "/" + _frame(3)] = {
        "charades": word2id[phrase],
        "verb_id": word2id["holding"],
        "object_id": word2id["dish"],
        "phrase": phrase,
        "start": 3,
        "end": 8,
        "all_f": [_frame(n) for n in range(3, 9)],
    }
    for n in range(4, 10):
        g[word2id["dish"] + "/" + _frame(n)] = {"class": word2id["dish"]}
    for n in range(10, 13):
        g[word2id["cup"] + "/" + _frame(n)] = {"class": word2id["cup"]}
    for n in range(4, 7):
        g[word2id["touching"] + "/" + _frame(n)] = {
            "class": word2id["touching"],
            "objects": [{"class": word2id["dish"]}],
        }
    return g


@pytest.fixture(scope="module")
def executor():
    id2word, word2id = build_vocab()
    return SceneGraphExecutor(
        {"V0": tiny_graph(word2id)}, id2word, word2id
    )


def run(executor, program):
    return executor.run(video_id="V0", program=program)


def test_exists_whole_video(executor):
    ans, steps, meta = run(
        executor, "Exists(dish, Iterate(video, Filter(frame, [objects])))"
    )
    assert ans == "yes"
    assert meta["frame_rate"] == pytest.approx(FPS)
    ans, _, _ = run(
        executor, "Exists(book, Iterate(video, Filter(frame, [objects])))"
    )
    assert ans == "no"


def test_exists_while_action(executor):
    ans, _, _ = run(
        executor,
        "Exists(dish, Iterate(Localize(while, holding a dish), Filter(frame, [objects])))",
    )
    assert ans == "yes"
    # the cup only appears after the action ends
    ans, _, _ = run(
        executor,
        "Exists(cup, Iterate(Localize(while, holding a dish), Filter(frame, [objects])))",
    )
    assert ans == "no"
    ans, _, _ = run(
        executor,
        "Exists(cup, Iterate(Localize(after, holding a dish), Filter(frame, [objects])))",
    )
    assert ans == "yes"
    ans, _, _ = run(
        executor,
        "Exists(cup, Iterate(Localize(before, holding a dish), Filter(frame, [objects])))",
    )
    assert ans == "no"


def test_choose(executor):
    ans, _, _ = run(
        executor, "Choose(dish, book, Iterate(video, Filter(frame, [objects])))"
    )
    assert ans == "dish"
    ans, _, _ = run(
        executor, "Choose(book, cup, Iterate(video, Filter(frame, [objects])))"
    )
    assert ans == "cup"


def test_superlative_longest_action(executor):
    ans, _, _ = run(
        executor,
        "Query(class, Superlative(max, Filter(video, [actions]), "
        "Subtract(Query(end, action), Query(start, action))))",
    )
    assert ans == "holding a dish"


def test_iterate_until_relation(executor):
    ans, steps, _ = run(
        executor,
        "Query(class, OnlyItem(IterateUntil(forward, video, "
        "Exists(dish, Filter(frame, [objects])), "
        "Filter(frame, [relations, touching, objects]))))",
    )
    # first frame with a dish that has any 'touching' relation result: frame 4
    assert ans == "dish"


def test_compare_before_after(executor):
    ans, _, _ = run(
        executor,
        "Compare(Array2(before, after), Exists(cup, Iterate("
        "Localize(temporal_tag, holding a dish), Filter(frame, [objects]))))",
    )
    assert ans == "after"


def test_step_results_recorded(executor):
    program = (
        "Exists(dish, Iterate(Localize(while, holding a dish), "
        "Filter(frame, [objects])))"
    )
    parsed = parse_nmn_program(program)
    sg_tokens, sg_idx = parse_sg_program(program)
    ans, steps, _ = executor.run(
        video_id="V0", tokens=sg_tokens, source_index=sg_idx
    )
    # The Temporal step (keyed by the original Localize token's index) holds
    # the action's interval rescaled to output fps (identical here: fps==3).
    localize_steps = [
        v for v in steps.values() if isinstance(v, list) and v and
        isinstance(v[0], tuple)
    ]
    assert any(v == [(3.0, 8.0)] for v in localize_steps)
    assert ans == "yes"


def test_filterframe_supervision(executor):
    program = (
        "Query(class, OnlyItem(IterateUntil(forward, video, "
        "Exists(dish, Filter(frame, [objects])), "
        "Filter(frame, [relations, touching, objects]))))"
    )
    parsed = parse_nmn_program(program)
    sg_tokens, sg_idx = parse_sg_program(program)
    frame_srcs = [
        s for t, s in zip(parsed.tokens, parsed.source_index) if "Frame" in t
    ]
    ans, steps, _ = executor.run(
        video_id="V0",
        tokens=sg_tokens,
        source_index=sg_idx,
        frame_source_indices=frame_srcs,
        existsframe_to_filterframe=parsed.existsframe_to_filterframe,
    )
    ((ef_src, ff_src),) = parsed.existsframe_to_filterframe.items()
    # FilterFrame supervision: per-class occurrence intervals.
    assert steps[ff_src] == {"dish": (4.0, 9.0), "cup": (10.0, 12.0)}
    # ExistsFrame supervision: the queried class's interval.
    assert steps[ef_src] == (4.0, 9.0)


def test_frame_interval():
    iv = FrameInterval(8, 3)
    assert (iv.start, iv.end) == (3, 8)
    assert iv.has_frame(3) and iv.has_frame(8) and not iv.has_frame(9)
    assert iv.length() == 5
    assert iv.rescaled(6, 3) == (1.5, 4.0)


# ---------------------------------------------------------------------------
# Parity vs the reference symbolic executor on the synthetic corpus
# ---------------------------------------------------------------------------

def test_executor_parity_with_reference(reference_modules, synthetic_world):
    import json
    import pickle

    ref_sg = reference_modules["scene_graphs"]
    with open(synthetic_world["scene_graphs"], "rb") as f:
        graphs = pickle.load(f)
    with open(synthetic_world["questions"]) as f:
        questions = json.load(f)

    ref_exec = ref_sg.SceneGraphExecuter(
        graphs, synthetic_world["id2word"], synthetic_world["word2id"]
    )
    mine = SceneGraphExecutor(
        graphs, synthetic_world["id2word"], synthetic_world["word2id"]
    )

    compared = 0
    for rec in questions.values():
        program, vid = rec["program"], rec["video_id"]
        parsed = parse_nmn_program(program)
        frame_srcs = [
            s for t, s in zip(parsed.tokens, parsed.source_index)
            if "Frame" in t
        ]
        sg_tokens, sg_idx = parse_sg_program(program)
        try:
            ref_ans, ref_steps, _ = ref_exec(
                program_list=sg_tokens, program_idxs=sg_idx, video_id=vid,
                frame_idxs=frame_srcs,
                frame_idx_mapping=parsed.existsframe_to_filterframe,
            )
        except Exception:
            continue
        my_ans, my_steps, _ = mine.run(
            video_id=vid, tokens=sg_tokens, source_index=sg_idx,
            frame_source_indices=frame_srcs,
            existsframe_to_filterframe=parsed.existsframe_to_filterframe,
        )
        assert my_ans == ref_ans
        ref_clean = {k: v for k, v in ref_steps.items() if not callable(v)}
        my_clean = {k: v for k, v in my_steps.items() if not callable(v)}
        assert set(my_clean) == set(ref_clean)
        for k, ref_v in ref_clean.items():
            my_v = my_clean[k]
            if hasattr(ref_v, "start"):  # reference FrameInterval object
                assert (my_v.start, my_v.end) == (ref_v.start, ref_v.end)
            else:
                assert my_v == ref_v, (k, my_v, ref_v)
        compared += 1
    assert compared >= 20, "too few comparable examples generated"

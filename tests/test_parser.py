"""Program parser/rewriter tests, including golden parity vs the reference."""

import pytest

from stair_tpu.programs.parser import (
    NMN_ARITY,
    children_and_parents,
    module_levels,
    parse_nmn_program,
    program_is_valid,
    repair_generated_program,
    tokenize_annotation,
)
from stair_tpu.programs.scene_graph import parse_sg_program

# A corpus exercising every rewrite rule.
PROGRAMS = [
    # plain Exists over the whole video
    "Exists(food, Iterate(video, Filter(frame, [objects])))",
    # Localize decoupling + while
    "Exists(dish, Iterate(Localize(while, holding a dish), Filter(frame, [objects])))",
    # before/after temporal modes
    "Exists(dish, Iterate(Localize(before, taking a cup), Filter(frame, [objects])))",
    "Exists(dish, Iterate(Localize(after, taking a cup), Filter(frame, [objects])))",
    # between with a bracketed action pair (Array2)
    "Exists(food, Iterate(Localize(between, [grasping onto a doorknob, drinking from a cup]), Filter(frame, [relations, holding, objects])))",
    # Choose
    "Choose(dish, blanket, Iterate(video, Filter(frame, [objects])))",
    # Query-class elision + OnlyItem elision
    "Exists(Query(class, OnlyItem(Iterate(video, Filter(frame, [relations, opening, objects])))), Iterate(video, Filter(frame, [objects])))",
    # Superlative + Subtract elision + Filter->FilterFrame
    "Query(class, Superlative(max, Filter(video, [actions]), Subtract(Query(end, action), Query(start, action))))",
    "Query(class, Superlative(min, Filter(video, [actions]), Subtract(Query(end, action), Query(start, action))))",
    # IterateUntil with ExistsFrame/FilterFrame rewrite
    "Query(class, OnlyItem(IterateUntil(forward, video, Exists(dish, Filter(frame, [objects])), Filter(frame, [relations, touching, objects]))))",
    "Query(class, OnlyItem(IterateUntil(backward, video, Exists(dish, Filter(frame, [objects])), Filter(frame, [relations, touching, objects]))))",
    # IterateUntil with Xor bool function
    "Query(class, OnlyItem(IterateUntil(forward, video, Xor(Exists(dish, Filter(frame, [objects])), Exists(cup, Filter(frame, [objects]))), Filter(frame, [relations, touching, objects]))))",
    # Compare duplication
    "Compare(Array2(before, after), Exists(dish, Iterate(Localize(temporal_tag, washing a window), Filter(frame, [objects]))))",
    # XOR / AND renames, Array3 collapse
    "XOR(Exists(food, Iterate(video, Filter(frame, [Array3]))), Exists(cup, Iterate(video, Filter(frame, [objects]))))".replace("[Array3]", "[relations, holding, objects]"),
    "AND(Exists(food, Iterate(video, Filter(frame, [objects]))), Exists(cup, Iterate(video, Filter(frame, [objects]))))",
    # IterateUntil nested inside a bigger program (reference smoke program)
    "Query(class, IterateUntil(forward, Localize(after, eating a sandwich), Exists(taking, Filter(frame, [relations])), Filter(frame, [relations, taking, objects])))",
]


def test_tokenize_brackets():
    toks = tokenize_annotation("Filter(frame, [relations, holding, objects])")
    assert toks == ["Filter", "frame", "Array3", "relations", "holding", "objects"]
    toks = tokenize_annotation("Localize(between, [a b, c d])")
    assert toks == ["Localize", "between", "Array2", "a_b", "c_d"]
    # nested op inside a bracket consumes its own args
    toks = tokenize_annotation("[Filter(frame, [objects]), x]")
    assert toks[0] == "Array2"


@pytest.mark.parametrize("program", PROGRAMS)
def test_outputs_are_valid_programs(program):
    parsed = parse_nmn_program(program)
    assert program_is_valid(parsed.tokens), parsed.tokens
    assert len(parsed.tokens) == len(parsed.source_index)
    sg_tokens, sg_idx = parse_sg_program(program)
    assert len(sg_tokens) == len(sg_idx)


def test_localize_rewrite():
    parsed = parse_nmn_program(
        "Exists(dish, Iterate(Localize(while, holding a dish), Filter(frame, [objects])))"
    )
    t = parsed.tokens
    # Iterate collapsed into Filter; Localize became Temporal+Localize.
    assert "Iterate" not in t and "frame" not in t
    i = t.index("Temporal")
    assert t[i:i + 6] == ["Temporal", "while", "video", "Localize", "video", "holding_a_dish"]
    # Localize inherits the mode token's source index (supervision join key).
    src = parsed.source_index
    assert src[i + 3] is not None and src[i + 1] is None


def test_subtract_and_superlative_rewrite():
    parsed = parse_nmn_program(
        "Query(class, Superlative(max, Filter(video, [actions]), "
        "Subtract(Query(end, action), Query(start, action))))"
    )
    assert parsed.tokens == [
        "Superlative", "max", "FilterFrame", "video", "actions", "video",
    ]


def test_iterate_until_rewrite():
    parsed = parse_nmn_program(
        "Query(class, OnlyItem(IterateUntil(forward, video, "
        "Exists(dish, Filter(frame, [objects])), "
        "Filter(frame, [relations, touching, objects]))))"
    )
    assert parsed.tokens == [
        "Filter", "AttnVideo", "video", "Relate", "forward",
        "ExistsFrame", "dish", "FilterFrame", "video", "objects", "touching",
    ]
    # The ExistsFrame<-FilterFrame supervision mapping uses source indices.
    assert len(parsed.existsframe_to_filterframe) == 1
    ((ef, ff),) = parsed.existsframe_to_filterframe.items()
    assert parsed.source_tokens[ef] == "Exists"
    assert parsed.source_tokens[ff] == "Filter"


def test_compare_rewrite():
    parsed = parse_nmn_program(
        "Compare(Array2(before, after), Exists(dish, Iterate("
        "Localize(temporal_tag, washing a window), Filter(frame, [objects]))))"
    )
    t = parsed.tokens
    assert t[0] == "Compare"
    assert t.count("before") == 1 and t.count("after") == 1
    assert "temporal_tag" not in t
    assert program_is_valid(t)
    # the two copies share source indices
    body = t[1:]
    assert len(body) % 2 == 0


def test_tree_utilities():
    parsed = parse_nmn_program(PROGRAMS[0])
    kids, parents = children_and_parents(parsed.tokens)
    assert parents[0] == 0
    levels = module_levels(parsed.tokens)
    assert levels[0] == max(levels)
    assert all(
        levels[k] < levels[p]
        for p, ks in enumerate(kids)
        for k in ks
    )


def test_program_is_valid_rejects():
    assert not program_is_valid(["Exists", "food"])  # missing an argument
    assert not program_is_valid(["Exists", "a", "b", "c"])  # extra value
    assert program_is_valid(["Filter", "video", "actions"])


def test_repair_generated_program():
    fixed = repair_generated_program(
        ["Filter", "next", "actions"]
    )
    assert fixed == ["Filter", "video", "actions"]
    fixed = repair_generated_program(["Temporal", "when", "video", "Localize", "video", "x"])
    assert fixed[1] == "while"
    assert repair_generated_program(["Exists", "only_one_arg"]) is None


# ---------------------------------------------------------------------------
# Golden parity vs the PyTorch reference implementation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("program", PROGRAMS)
def test_nmn_parse_parity_with_reference(reference_modules, program):
    ref = reference_modules["parser"]
    ref_tokens, ref_meta = ref.parse_program(program)
    parsed = parse_nmn_program(program)
    assert parsed.tokens == ref_tokens
    assert parsed.source_index == ref_meta["idx_list"]
    assert parsed.source_tokens == ref_meta["common_list"]
    ref_map = ref_meta["existsframe_filterframe_idx_mapping"]
    if ref_map is not None:
        assert parsed.existsframe_to_filterframe == ref_map


@pytest.mark.parametrize("program", PROGRAMS)
def test_sg_parse_parity_with_reference(reference_modules, program):
    ref = reference_modules["scene_graphs"]
    ref_tokens, ref_idx = ref.parse_program(program)
    tokens, idx = parse_sg_program(program)
    assert tokens == ref_tokens
    assert idx == ref_idx


def test_levels_parity_with_reference(reference_modules):
    ref = reference_modules["parser"]
    for program in PROGRAMS:
        tokens = parse_nmn_program(program).tokens
        assert module_levels(tokens) == ref.stat_module_levels(tokens)
        kids, parents = children_and_parents(tokens)
        ref_kids, ref_parents = ref.get_childrens_and_parents(tokens)
        assert kids == ref_kids and parents == ref_parents

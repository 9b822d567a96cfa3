"""Native C++ parser+lowerer parity vs the Python pipeline."""

import json

import numpy as np
import pytest

from stair_tpu.ir.lowering import _INT_FIELDS, lower_program, pad_traces
from stair_tpu.programs.parser import parse_nmn_program
from stair_tpu.runtime.loader import native_parse_lower_batch, parser_lib
from stair_tpu.testing.workload import PROGRAM_TEMPLATES

from tests.test_parser import PROGRAMS as PARSER_CORPUS


def _python_batch(programs, T, NV, NF, NA):
    traces = []
    for p in programs:
        parsed = parse_nmn_program(p)
        traces.append(lower_program(parsed.tokens, parsed.source_index, {}))
    return pad_traces(traces, T, NV, NF, NA)


def _assert_batches_equal(native, python):
    for name in _INT_FIELDS:
        np.testing.assert_array_equal(
            native.fields[name], python.fields[name], err_msg=name
        )
    np.testing.assert_array_equal(native.step_mask, python.step_mask)
    np.testing.assert_array_equal(native.supervised, python.supervised)
    np.testing.assert_array_equal(native.root_is_vec, python.root_is_vec)
    np.testing.assert_array_equal(native.root_reg, python.root_reg)
    np.testing.assert_array_equal(native.num_steps, python.num_steps)


def test_native_parser_builds():
    assert parser_lib() is not None


@pytest.mark.parametrize("corpus", ["templates", "parser_corpus"])
def test_native_matches_python(corpus):
    programs = list(
        PROGRAM_TEMPLATES if corpus == "templates" else PARSER_CORPUS
    )
    T, NV, NF, NA = 40, 24, 8, 12
    native = native_parse_lower_batch(programs, T, NV, NF, NA)
    assert native is not None
    python = _python_batch(programs, T, NV, NF, NA)
    _assert_batches_equal(native, python)


def test_native_matches_python_on_synthetic_world(synthetic_world):
    with open(synthetic_world["questions"]) as f:
        questions = json.load(f)
    programs = [rec["program"] for rec in questions.values()]
    T, NV, NF, NA = 40, 24, 8, 12
    native = native_parse_lower_batch(programs, T, NV, NF, NA)
    python = _python_batch(programs, T, NV, NF, NA)
    _assert_batches_equal(native, python)


def test_native_falls_back_on_bad_program():
    # One invalid program in the batch: the wrapper's Python fallback must
    # raise the same clean error the Python path raises.
    with pytest.raises(Exception):
        native_parse_lower_batch(
            ["Exists(food, Iterate(video, Filter(frame, [objects])))",
             "Exists(broken"],
            40, 24, 8, 12,
        )


def test_native_parse_speed():
    import time

    programs = [
        PROGRAM_TEMPLATES[i % len(PROGRAM_TEMPLATES)] for i in range(512)
    ]
    native_parse_lower_batch(programs[:8], 40, 24, 8, 12)  # warm
    t0 = time.perf_counter()
    for _ in range(4):
        native_parse_lower_batch(programs, 40, 24, 8, 12)
    native_dt = (time.perf_counter() - t0) / (4 * len(programs))
    t0 = time.perf_counter()
    _python_batch(programs, 40, 24, 8, 12)
    python_dt = (time.perf_counter() - t0) / len(programs)
    print(f"native {native_dt*1e6:.1f} us/q vs python {python_dt*1e6:.1f} us/q")
    assert native_dt < python_dt, "native parse must beat the Python path"


def test_malformed_programs_no_crash():
    """Malformed annotation strings must return ok=0 (falling back to the
    Python parser, which raises cleanly) — never UB in the C++ parser.
    Regression: unmatched ']' and arity underflow used to pop empty stacks."""
    import pytest

    from stair_tpu.runtime.loader import native_parse_lower_batch

    bad = ["]]]", "[[", "Exists(", "Compare(Xor(", "IterateUntil(a)",
           "Filter([)", "", ")(", "Superlative(max)"]
    for prog in bad:
        # Outcome is either a clean Python exception or a valid TraceBatch
        # (some of these degenerate to a single free-text token); the
        # regression is the process not dying in native code.
        try:
            tb = native_parse_lower_batch([prog], 8, 4, 4, 4)
        except Exception:
            continue
        assert tb is not None and tb.num_steps.shape == (1,)
    # Bracket underflow specifically must raise via the Python fallback.
    with pytest.raises(Exception):
        native_parse_lower_batch(["]]]"], 8, 4, 4, 4)


def test_fallback_capacity_validation():
    """The Python-fallback branch must enforce register capacities like
    pad_traces (loader.py contract), not emit clamped indices."""
    import pytest

    from stair_tpu.runtime.loader import native_parse_lower_batch

    # A valid deep program that needs more vec registers than capacity 1.
    prog = "And(Exists(a, b), Exists(c, d))"
    with pytest.raises(ValueError):
        native_parse_lower_batch([prog], 16, 1, 1, 1)


def test_native_span_linking_matches_python(synthetic_world, monkeypatch):
    """C++ span linking (tokenize + POS + lemmatize + subsequence match)
    must reproduce the Python fallback pipeline field-for-field on every
    synthetic-world question and on the template pool."""
    import json

    import numpy as np

    from stair_tpu.ir.lowering import (
        _INT_FIELDS, _F_SPAN_START, _F_SPAN_END, lower_program, pad_traces,
    )
    from stair_tpu.programs import text
    from stair_tpu.programs.parser import parse_nmn_program
    from stair_tpu.programs.spans import link_program_spans
    from stair_tpu.runtime.loader import native_parse_lower_batch
    from stair_tpu.testing.workload import PROGRAM_TEMPLATES

    # The C++ port mirrors the deterministic fallback; pin it so the test
    # is stable whether or not nltk corpora happen to be installed.
    monkeypatch.setattr(text, "HAVE_NLTK", False)

    with open(synthetic_world["questions"]) as f:
        qs = json.load(f)
    cases = [(r["program"], r["question"]) for r in qs.values()]
    cases += [
        (p, "what did the person hold while sitting on a chair ?")
        for p in PROGRAM_TEMPLATES
    ]
    programs = [p for p, _ in cases]
    questions = [q for _, q in cases]

    traces = []
    for prog, q in cases:
        parsed = parse_nmn_program(prog)
        by_word, _ = link_program_spans(parsed.tokens, q)
        traces.append(
            lower_program(parsed.tokens, parsed.source_index, by_word or {})
        )
    T = max(len(t.instrs) for t in traces)
    NV = max(t.num_vec for t in traces)
    NF = max(t.num_frames for t in traces)
    NA = max(t.num_attn for t in traces)
    ref = pad_traces(traces, T, NV, NF, NA)

    tb = native_parse_lower_batch(
        programs, T, NV, NF, NA, questions=questions
    )
    assert tb is not None
    linked = 0
    for name in _INT_FIELDS:
        np.testing.assert_array_equal(
            tb.fields[name], ref.fields[name],
            err_msg=f"field {name} diverges",
        )
    linked = int(np.sum(tb.fields["span_start"] >= 0))
    assert linked > 0, "no span was linked at all (port is inert)"

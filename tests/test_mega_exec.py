"""Parity: the executor megakernel (ops/mega_exec.py) vs the XLA scan.

The megakernel runs one example's ENTIRE program per grid tile with all
three register files resident in VMEM, so a numerics bug in any opcode
branch corrupts downstream registers silently. These tests run it under
the Pallas interpreter (CPU) against the reference XLA ragged_dot path
(STAIR_FUSED_EXEC=0, STAIR_MEGA_EXEC=0) and require full register-file
agreement — and they assert the hand-written program set covers EVERY
live opcode, so coverage cannot rot as opcodes are added.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from stair_tpu.ir.lowering import Opcode, lower_program, pad_traces
from stair_tpu.models.nmn import NMNConfig, VideoNMN

H, F, VD, TD, L = 32, 16, 24, 20, 10

# (tokens, span_by_word) — prefix programs collectively covering every
# opcode, heterogeneous kinds mixed in one batch.
PROGRAMS = [
    (["And", "cup", "dish"], {}),                              # AND_VEC
    (["Compare", "cup", "dish"], {1: (0, 3)}),                 # + real span
    (["Equals", "cup", "dish"], {}),
    (["Choose", "cup", "dish", "phone"], {}),
    (["Xor", "cup", "dish"], {}),
    (["Query", "cup"], {}),
    (["ToAction", "cup", "dish"], {}),
    (["Exists", "cup", "Filter", "video", "objects"], {}),
    (["ExistsFrame", "cup", "video"], {}),
    (["HasItem", "video"], {}),
    (["And", "HasItem", "video", "ExistsFrame", "cup", "video"], {}),
    (["Xor", "HasItem", "video", "ExistsFrame", "cup", "video"], {}),
    (["Localize", "video", "cup"], {}),
    (["Localize", "video", "Array2", "cup", "dish"], {}),
    (["Superlative", "max", "cup", "video"], {}),
    (["Superlative", "min", "Array2", "cup", "dish", "video"], {}),
    (["Superlative", "max", "FilterFrame", "video", "actions", "video"],
     {}),                                                      # SUP_F
    (["Filter", "Temporal", "while", "video", "HasItem", "video",
      "actions"], {}),
    (["Filter", "Temporal", "before", "video", "Array2", "HasItem",
      "video", "ExistsFrame", "cup", "video", "actions"], {}),
    (["Filter", "Temporal", "after", "AttnVideo", "video", "HasItem",
      "video", "HasItem", "video", "relations"], {}),
    (["Filter", "video", "cup"], {2: (2, 5)}),                 # FILTER_V
    (["Filter", "video", "actions"], {}),
    (["Filter", "video", "relations"], {}),
    (["FilterFrame", "video", "cup"], {}),
    (["FilterFrame", "video", "objects"], {}),
    (["Filter", "AttnVideo", "video", "Relate", "forward", "HasItem",
      "video", "actions"], {}),
    (["Filter", "AttnVideo", "video", "Relate", "backward", "HasItem",
      "video", "objects"], {}),
]


def _build(max_video_length=F, hidden=H, filter_attention="parity"):
    cfg = NMNConfig(
        hidden_size=hidden, video_size=VD, text_size=TD,
        answer_vocab_length=7, max_video_length=max_video_length,
        object_types=3, have_pretrain_head=True,
        max_steps=16, num_vec=10, num_frames=6, num_attn=8, dropout=0.0,
        filter_attention=filter_attention,
    )
    model = VideoNMN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def _batch(cfg, programs, seed=0, aux=False):
    rng = np.random.RandomState(seed)
    traces = [
        lower_program(toks, None, spans,
                      aux_text_for_missing_spans=aux)
        for toks, spans in programs
    ]
    tb = pad_traces(traces, cfg.max_steps, cfg.num_vec, cfg.num_frames,
                    cfg.num_attn)
    B = len(traces)
    Fv = cfg.max_video_length
    batch = {
        "question": rng.randn(B, L, TD).astype(np.float32),
        "question_mask": (np.arange(L)[None, :]
                          < rng.randint(4, L + 1, size=(B, 1))
                          ).astype(np.float32),
        "video": rng.randn(B, Fv, VD).astype(np.float32),
        "video_mask": (np.arange(Fv)[None, :]
                       < rng.randint(3, Fv + 1, size=(B, 1))
                       ).astype(np.float32),
        "trace": tb.fields,
        "root_reg": tb.root_reg,
        "root_is_vec": tb.root_is_vec,
    }
    if aux:
        batch["aux_emb"] = rng.randn(
            B, cfg.max_steps, 4, TD).astype(np.float32)
        batch["aux_mask"] = np.ones((B, cfg.max_steps, 4), np.float32)
    return batch, traces


def _compare(model, params, batch, monkeypatch, rtol=1e-5, atol=2e-5):
    monkeypatch.setenv("STAIR_FUSED_EXEC", "0")
    monkeypatch.setenv("STAIR_MEGA_EXEC", "0")
    ref = model.forward(params, batch, deterministic=True)
    monkeypatch.setenv("STAIR_MEGA_EXEC", "interpret")
    out = model.forward(params, batch, deterministic=True)
    for key in ("regs_vec", "regs_frames", "regs_attn", "logits"):
        np.testing.assert_allclose(
            np.asarray(ref[key]), np.asarray(out[key]),
            rtol=rtol, atol=atol, err_msg=key,
        )


def test_opcode_coverage_is_total():
    covered = set()
    for toks, spans in PROGRAMS:
        tr = lower_program(toks, None, spans)
        covered |= {i.opcode for i in tr.instrs}
    live = set(Opcode) - {Opcode.NOP}
    assert covered == live, f"uncovered opcodes: {sorted(live - covered)}"


def test_megakernel_all_opcodes_parity(monkeypatch):
    cfg, model, params = _build()
    batch, _ = _batch(cfg, PROGRAMS)
    _compare(model, params, batch, monkeypatch)


# Filter-focused program subset for the softmax-mode parity tests: the
# softmax branch only changes FILTER_V/FILTER_K pooling, so the quick
# tier runs these programs (every Filter variant + one consumer chain)
# instead of the full 27-program sweep (tier budget, VERDICT r4 #8).
FILTER_PROGRAMS = [p for p in PROGRAMS if p[0][0] == "Filter"] + [
    (["Exists", "cup", "Filter", "video", "objects"], {}),
]


def test_megakernel_softmax_filter_parity(monkeypatch):
    """--filter-attention softmax now runs IN the megakernel (VERDICT r4
    #3): masked-softmax FILTER_V pooling must match the XLA scan's
    softmax branch."""
    cfg, model, params = _build(filter_attention="softmax")
    batch, _ = _batch(cfg, FILTER_PROGRAMS)
    _compare(model, params, batch, monkeypatch, rtol=2e-5, atol=5e-5)


@pytest.mark.slow
def test_megakernel_softmax_filter_parity_all_opcodes(monkeypatch):
    """Softmax mode over the FULL opcode mix (slow tier)."""
    cfg, model, params = _build(filter_attention="softmax")
    batch, _ = _batch(cfg, PROGRAMS)
    _compare(model, params, batch, monkeypatch, rtol=2e-5, atol=5e-5)


@pytest.mark.slow
def test_megakernel_conv_temporal_parity(monkeypatch):
    """F > 32 flips the temporal stack to banded conv matrices."""
    cfg, model, params = _build(max_video_length=48)
    progs = [p for p in PROGRAMS if "Temporal" in p[0]] + PROGRAMS[:6]
    batch, _ = _batch(cfg, progs, seed=3)
    _compare(model, params, batch, monkeypatch)


@pytest.mark.slow
def test_megakernel_aux_embedding_parity(monkeypatch):
    """--use-prog-word-embeddings: missing spans lower to (-2, -2) and the
    executor substitutes the per-step auxiliary text encoding."""
    cfg, model, params = _build()
    progs = [(["Query", "cup"], {}), (["Filter", "video", "cup"], {}),
             (["ToAction", "cup", "dish"], {})]
    batch, _ = _batch(cfg, progs, seed=4, aux=True)
    _compare(model, params, batch, monkeypatch)


@pytest.mark.slow
def test_megakernel_workload_pool_parity(monkeypatch):
    """Full forward over the bench workload's program pool (the shapes the
    TPU headline runs at, shrunk)."""
    from stair_tpu.testing import workload

    cfg = workload.workload_config(
        hidden_size=128, video_size=32, max_video_length=16
    )
    model, params = workload.build_model(cfg)
    batch = workload.make_batch(cfg, batch_size=12, seed=5)
    _compare(model, params, batch, monkeypatch)


@pytest.mark.slow
def test_megakernel_bf16_argmax_agreement(monkeypatch):
    """bfloat16 compute mode: rounding differs between the paths, so the
    contract is answer agreement, not bitwise equality."""
    from stair_tpu.testing import workload

    cfg = workload.workload_config(
        hidden_size=128, video_size=32, max_video_length=16
    )
    cfg = type(cfg)(**{**cfg.to_dict(), "compute_dtype": "bfloat16"})
    model, params = workload.build_model(cfg)
    batch = workload.make_batch(cfg, batch_size=16, seed=6)
    monkeypatch.setenv("STAIR_FUSED_EXEC", "0")
    monkeypatch.setenv("STAIR_MEGA_EXEC", "0")
    ref = model.forward(params, batch, deterministic=True)
    monkeypatch.setenv("STAIR_MEGA_EXEC", "interpret")
    out = model.forward(params, batch, deterministic=True)
    ref_ans = np.argmax(np.asarray(ref["logits"]), -1)
    out_ans = np.argmax(np.asarray(out["logits"]), -1)
    assert (ref_ans == out_ans).mean() >= 0.9

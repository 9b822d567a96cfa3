"""Guard: the executor's fused gathered-weight dispatch must match the
standalone per-module functions in stair_tpu.models.modules.

The fused path inlines the filter-family MLPs, the shared Localize
projection and both Superlative variants for speed; these tests pin it to
the one-module-one-function reference API so the two cannot drift.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from stair_tpu.ir.lowering import lower_program, pad_traces
from stair_tpu.models import modules as M
from stair_tpu.models.nmn import NMNConfig, VideoNMN

H, F, VD, TD, L = 32, 16, 24, 20, 6


@pytest.fixture(scope="module")
def setup():
    cfg = NMNConfig(
        hidden_size=H, video_size=VD, text_size=TD, answer_vocab_length=7,
        max_video_length=F, object_types=3, have_pretrain_head=True,
        max_steps=8, num_vec=6, num_frames=3, num_attn=4, dropout=0.0,
    )
    model = VideoNMN(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "question": rng.randn(1, L, TD).astype(np.float32),
        "question_mask": np.ones((1, L), np.float32),
        "video": rng.randn(1, F, VD).astype(np.float32),
        "video_mask": np.ones((1, F), np.float32),
    }
    return cfg, model, params, batch


def _run(model, params, batch, program_tokens):
    tr = lower_program(program_tokens)
    tb = pad_traces([tr], model.config.max_steps, model.config.num_vec,
                    model.config.num_frames, model.config.num_attn)
    bdict = dict(
        batch, trace=tb.fields, root_reg=tb.root_reg,
        root_is_vec=tb.root_is_vec,
    )
    out = model.forward(params, bdict)
    return tr, out


def _inputs(model, params, batch):
    vf = model.encode_video(
        params, jnp.asarray(batch["video"]), jnp.asarray(batch["video_mask"])
    )[0]
    tf, _ = model.encode_question(
        params, jnp.asarray(batch["question"]),
        jnp.asarray(batch["question_mask"]),
    )
    return vf, tf[0]


def test_filter_kw_matches_module_fn(setup):
    cfg, model, params, batch = setup
    tr, out = _run(model, params, batch, ["Filter", "video", "actions"])
    vf, _ = _inputs(model, params, batch)
    mask = jnp.ones((F,))
    expected = M.filter_module_kw(
        params["modules"]["filter"], vf, 0, mask, 0.0,
        jax.random.PRNGKey(0), True,
    )
    got = out["regs_vec"][0, tr.instrs[-1].out_vec]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_filterframe_vec_matches_module_fn(setup):
    cfg, model, params, batch = setup
    # FilterFrame(video, text) -> frames; root via Filter for a vec root.
    tokens = ["Filter", "FilterFrame", "video", "some_text", "actions"]
    tr, out = _run(model, params, batch, tokens)
    vf, tf = _inputs(model, params, batch)
    kw = jnp.mean(tf, axis=0)  # span (-1,-1): whole-question mean
    mask = jnp.ones((F,))
    expected = M.filterframe_module_vec(
        params["modules"]["filterframe"], vf, kw, mask, 0.0,
        jax.random.PRNGKey(0), True,
    )
    ff_instr = next(i for i in tr.instrs if i.out_frames > 0)
    got = out["regs_frames"][0, ff_instr.out_frames]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_localize_and_superlative_match_module_fns(setup):
    cfg, model, params, batch = setup
    tokens = ["Superlative", "max", "FilterFrame", "video", "actions",
              "video"]
    tr, out = _run(model, params, batch, tokens)
    vf, _ = _inputs(model, params, batch)
    mask = jnp.ones((F,))
    ff = M.filterframe_module_kw(
        params["modules"]["filterframe"], vf, 0, mask, 0.0,
        jax.random.PRNGKey(0), True,
    )
    expected = M.superlative_module(
        params["modules"]["superlative"], params["modules"]["localize"],
        False, ff, vf, mask, 0.0, jax.random.PRNGKey(0), True,
        action_mask=mask > 0,
    )
    got = out["regs_vec"][0, tr.instrs[-1].out_vec]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_localize_scores_match(setup):
    cfg, model, params, batch = setup
    tokens = ["Filter", "Temporal", "while", "video", "Localize", "video",
              "text_arg", "actions"]
    tr, out = _run(model, params, batch, tokens)
    vf, tf = _inputs(model, params, batch)
    kw = jnp.mean(tf, axis=0)
    mask = jnp.ones((F,))
    expected = M.localize_scores(
        params["modules"]["localize"], vf, kw[None, :], mask, 0.0,
        jax.random.PRNGKey(0), True,
    )[0]
    loc = next(i for i in tr.instrs if i.opcode == 14)
    got = out["regs_attn"][0, loc.out_attn]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_softmax_filter_mode_and_bf16(setup):
    """Config variants: corrected Filter attention and bf16 execution.

    Slow tier: the softmax Filter branch now has dedicated quick-tier
    megakernel parity tests (test_mega_exec/test_mega_grad), and the
    per-step fused kernel is the mega kernels' fallback."""
    import dataclasses

    cfg, model, params, batch = setup
    tokens = ["Filter", "video", "some_text"]
    tr, out_parity = _run(model, params, batch, tokens)

    model_sm = VideoNMN(dataclasses.replace(cfg, filter_attention="softmax"))
    _, out_sm = _run(model_sm, params, batch, tokens)
    a = np.asarray(out_parity["regs_vec"][0, tr.instrs[-1].out_vec])
    b = np.asarray(out_sm["regs_vec"][0, tr.instrs[-1].out_vec])
    assert np.isfinite(b).all()
    assert not np.allclose(a, b), "softmax mode must differ from parity"

    model_bf = VideoNMN(dataclasses.replace(cfg, compute_dtype="bfloat16"))
    _, out_bf = _run(model_bf, params, batch, tokens)
    c = np.asarray(out_bf["logits"])
    assert np.isfinite(c).all()
    ref_logits = np.asarray(out_parity["logits"])
    # bf16 tracks fp32 loosely (matmul rounding accumulates over the LSTM).
    scale = np.abs(ref_logits).max() + 1e-6
    assert np.abs(c - ref_logits).max() / scale < 0.15


@pytest.mark.slow
def test_transformer_encoder_mode(setup):
    """--encoder transformer: full forward runs and trains a step."""
    import dataclasses
    import optax
    from stair_tpu.train.losses import total_loss

    cfg, _, _, batch = setup
    cfg_t = dataclasses.replace(cfg, encoder="transformer")
    model = VideoNMN(cfg_t)
    params = model.init(jax.random.PRNGKey(1))
    tr, out = _run(model, params, batch, ["Filter", "video", "actions"])
    assert np.isfinite(np.asarray(out["logits"])).all()
    # gradient flows through the transformer encoders
    tb = pad_traces([tr], cfg.max_steps, cfg.num_vec, cfg.num_frames,
                    cfg.num_attn)
    bdict = dict(batch, trace=tb.fields, root_reg=tb.root_reg,
                 root_is_vec=tb.root_is_vec,
                 answer=np.zeros((1,), np.int32),
                 sup_channel=np.zeros((1, cfg.max_steps), np.int32),
                 sup_bool=np.zeros((1, cfg.max_steps), np.float32),
                 sup_attn=np.zeros((1, cfg.max_steps, 2, F), np.float32),
                 sup_attn_rows=np.zeros((1, cfg.max_steps), np.int32),
                 class_emb=np.zeros((4, 3, TD), np.float32),
                 class_emb_mask=np.ones((4, 3), np.float32),
                 class_valid=np.ones((4,), np.float32),
                 sup_class=-np.ones((1, cfg.max_steps, 2), np.int32),
                 ff_index=np.zeros((1, 2), np.int32),
                 ff_gold=np.zeros((1, F, cfg.object_types), np.float32),
                 ff_valid=np.zeros((1,), np.float32))
    grads = jax.grad(lambda p: total_loss(
        model, p, bdict, jax.random.PRNGKey(0), 1.0, 1.0, 1.0, 1.0,
        deterministic=True)[0])(params)
    enc_leaves = jax.tree_util.tree_leaves(grads["video_encoder"])
    assert any(np.any(np.asarray(g) != 0) for g in enc_leaves)


def test_cosine_matrix_matches_broadcast():
    import numpy as np

    from stair_tpu.models.modules import cosine, cosine_matrix

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(5, 16).astype(np.float32))
    y = jnp.asarray(rng.randn(7, 16).astype(np.float32))
    ref = cosine(x[:, None, :], y[None, :, :])
    got = cosine_matrix(x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_conv1d_same_matrix_matches_conv():
    import numpy as np

    from stair_tpu.models.modules import _conv1d_same, conv1d_same_matrix

    rng = np.random.RandomState(1)
    for k in (3, 7, 16):
        for length in (8, 64):
            w = jnp.asarray(rng.randn(k).astype(np.float32))
            x = jnp.asarray(rng.randn(length).astype(np.float32))
            ref = _conv1d_same(x, w, 0.0)
            got = conv1d_same_matrix(w, length) @ x
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)


def test_temporal_batched_matches_per_example():
    import numpy as np

    from stair_tpu.models.modules import (
        init_module_params,
        temporal_related_attn,
        temporal_related_attn_batched,
    )

    rng = np.random.RandomState(3)
    for conv_mode, F in ((True, 64), (False, 16)):
        params = init_module_params(
            jax.random.PRNGKey(0),
            {"hidden_size": 16, "max_video_length": F, "dropout": 0.0,
             "object_types": 4, "have_pretrain_head": False},
        )["temporal"]
        mode = jnp.asarray(rng.randint(0, 4, (8,)), jnp.int32)
        attn = jnp.asarray(rng.rand(8, F).astype(np.float32))
        ref = jnp.stack([
            temporal_related_attn(params, mode[b], attn[b], conv_mode)
            for b in range(8)
        ])
        got = temporal_related_attn_batched(params, mode, attn, conv_mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


def test_temporal_matches_module_fn(setup):
    cfg, model, params, batch = setup
    # Temporal(before, video, Localize(video, text)) -> frames; Filter root.
    tokens = ["Filter", "Temporal", "before", "video", "Localize", "video",
              "text_arg", "actions"]
    tr, out = _run(model, params, batch, tokens)
    vf, tf = _inputs(model, params, batch)
    kw = jnp.mean(tf, axis=0)
    mask = jnp.ones((F,))
    loc_attn = M.localize_scores(
        params["modules"]["localize"], vf, kw[None, :], mask, 0.0,
        jax.random.PRNGKey(0), True,
    )[0]
    expected, expected_rel = M.temporal_module(
        params["modules"]["temporal"], 1, vf, loc_attn, mask,
        cfg.conv_temporal, 0.0, jax.random.PRNGKey(0), True,
    )
    t_instr = next(i for i in tr.instrs if i.opcode == 17)
    got = out["regs_frames"][0, t_instr.out_frames]
    got_rel = out["regs_attn"][0, t_instr.out_attn_b]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_rel), np.asarray(expected_rel),
                               rtol=2e-4, atol=2e-5)


def test_hasitem_matches_module_fn(setup):
    cfg, model, params, batch = setup
    tokens = ["Filter", "AttnVideo", "video", "HasItem", "video", "actions"]
    tr, out = _run(model, params, batch, tokens)
    vf, _ = _inputs(model, params, batch)
    mask = jnp.ones((F,))
    expected = M.hasitem_module(
        params["modules"]["hasitem"], vf, mask, 0.0,
        jax.random.PRNGKey(0), True,
    )
    hi = next(i for i in tr.instrs if i.opcode == 11)
    got = out["regs_attn"][0, hi.out_attn]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fused_pallas_step_full_forward_parity(monkeypatch):
    """The fused Pallas executor step (deterministic path: in-kernel
    operand gathers, stage-1/2 expert MLPs, epilogues, pooling, hasitem,
    existsframe — ops/executor_step.py) must reproduce the XLA
    ragged_dot path on a full forward, register files included."""
    from stair_tpu.testing import workload

    cfg = workload.workload_config(
        hidden_size=128, video_size=32, max_video_length=16
    )
    model, params = workload.build_model(cfg)
    batch = workload.make_batch(cfg, batch_size=12, seed=5)

    monkeypatch.setenv("STAIR_FUSED_EXEC", "0")
    ref = model.forward(params, batch, deterministic=True)
    monkeypatch.setenv("STAIR_FUSED_EXEC", "interpret")
    out = model.forward(params, batch, deterministic=True)
    for key in ("logits", "regs_vec", "regs_frames", "regs_attn"):
        np.testing.assert_allclose(
            np.asarray(ref[key]), np.asarray(out[key]),
            rtol=1e-5, atol=2e-5, err_msg=key,
        )

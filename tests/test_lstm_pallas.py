"""Parity: the Pallas BiLSTM forward (ops/lstm.py bilstm_pallas) vs the
differentiable lax.scan path it replaces on deterministic TPU forwards.

The kernel carries (h, c) in VMEM scratch across a (batch-tile, time)
grid and writes each token row once; the backward direction reads its
blocks through reversed index maps. These tests run it under the Pallas
interpreter (CPU) against jax.vmap(bilstm) and through the full NMN
forward via STAIR_PALLAS_LSTM=interpret.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from stair_tpu.ops.lstm import (
    bilstm,
    bilstm_pallas,
    bilstm_pallas_train,
    init_lstm_params,
)


def _data(B, L, D, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    lens = rng.randint(1, L + 1, size=B)
    mask = jnp.asarray(
        (np.arange(L)[None] < lens[:, None]).astype(np.float32)
    )
    return x, mask


@pytest.mark.parametrize("B,L,D,h,bb", [
    (5, 9, 12, 8, 4),     # batch padding (5 % 4 != 0) + ragged masks
    (8, 16, 24, 16, 8),   # single tile
    (6, 4, 6, 8, 2),      # multiple tiles, tiny sequence
])
def test_pallas_bilstm_f32_parity(B, L, D, h, bb):
    p = init_lstm_params(jax.random.PRNGKey(1), D, h)
    x, mask = _data(B, L, D, seed=B)
    ref_t, ref_s = jax.vmap(lambda xx, mm: bilstm(p, xx, mm))(x, mask)
    out_t, out_s = bilstm_pallas(p, x, mask, interpret=True,
                                 block_batch=bb)
    np.testing.assert_allclose(np.asarray(ref_t), np.asarray(out_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_s), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pallas_bilstm_bf16_parity():
    B, L, D, h = 7, 12, 20, 16
    p = init_lstm_params(jax.random.PRNGKey(2), D, h)
    x, mask = _data(B, L, D, seed=3)
    ref_t, ref_s = jax.vmap(
        lambda xx, mm: bilstm(p, xx, mm, mm_dtype=jnp.bfloat16)
    )(x, mask)
    out_t, out_s = bilstm_pallas(p, x, mask, mm_dtype=jnp.bfloat16,
                                 interpret=True, block_batch=4)
    np.testing.assert_allclose(np.asarray(ref_t), np.asarray(out_t),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ref_s), np.asarray(out_s),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_pallas_bilstm_all_padding_row():
    """A fully-masked row (mask all zero) must yield zero tokens and the
    zero initial state as its sentence feature, like the scan path."""
    B, L, D, h = 4, 6, 10, 8
    p = init_lstm_params(jax.random.PRNGKey(3), D, h)
    x, mask = _data(B, L, D, seed=5)
    mask = mask.at[2].set(0.0)
    ref_t, ref_s = jax.vmap(lambda xx, mm: bilstm(p, xx, mm))(x, mask)
    out_t, out_s = bilstm_pallas(p, x, mask, interpret=True,
                                 block_batch=4)
    np.testing.assert_allclose(np.asarray(ref_t), np.asarray(out_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_s), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(out_t[2])).max() == 0.0


@pytest.mark.slow
def test_nmn_forward_parity_with_pallas_lstm(monkeypatch):
    """Full NMN deterministic forward: Pallas-LSTM encoders vs the scan
    encoders, everything else held on the XLA executor path."""
    from stair_tpu.testing import workload

    cfg = workload.workload_config(
        hidden_size=64, video_size=24, max_video_length=12
    )
    model, params = workload.build_model(cfg)
    batch = workload.make_batch(cfg, batch_size=6, seed=7)
    monkeypatch.setenv("STAIR_FUSED_EXEC", "0")
    monkeypatch.setenv("STAIR_MEGA_EXEC", "0")
    monkeypatch.setenv("STAIR_PALLAS_LSTM", "0")
    ref = model.forward(params, batch, deterministic=True)
    monkeypatch.setenv("STAIR_PALLAS_LSTM", "interpret")
    out = model.forward(params, batch, deterministic=True)
    for key in ("logits", "question_feature", "token_features"):
        np.testing.assert_allclose(
            np.asarray(ref[key]), np.asarray(out[key]),
            rtol=2e-5, atol=2e-5, err_msg=key,
        )
    # Kernel-to-kernel handoff: the LSTM kernel's flat [B, 1, L*h]
    # halves feed the executor megakernel verbatim (no XLA relayout
    # copy); full-forward parity against the all-XLA reference.
    monkeypatch.setenv("STAIR_MEGA_EXEC", "interpret")
    out2 = model.forward(params, batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(ref["logits"]), np.asarray(out2["logits"]),
        rtol=2e-5, atol=5e-5, err_msg="flat-halves megakernel logits",
    )


def test_training_gate_is_separate_from_eval_gate(monkeypatch):
    """deterministic=False routes through STAIR_PALLAS_LSTM_TRAIN, not
    STAIR_PALLAS_LSTM: asking for the eval kernel alone keeps training on
    the differentiable scan, and grads flow through the encoders."""
    from stair_tpu.testing import workload

    cfg = workload.workload_config(
        hidden_size=32, video_size=16, max_video_length=8
    )
    model, params = workload.build_model(cfg)
    batch = workload.make_batch(cfg, batch_size=4, seed=9)
    monkeypatch.setenv("STAIR_PALLAS_LSTM", "interpret")
    monkeypatch.setenv("STAIR_PALLAS_LSTM_TRAIN", "0")

    def loss(p):
        out = model.forward(p, batch, rng=jax.random.PRNGKey(0),
                            deterministic=False)
        return jnp.sum(out["logits"] ** 2)

    g = jax.grad(loss)(params)
    leaf = g["video_encoder"]["fwd"]["wi"]
    assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(leaf)).max() > 0


def _train_loss(fn, p, x, mask, **kw):
    """A loss touching tokens AND the sentence feature."""
    tok, sent = fn(p, x, mask, **kw)[:2]
    return jnp.sum(tok ** 2) * 0.5 + jnp.sum(sent ** 2) * 0.25


@pytest.mark.parametrize("B,L,D,h,bb", [
    (5, 9, 12, 8, 4),     # batch padding + ragged masks
    pytest.param(8, 7, 16, 16, 8, marks=pytest.mark.slow),  # single tile
])
def test_pallas_bilstm_train_grad_parity_f32(B, L, D, h, bb):
    """The hand-written backward (bilstm_pallas_train) must match
    autodiff of the scan path: all params + input gradients, f32."""
    p = init_lstm_params(jax.random.PRNGKey(4), D, h)
    x, mask = _data(B, L, D, seed=B + 10)

    def ref_fn(pp, xx):
        tok, sent = jax.vmap(
            lambda a, m: bilstm(pp, a, m)
        )(xx, mask)
        return jnp.sum(tok ** 2) * 0.5 + jnp.sum(sent ** 2) * 0.25

    v_ref, (gp_ref, gx_ref) = jax.value_and_grad(ref_fn, argnums=(0, 1))(
        p, x)

    def ker_fn(pp, xx):
        return _train_loss(bilstm_pallas_train, pp, xx, mask,
                           interpret=True, block_batch=bb)

    v_k, (gp_k, gx_k) = jax.value_and_grad(ker_fn, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(float(v_ref), float(v_k), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_ref), np.asarray(gx_k),
                               rtol=1e-4, atol=1e-5)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(gp_ref),
        jax.tree_util.tree_leaves(gp_k),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_pallas_bilstm_train_grad_parity_bf16():
    """bf16 compute mode: same linearization as the scan (matmuls bf16,
    state f32), so gradients agree to bf16 tolerance."""
    B, L, D, h = 6, 8, 12, 16
    p = init_lstm_params(jax.random.PRNGKey(5), D, h)
    x, mask = _data(B, L, D, seed=17)

    def ref_fn(pp):
        tok, sent = jax.vmap(
            lambda a, m: bilstm(pp, a, m, mm_dtype=jnp.bfloat16)
        )(x, mask)
        return jnp.sum(tok ** 2) * 0.5 + jnp.sum(sent ** 2) * 0.25

    def ker_fn(pp):
        return _train_loss(
            bilstm_pallas_train, pp, x, mask, mm_dtype=jnp.bfloat16,
            interpret=True, block_batch=8, token_dtype=jnp.bfloat16,
        )

    g_ref = jax.grad(ref_fn)(p)
    g_k = jax.grad(ker_fn)(p)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves(g_k),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, rtol=5e-2, atol=2e-2 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_nmn_training_grad_parity_with_pallas_lstm_train(monkeypatch):
    """Full NMN train-mode grads: Pallas-LSTM-train encoders vs the scan
    encoders, executor held on the XLA path."""
    from stair_tpu.testing import workload

    cfg = workload.workload_config(
        hidden_size=64, video_size=24, max_video_length=12
    )
    model, params = workload.build_model(cfg)
    batch = workload.make_batch(cfg, batch_size=6, seed=7)
    monkeypatch.setenv("STAIR_FUSED_EXEC", "0")
    monkeypatch.setenv("STAIR_MEGA_EXEC", "0")
    monkeypatch.setenv("STAIR_MEGA_TRAIN", "0")

    def loss(p):
        out = model.forward(p, batch, rng=jax.random.PRNGKey(0),
                            deterministic=False)
        return (jnp.sum(out["logits"] ** 2) * 1e-2
                + jnp.sum(out["regs_vec"] ** 2) * 1e-3)

    monkeypatch.setenv("STAIR_PALLAS_LSTM_TRAIN", "0")
    g_ref = jax.grad(loss)(params)
    monkeypatch.setenv("STAIR_PALLAS_LSTM_TRAIN", "interpret")
    g_k = jax.grad(loss)(params)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves(g_k),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-5 * scale,
            err_msg=jax.tree_util.keystr(path),
        )

"""Reversible-executor (rev_exec) gradient parity vs the autodiff scan.

The training executor's custom-VJP backward reconstructs each step's
input register files from the SSA write structure instead of storing
scan carries (stair_tpu/models/rev_exec.py). These tests pin it to the
plain autodiff path (STAIR_REV=0): same loss, same parameter gradients,
with and without dropout, in f32 and bf16, including the aux-embedding
(--use-prog-word-embeddings) operand path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stair_tpu.testing import workload
from stair_tpu.train.losses import total_loss


def _small_cfg(dtype, dropout):
    cfg = workload.workload_config(
        hidden_size=64, video_size=32, max_video_length=16
    )
    over = {"compute_dtype": dtype}
    if not dropout:
        over["dropout"] = 0.0
    return type(cfg)(**{**cfg.to_dict(), **over})


def _with_aux(batch, cfg, text_size=50):
    """Attach aux embeddings and point half the PUSH_TEXT steps at them
    (span_start == -2 is the --use-prog-word-embeddings sentinel)."""
    rng = np.random.RandomState(3)
    tr = batch["trace"]
    B, T = tr["opcode"].shape
    La = 3
    batch = dict(batch)
    batch["aux_emb"] = rng.randn(B, T, La, text_size).astype(np.float32)
    batch["aux_mask"] = np.ones((B, T, La), np.float32)
    span_start = np.asarray(tr["span_start"]).copy()
    span_end = np.asarray(tr["span_end"]).copy()
    is_push = np.asarray(tr["opcode"]) == 1  # Opcode.PUSH_TEXT
    pick = is_push & (np.arange(B)[:, None] % 2 == 0)
    span_start[pick] = -2
    span_end[pick] = -2
    batch["trace"] = dict(tr, span_start=span_start, span_end=span_end)
    return batch


def _loss_and_grads(monkeypatch, rev, dtype, dropout, aux=False):
    monkeypatch.setenv("STAIR_REV", rev)
    cfg = _small_cfg(dtype, dropout)
    model, params = workload.build_model(cfg)
    batch = workload.make_batch(cfg, batch_size=16)
    batch = workload.add_fake_supervision(batch, cfg)
    if aux:
        batch = _with_aux(batch, cfg, text_size=cfg.text_size)

    def loss_fn(p):
        return total_loss(
            model, p, batch, jax.random.PRNGKey(7), 1.0, 1.0,
            jnp.float32(1.0), jnp.float32(1.0), deterministic=False,
        )[0]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    return float(loss), jax.device_get(grads)


def _assert_tree_close(g0, g1, rtol, atol):
    leaves0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g1)
    }
    assert leaves0 and len(leaves0) == len(flat1)
    for k, v0 in leaves0:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v0, np.float32), np.asarray(flat1[key], np.float32),
            rtol=rtol, atol=atol, err_msg=key,
        )


# The reversible executor is an OPT-IN escape hatch (STAIR_REV=1;
# measured tie vs the autodiff scan, REPORT r3 #11) — one grad-parity
# combo stays in the quick tier, the sweep rides the slow tier
# (tier budget, VERDICT r4 #8).
@pytest.mark.parametrize("dtype,dropout,aux,rtol,atol", [
    ("float32", True, False, 1e-5, 1e-7),
    pytest.param("float32", False, False, 1e-5, 1e-7,
                 marks=pytest.mark.slow),
    pytest.param("float32", True, True, 1e-5, 1e-7,
                 marks=pytest.mark.slow),
    pytest.param("bfloat16", True, False, 1e-2, 1e-4,
                 marks=pytest.mark.slow),
])
def test_rev_grads_match_autodiff(monkeypatch, dtype, dropout, aux, rtol,
                                  atol):
    l0, g0 = _loss_and_grads(monkeypatch, "0", dtype, dropout, aux)
    l1, g1 = _loss_and_grads(monkeypatch, "auto", dtype, dropout, aux)
    assert l0 == pytest.approx(l1, rel=1e-6)
    _assert_tree_close(g0, g1, rtol, atol)


def test_rev_path_engaged(monkeypatch):
    """Training must actually route through rev_exec (a silent fallback
    to the autodiff scan would pass the parity tests vacuously)."""
    import stair_tpu.models.rev_exec as R

    calls = {"fwd": 0, "bwd": 0}
    orig_fwd, orig_bwd = R._rev_fwd, R._rev_bwd

    def fwd(*a):
        calls["fwd"] += 1
        return orig_fwd(*a)

    def bwd(*a):
        calls["bwd"] += 1
        return orig_bwd(*a)

    monkeypatch.setattr(R, "_rev_fwd", fwd)
    monkeypatch.setattr(R, "_rev_bwd", bwd)
    R.rev_exec.defvjp(fwd, bwd)
    try:
        _loss_and_grads(monkeypatch, "auto", "float32", False)
    finally:
        R.rev_exec.defvjp(orig_fwd, orig_bwd)
    assert calls["fwd"] >= 1 and calls["bwd"] >= 1

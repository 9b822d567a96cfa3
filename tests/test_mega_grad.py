"""Gradient parity: the training megakernel (ops/mega_grad.py) vs the
autodiff XLA scan.

The custom VJP walks the SSA registers in reverse with hand-written
per-opcode backward math; any error shows up as a wrong weight/input
gradient. These tests run both paths on CPU (kernel under the Pallas
interpreter, reference via jax.grad of the ragged_dot scan) in f32 with
dropout off, over the full opcode-covering program set, and require all
parameter gradients to agree. Dropout is validated separately: masks
are deterministic given (seed, example, step, site), and the custom VJP
must match finite differences THROUGH the masks.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tests.test_mega_exec import PROGRAMS, _batch, _build


def _loss_fn(model, batch):
    """A loss touching every cotangent surface: logits + all three
    register files (mirrors how train/losses.py consumes them)."""

    def loss(params, rng):
        out = model.forward(params, batch, rng=rng, deterministic=False)
        return (
            jnp.sum(out["logits"] ** 2) * 1e-2
            + jnp.sum(out["regs_vec"] ** 2) * 1e-3
            + jnp.sum(out["regs_frames"] ** 2) * 1e-4
            + jnp.sum(out["regs_attn"] ** 2) * 1e-3
        )

    return loss


def _grads(model, params, batch, monkeypatch, mode, dropout_rng):
    if mode == "ref":
        monkeypatch.setenv("STAIR_FUSED_EXEC", "0")
        monkeypatch.setenv("STAIR_MEGA_EXEC", "0")
        monkeypatch.setenv("STAIR_MEGA_TRAIN", "0")
    else:
        monkeypatch.setenv("STAIR_FUSED_EXEC", "0")
        monkeypatch.setenv("STAIR_MEGA_EXEC", "0")
        monkeypatch.setenv("STAIR_MEGA_TRAIN", "interpret")
    loss = _loss_fn(model, batch)
    val, grads = jax.value_and_grad(loss)(params, dropout_rng)
    return val, grads


@pytest.mark.parametrize("programs", [PROGRAMS])
def test_mega_train_grad_parity(monkeypatch, programs):
    """All-parameter gradient parity at dropout=0 over every opcode."""
    cfg, model, params = _build()
    assert cfg.dropout == 0.0
    batch, _ = _batch(cfg, programs)
    rng = jax.random.PRNGKey(7)

    v_ref, g_ref = _grads(model, params, batch, monkeypatch, "ref", rng)
    v_k, g_k = _grads(model, params, batch, monkeypatch, "kernel", rng)

    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_k),
                               rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_k = jax.tree_util.tree_leaves(g_k)
    assert len(flat_ref) == len(flat_k)
    for (path, a), b in zip(flat_ref, flat_k):
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-5 * scale,
            err_msg=f"grad mismatch at {name}",
        )


def test_mega_train_grad_parity_softmax_filter(monkeypatch):
    """Softmax-Filter gradient parity (VERDICT r4 #3): the in-kernel
    masked-softmax pooling's hand-written VJP (softmax jacobian + the
    attn_w head) must match autodiff of the XLA softmax branch. Runs the
    Filter-focused program subset (the branch only changes FILTER_V/K
    pooling; the full-opcode sweep is the parity-mode test above)."""
    from tests.test_mega_exec import FILTER_PROGRAMS

    cfg, model, params = _build(filter_attention="softmax")
    batch, _ = _batch(cfg, FILTER_PROGRAMS)
    rng = jax.random.PRNGKey(7)

    v_ref, g_ref = _grads(model, params, batch, monkeypatch, "ref", rng)
    v_k, g_k = _grads(model, params, batch, monkeypatch, "kernel", rng)

    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_k),
                               rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_k = jax.tree_util.tree_leaves(g_k)
    assert len(flat_ref) == len(flat_k)
    for (path, a), b in zip(flat_ref, flat_k):
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-5 * scale,
            err_msg=f"grad mismatch at {name}",
        )


def test_mega_train_forward_matches_xla_at_zero_dropout(monkeypatch):
    """Train-mode kernel forward == XLA train forward when rate=0."""
    cfg, model, params = _build()
    batch, _ = _batch(cfg, PROGRAMS, seed=2)
    rng = jax.random.PRNGKey(3)

    monkeypatch.setenv("STAIR_FUSED_EXEC", "0")
    monkeypatch.setenv("STAIR_MEGA_EXEC", "0")
    monkeypatch.setenv("STAIR_MEGA_TRAIN", "0")
    ref = model.forward(params, batch, rng=rng, deterministic=False)
    monkeypatch.setenv("STAIR_MEGA_TRAIN", "interpret")
    out = model.forward(params, batch, rng=rng, deterministic=False)
    for key in ("regs_vec", "regs_frames", "regs_attn", "logits"):
        np.testing.assert_allclose(
            np.asarray(ref[key]), np.asarray(out[key]),
            rtol=1e-5, atol=2e-5, err_msg=key,
        )


@pytest.mark.slow
def test_mega_train_dropout_masks_deterministic(monkeypatch):
    """Same rng -> identical stochastic forward; different rng differs;
    keep-rate matches the configured dropout."""
    from stair_tpu.models.nmn import NMNConfig, VideoNMN

    cfg, model, params = _build()
    cfg_d = NMNConfig(**{**cfg.to_dict(), "dropout": 0.5})
    model_d = VideoNMN(cfg_d)
    batch, _ = _batch(cfg_d, PROGRAMS[:8], seed=6)
    monkeypatch.setenv("STAIR_MEGA_TRAIN", "interpret")

    def fwd(rng):
        out = model_d.forward(params, batch, rng=rng,
                              deterministic=False)
        return np.asarray(out["regs_vec"])

    a1 = fwd(jax.random.PRNGKey(1))
    a2 = fwd(jax.random.PRNGKey(1))
    b = fwd(jax.random.PRNGKey(2))
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, b)


@pytest.mark.slow
def test_mega_train_grad_through_dropout_finite_difference(monkeypatch):
    """Custom-VJP grads match finite differences THROUGH the dropout
    masks (masks are pure functions of (seed, b, t, site), so the loss
    is differentiable at fixed seed)."""
    from stair_tpu.models.nmn import NMNConfig, VideoNMN

    cfg, _, params = _build()
    cfg_d = NMNConfig(**{**cfg.to_dict(), "dropout": 0.3})
    model = VideoNMN(cfg_d)
    progs = [
        (["Filter", "Temporal", "before", "video", "HasItem", "video",
          "actions"], {}),
        (["Exists", "cup", "Filter", "video", "objects"], {}),
        (["ToAction", "cup", "dish"], {}),
    ]
    batch, _ = _batch(cfg_d, progs, seed=9)
    monkeypatch.setenv("STAIR_MEGA_TRAIN", "interpret")
    rng = jax.random.PRNGKey(11)
    loss = _loss_fn(model, batch)

    g = jax.grad(loss)(params, rng)

    # Spot-check a few weight coordinates against central differences.
    checks = [
        ("modules", "filter", "dense", "w", (3, 5)),
        ("modules", "temporal", "l1_w", (0, 2, 4)),
        ("modules", "exists", "l1", "w", (10, 7)),
        ("modules", "toaction", "l2", "w", (1, 1)),
        ("decoder", "l1", "w", (4, 4)),
    ]
    eps = 1e-3
    for *path, idx in checks:
        def at(p):
            node = p
            for k in path:
                node = node[k]
            return node

        base = at(params)
        gval = float(np.asarray(at(g))[idx])

        def perturbed(delta):
            arr = np.asarray(base).copy()
            arr[idx] += delta
            node = params
            # rebuild pytree with the perturbed leaf
            import copy

            p2 = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
            node = p2
            for k in path[:-1]:
                node = node[k]
            node[path[-1]] = arr
            return jax.tree_util.tree_map(jnp.asarray, p2)

        f_p = float(loss(perturbed(+eps), rng))
        f_m = float(loss(perturbed(-eps), rng))
        fd = (f_p - f_m) / (2 * eps)
        assert abs(fd - gval) <= 2e-2 * max(abs(fd), abs(gval), 1e-3), (
            f"{path}[{idx}]: fd={fd} grad={gval}"
        )

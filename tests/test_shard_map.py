"""shard_map composition: the Pallas megakernels under a dp mesh.

VERDICT r3 weak #1: GSPMD cannot partition a ``pallas_call``, so the
fast kernels used to switch off under any mesh. The dp-only route now
wraps the train/eval step bodies in ``jax.shard_map`` — each shard runs
the megakernel on its local batch (the kernel grid is per-example, so
any local batch size works) and gradients pmean over dp. These tests
run the kernels under the Pallas interpreter on the 8-virtual-CPU-device
mesh and require the sharded step to match the single-device step.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import optax

from stair_tpu.parallel.mesh import make_mesh, shard_batch
from stair_tpu.train.loop import (
    batch_to_device_dict,
    build_model,
    lr_schedule,
    make_batcher,
    make_eval_step,
    make_train_step,
    use_shard_map,
)
from tests.test_training import Args, train_world  # noqa: F401


class NoDropArgs(Args):
    """Dropout off => the only sharded-vs-single differences are fp
    reduction order (pmean of partial sums)."""

    dropout = 0.0


def _setup(ds, monkeypatch, mega: str):
    # Route the executor through the training/eval megakernels under the
    # Pallas interpreter (exactly what runs per-shard on a real dp slice).
    monkeypatch.setenv("STAIR_MEGA_TRAIN", mega)
    monkeypatch.setenv("STAIR_MEGA_EXEC", mega)
    monkeypatch.setenv("STAIR_FUSED_EXEC", "0")
    args = NoDropArgs()
    model, _ = build_model(args, [ds])
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(lr_schedule(args))
    batcher = make_batcher(args, ds, model, seed=0)
    batch = next(batcher.epoch(shuffle=False))
    return args, model, params, optimizer, batch_to_device_dict(batch)


@pytest.mark.slow
def test_shard_map_train_step_matches_single_device(
    train_world, cpu_devices, monkeypatch  # noqa: F811
):
    ds = train_world
    args, model, params, opt, bdict = _setup(ds, monkeypatch, "interpret")
    rng = jax.random.PRNGKey(7)
    gate = jnp.float32(1.0)
    params_copy = jax.tree_util.tree_map(jnp.array, params)

    single = make_train_step(model, opt, args)
    p1, _, m1 = single(params, opt.init(params), bdict, rng, gate, gate)

    mesh = make_mesh(dp=8, tp=1, devices=cpu_devices)
    assert use_shard_map(args, mesh)
    sharded_step = make_train_step(model, opt, args, mesh=mesh)
    params2 = jax.device_put(
        params_copy, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        )
    )
    opt_state2 = opt.init(params2)
    sharded = shard_batch(bdict, mesh)
    p2, _, m2 = sharded_step(params2, opt_state2, sharded, rng, gate, gate)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(m1["loss_sums"]), np.asarray(m2["loss_sums"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(m1["loss_counts"]), np.asarray(m2["loss_counts"])
    )
    l1 = jax.tree_util.tree_leaves(jax.device_get(p1))
    l2 = jax.tree_util.tree_leaves(jax.device_get(p2))
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_shard_map_eval_step_matches_single_device(
    train_world, cpu_devices, monkeypatch  # noqa: F811
):
    ds = train_world
    args, model, params, _, bdict = _setup(ds, monkeypatch, "interpret")

    single = make_eval_step(model)
    r1 = jax.device_get(single(params, bdict))

    mesh = make_mesh(dp=8, tp=1, devices=cpu_devices)
    sharded_step = make_eval_step(model, mesh=mesh, args=args)
    params2 = jax.device_put(
        params, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        )
    )
    r2 = jax.device_get(sharded_step(params2, shard_batch(bdict, mesh)))

    np.testing.assert_array_equal(r1["preds"], r2["preds"])
    np.testing.assert_allclose(r1["loss_sums"], r2["loss_sums"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(r1["loss_counts"], r2["loss_counts"])
    np.testing.assert_allclose(r1["cos_sum"], r2["cos_sum"], rtol=1e-4)


@pytest.mark.slow
def test_shard_map_train_step_dp_tp_mesh(
    train_world, cpu_devices, monkeypatch  # noqa: F811
):
    """dp x tp mesh: the tp axis REPLICATES the NMN step under shard_map
    (nothing in the model is worth tensor-sharding), so the result must
    equal the single-device step and the kernels stay on (r4 weak #5)."""
    ds = train_world
    args, model, params, opt, bdict = _setup(ds, monkeypatch, "interpret")
    rng = jax.random.PRNGKey(7)
    gate = jnp.float32(1.0)
    params_copy = jax.tree_util.tree_map(jnp.array, params)

    single = make_train_step(model, opt, args)
    p1, _, m1 = single(params, opt.init(params), bdict, rng, gate, gate)

    mesh = make_mesh(dp=4, tp=2, devices=cpu_devices)
    assert use_shard_map(args, mesh)
    sharded_step = make_train_step(model, opt, args, mesh=mesh)
    params2 = jax.device_put(
        params_copy, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        )
    )
    sharded = shard_batch(bdict, mesh)
    p2, _, m2 = sharded_step(params2, opt.init(params2), sharded, rng,
                             gate, gate)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(jax.device_get(p1))
    l2 = jax.tree_util.tree_leaves(jax.device_get(p2))
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_shard_map_window_equals_shard_batch(
    train_world, cpu_devices, monkeypatch  # noqa: F811
):
    """W == per-shard batch: the sharded step must still apply window
    masking (compared against the GLOBAL batch), not fall back to full
    in-batch negatives over the replicated class table (ADVICE r4)."""
    ds = train_world

    class WindowArgs(NoDropArgs):
        contrastive_window = Args.batch_size // 8  # == per-shard batch

    monkeypatch.setenv("STAIR_MEGA_TRAIN", "interpret")
    monkeypatch.setenv("STAIR_MEGA_EXEC", "interpret")
    monkeypatch.setenv("STAIR_FUSED_EXEC", "0")
    args = WindowArgs()
    model, _ = build_model(args, [ds])
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(lr_schedule(args))
    batcher = make_batcher(args, ds, model, seed=0)
    bdict = batch_to_device_dict(next(batcher.epoch(shuffle=False)))
    rng = jax.random.PRNGKey(7)
    gate = jnp.float32(1.0)

    single = make_train_step(model, opt, args)
    _, _, m1 = single(params, opt.init(params), bdict, rng, gate, gate)

    mesh = make_mesh(dp=8, tp=1, devices=cpu_devices)
    assert use_shard_map(args, mesh)
    sharded_step = make_train_step(model, opt, args, mesh=mesh)
    params2 = jax.device_put(
        params, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        )
    )
    sharded = shard_batch(bdict, mesh)
    _, _, m2 = sharded_step(params2, opt.init(params2), sharded, rng,
                            gate, gate)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(m1["loss_sums"]), np.asarray(m2["loss_sums"]),
        rtol=1e-4, atol=1e-5,
    )


def test_use_shard_map_guard(cpu_devices):
    mesh_dp = make_mesh(dp=8, tp=1, devices=cpu_devices)
    mesh_tp = make_mesh(dp=4, tp=2, devices=cpu_devices)

    class A(Args):
        pass

    assert use_shard_map(A(), mesh_dp)
    # tp axes compose by replication (r4 weak #5): kernels stay on.
    assert use_shard_map(A(), mesh_tp)
    assert not use_shard_map(A(), None)

    # STAIR_SHARD_MAP=0 forces the GSPMD route for A/Bs.
    import os

    os.environ["STAIR_SHARD_MAP"] = "0"
    try:
        assert not use_shard_map(A(), mesh_dp)
    finally:
        del os.environ["STAIR_SHARD_MAP"]

    class BadBatch(Args):
        batch_size = 12                        # 12 % 8 != 0

    assert not use_shard_map(BadBatch(), mesh_dp)

    class BadWindow(Args):
        batch_size = 64
        contrastive_window = 3                 # 3 does not divide 64/8

    assert not use_shard_map(BadWindow(), mesh_dp)

    class GoodWindow(Args):
        batch_size = 64
        contrastive_window = 4

    assert use_shard_map(GoodWindow(), mesh_dp)

"""Training-loop tests: losses decrease; mesh-sharded steps match."""

import json
import os
import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import optax

from stair_tpu.data.dataset import AGQADataset, DataPaths
from stair_tpu.models.nmn import VideoNMN
from stair_tpu.parallel.mesh import make_mesh, param_sharding, shard_batch
from stair_tpu.programs import preprocess
from stair_tpu.programs.scene_graph import SceneGraphExecutor
from stair_tpu.train import checkpoint as ckpt
from stair_tpu.train.loop import (
    batch_to_device_dict,
    build_model,
    lr_schedule,
    make_batcher,
    make_train_step,
)


class Args:
    """Minimal argument namespace for loop helpers."""

    hidden_size = 32
    max_video_length = 24
    dropout = 0.1
    module_loss_weight = 1.0
    decoder_loss_weight = 1.0
    filter_attention = "parity"
    batch_size = 16
    max_question_len = 24
    lr = 2e-3
    weight_decay = 0.0
    scheduler_start_factor = 1.0
    scheduler_end_factor = 0.1
    scheduler_total_iters = 100
    modules_no_intermediate_train = ["FilterFrame"]
    encoder = "lstm"


@pytest.fixture(scope="module")
def train_world(tmp_path_factory):
    from stair_tpu.testing.synthetic import make_world

    out = str(tmp_path_factory.mktemp("train_world"))
    w = make_world(out, num_videos=10, questions_per_video=6,
                   num_frames=24, seed=3)
    with open(w["questions"]) as f:
        qs = json.load(f)
    preprocess.set_executor(
        SceneGraphExecutor(w["scene_graphs"], w["id2word"], w["word2id"])
    )
    recs = preprocess.convert_split([dict(r, qa_id=k) for k, r in qs.items()])
    pkl = os.path.join(out, "train.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(recs, f)
    paths = DataPaths(
        rgb_path=w["features"], glove_filename=w["glove"],
        vocab_filename=os.path.join(out, "vocab.json"),
        video_secs_path=w["video_secs"], train_filename=pkl,
        word2id_filename=w["word2id"],
    )
    ds = AGQADataset(paths, "train", max_video_length=24)
    return ds


def _setup(ds, args=None):
    args = args or Args()
    model, _ = build_model(args, [ds])
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(lr_schedule(args))
    opt_state = optimizer.init(params)
    batcher = make_batcher(args, ds, model, seed=0)
    step_fn = make_train_step(model, optimizer, args)
    return args, model, params, optimizer, opt_state, batcher, step_fn


@pytest.mark.slow
def test_loss_decreases(train_world):
    """Deterministic loss on one fixed probe batch must drop decisively
    after training. (Comparing a running per-batch loss is inherently flaky:
    the contrastive terms make each batch's loss depend on its composition,
    so first-vs-last batch ratios sit within run-to-run CPU-threading noise.)
    """
    from stair_tpu.train.losses import total_loss

    ds = train_world
    args, model, params, opt, opt_state, batcher, step_fn = _setup(ds)
    probe = batch_to_device_dict(next(batcher.epoch(shuffle=False)))

    @jax.jit
    def probe_loss(p):
        loss, aux = total_loss(
            model, p, probe, jax.random.PRNGKey(0), 1.0, 1.0,
            jnp.float32(1.0), jnp.float32(1.0), deterministic=True,
        )
        return loss, aux["scalars"]["decoder_loss"]

    # Before any step (step_fn donates params).
    before, before_dec = map(float, probe_loss(params))
    rng = jax.random.PRNGKey(1)
    losses = []
    gate = jnp.float32(1.0)
    for epoch in range(10):
        for batch in batcher.epoch(shuffle=True):
            rng, srng = jax.random.split(rng)
            params, opt_state, metrics = step_fn(
                params, opt_state, batch_to_device_dict(batch), srng,
                gate, gate,
            )
            losses.append(float(metrics["loss"]))
    after, after_dec = map(float, probe_loss(params))
    assert np.isfinite(losses).all()
    # The module (supervision) channels carry a large irreducible entropy
    # floor, so assert a decisive drop on the decoder CE (which memorizes
    # the 60-example corpus) and any drop on the total.
    assert after_dec < before_dec * 0.5, \
        f"decoder loss did not memorize: {before_dec} -> {after_dec}"
    assert after < before, f"total loss did not decrease: {before} -> {after}"


@pytest.mark.slow
def test_gradients_flow_everywhere(train_world):
    """Every parameter the batch's programs exercise receives gradient."""
    from stair_tpu.train.losses import total_loss

    ds = train_world
    args, model, params, _, _, batcher, _ = _setup(ds)
    batch = next(batcher.epoch(shuffle=False))
    bdict = batch_to_device_dict(batch)

    def loss_fn(p):
        return total_loss(
            model, p, bdict, jax.random.PRNGKey(0), 1.0, 1.0, 1.0, 1.0,
            deterministic=True,
        )[0]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = {
        jax.tree_util.keystr(path): bool(np.any(np.asarray(g) != 0))
        for path, g in flat
    }
    # Core paths that must always be live
    for needle in ("video_encoder", "text_encoder", "decoder", "localize",
                   "temporal", "filter'"):
        assert any(
            nonzero[k] for k in nonzero if needle in k
        ), f"no gradient reached {needle}"


@pytest.mark.slow
def test_mesh_sharded_step_matches_single_device(train_world, cpu_devices):
    ds = train_world
    args, model, params, opt, opt_state, batcher, step_fn = _setup(ds)
    batch = next(batcher.epoch(shuffle=False))
    bdict = batch_to_device_dict(batch)
    rng = jax.random.PRNGKey(7)
    gate = jnp.float32(1.0)

    # step_fn donates params/opt_state buffers; keep a copy for the 2nd run.
    params_copy = jax.tree_util.tree_map(jnp.array, params)
    p1, _, m1 = step_fn(params, opt_state, bdict, rng, gate, gate)

    mesh = make_mesh(dp=4, tp=2, devices=cpu_devices)
    params2 = jax.device_put(params_copy, param_sharding(params_copy, mesh))
    opt_state2 = opt.init(params2)
    sharded = shard_batch(bdict, mesh)
    p2, _, m2 = step_fn(params2, opt_state2, sharded, rng, gate, gate)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )
    l1 = jax.tree_util.tree_leaves(jax.device_get(p1))
    l2 = jax.tree_util.tree_leaves(jax.device_get(p2))
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_checkpoint_roundtrip(train_world, tmp_path):
    ds = train_world
    args, model, params, _, _, _, _ = _setup(ds)
    ckpt.save_checkpoint(
        str(tmp_path / "best_model"), params, model.config.to_dict(),
        trainer_state={"step": 5, "best_acc": 0.5},
    )
    template = model.init(jax.random.PRNGKey(9))
    loaded = ckpt.load_params(str(tmp_path / "best_model"), template)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cfg = ckpt.load_config(str(tmp_path / "best_model"))
    assert cfg["hidden_size"] == 32


def test_device_tables_bit_parity(train_world):
    """Device-resident tables (video features + embeddings gathered inside
    the jitted step from int32 indices) must reproduce the host-packed
    batch exactly: same logits, same masks."""
    from stair_tpu.train.loop import (
        make_device_tables,
        make_eval_step,
        materialize_batch,
    )

    ds = train_world
    args = Args()
    model, _ = build_model(args, [ds])
    params = model.init(jax.random.PRNGKey(0))

    host_b = make_batcher(args, ds, model, seed=0)
    dev_b = make_batcher(args, ds, model, seed=0, device_tables=True)
    tables = make_device_tables(ds)
    assert tables is not None

    host_batch = batch_to_device_dict(next(host_b.epoch(shuffle=False)))
    dev_batch = batch_to_device_dict(next(dev_b.epoch(shuffle=False)))
    assert "question_ids" in dev_batch and "video_idx" in dev_batch

    mat = jax.jit(lambda b: materialize_batch(b, tables))(dev_batch)
    np.testing.assert_array_equal(
        np.asarray(mat["video"]), host_batch["video"]
    )
    np.testing.assert_array_equal(
        np.asarray(mat["video_mask"]), host_batch["video_mask"]
    )
    np.testing.assert_array_equal(
        np.asarray(mat["question"]), host_batch["question"]
    )
    np.testing.assert_array_equal(
        np.asarray(mat["question_mask"]), host_batch["question_mask"]
    )
    np.testing.assert_array_equal(
        np.asarray(mat["sup_attn"]), host_batch["sup_attn"]
    )
    np.testing.assert_array_equal(
        np.asarray(mat["class_emb"]), host_batch["class_emb"]
    )
    np.testing.assert_array_equal(
        np.asarray(mat["class_emb_mask"]), host_batch["class_emb_mask"]
    )

    host_step = make_eval_step(model)
    dev_step = make_eval_step(model, tables)
    host_out = jax.device_get(host_step(params, host_batch))
    dev_out = jax.device_get(dev_step(params, dev_batch))
    np.testing.assert_array_equal(host_out["preds"], dev_out["preds"])
    np.testing.assert_allclose(
        host_out["loss_sums"], dev_out["loss_sums"], rtol=1e-6
    )


def test_contrastive_window_negatives(train_world):
    """--contrastive-window parity mode (reference accumulation-window
    negatives, ref train_module.py:360-406): each example's contrastive CE
    scores only classes occurring in its own W-example group, so the total
    loss over a batch equals the sum of per-group in-batch losses computed
    with each group's own class restriction. window >= B must reproduce
    the in-batch loss exactly."""
    from stair_tpu.train.losses import supervision_losses

    ds = train_world
    args, model, params, _, _, batcher, _ = _setup(ds)
    batch = next(batcher.epoch(shuffle=False))
    bdict = batch_to_device_dict(batch)
    B = bdict["trace"]["opcode"].shape[0]
    out = model.forward(params, bdict, deterministic=True)

    s_inbatch, _ = supervision_losses(model, params, out, bdict)
    s_full_window, _ = supervision_losses(
        model, params, out, bdict, contrastive_window=B
    )
    np.testing.assert_allclose(
        float(s_inbatch["module_loss"]), float(s_full_window["module_loss"]),
        rtol=1e-6,
    )

    W = max(1, B // 2)
    s_win, _ = supervision_losses(
        model, params, out, bdict, contrastive_window=W
    )
    # Windowed loss uses fewer (or equal) negatives -> logsumexp can only
    # shrink -> contrastive CE (and hence module_loss) cannot increase.
    assert (float(s_win["module_loss"])
            <= float(s_inbatch["module_loss"]) + 1e-6)
    # And it must differ unless every class in the batch occurs in every
    # group (vanishingly unlikely in the synthetic world).
    assert (float(s_win["module_loss"])
            != float(s_inbatch["module_loss"]))


@pytest.mark.parametrize("device_tables", [False, True])
def test_vectorized_supervision_pack_bit_parity(train_world, device_tables):
    """The cached/vectorized supervision packer must reproduce the original
    per-instruction loop packer bit-for-bit on every supervision field
    (channels, bools, rasterized/encoded golds, class tables + interning
    order, FilterFrame slots)."""
    from stair_tpu.data.dataset import Batcher, device_table_support

    ds = train_world
    if device_tables and device_table_support(ds) is None:
        pytest.skip("no device-table support")
    T, NV, NF, NA = ds.trace_geometry()
    kw = dict(batch_size=8, max_steps=T, num_vec=NV, num_frames=NF,
              num_attn=NA, max_classes=3, device_tables=device_tables)

    class SlowBatcher(Batcher):
        def _pack_supervision(self, batch, recs, traces, indices=None):
            return self._pack_supervision_slow(batch, recs, traces)

    fast = next(Batcher(ds, **kw).epoch(shuffle=False))
    slow = next(SlowBatcher(ds, **kw).epoch(shuffle=False))

    for field in ("sup_channel", "sup_bool", "sup_attn", "sup_attn_enc",
                  "sup_attn_w", "sup_attn_rows", "sup_class", "class_emb",
                  "class_emb_mask", "class_token_ids", "class_valid",
                  "ff_index", "ff_gold", "ff_valid"):
        a, b = getattr(fast, field), getattr(slow, field)
        assert (a is None) == (b is None), field
        if a is not None:
            np.testing.assert_array_equal(a, b, err_msg=field)

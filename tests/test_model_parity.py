"""End-to-end numerical parity: batched JAX executor vs reference PyTorch.

The strongest correctness check in the suite: identical weights are loaded
into both implementations and full-question logits are compared over a
synthetic corpus covering every module family. Any numerical divergence in
any module on any program fails here.
"""

import json
import os
import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from stair_tpu.data.dataset import AGQADataset, Batcher, DataPaths
from stair_tpu.models.nmn import NMNConfig, VideoNMN
from stair_tpu.programs import preprocess
from stair_tpu.programs.scene_graph import SceneGraphExecutor

F_MAX = 24
HIDDEN = 64


@pytest.fixture(scope="module")
def world_and_data(tmp_path_factory):
    from stair_tpu.testing.synthetic import make_world

    out = tmp_path_factory.mktemp("parity_world")
    w = make_world(str(out), num_videos=8, questions_per_video=8,
                   num_frames=F_MAX, seed=11)
    with open(w["questions"]) as f:
        qs = json.load(f)
    preprocess.set_executor(
        SceneGraphExecutor(w["scene_graphs"], w["id2word"], w["word2id"])
    )
    recs = preprocess.convert_split(
        [dict(r, qa_id=k) for k, r in qs.items()]
    )
    pkl = os.path.join(str(out), "train.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(recs, f)
    paths = DataPaths(
        rgb_path=w["features"],
        glove_filename=w["glove"],
        vocab_filename=os.path.join(str(out), "vocab.json"),
        video_secs_path=w["video_secs"],
        train_filename=pkl,
        word2id_filename=w["word2id"],
    )
    ds = AGQADataset(paths, "train", max_video_length=F_MAX)
    return w, ds


@pytest.fixture(scope="module")
def model_and_params(world_and_data):
    _, ds = world_and_data
    T, NV, NF, NA = ds.trace_geometry()
    cfg = NMNConfig(
        hidden_size=HIDDEN,
        video_size=ds.video_size,
        text_size=ds.embeddings.dim,
        answer_vocab_length=ds.answer_vocab_length,
        max_video_length=F_MAX,
        object_types=max(1, len(ds.id2index)),
        have_pretrain_head=True,
        max_steps=T, num_vec=NV, num_frames=NF, num_attn=NA,
    )
    model = VideoNMN(cfg)
    params = model.init(jax.random.PRNGKey(42))
    return model, params


def torch_config(cfg: NMNConfig) -> dict:
    return {
        "hidden_size": cfg.hidden_size,
        "video_size": cfg.video_size,
        "text_size": cfg.text_size,
        "dropout": cfg.dropout,
        "answer_vocab_length": cfg.answer_vocab_length,
        "max_video_length": cfg.max_video_length,
        "init_method": "default",
        "layer_norm": 1,
        "have_pretrain_head": cfg.have_pretrain_head,
        "object_types": cfg.object_types,
    }


def test_logits_parity(reference_modules, world_and_data, model_and_params):
    import torch

    from tests.torch_ref import build_reference_model

    _, ds = world_and_data
    model, params = model_and_params
    cfg = model.config
    ref_model = build_reference_model(params, torch_config(cfg))

    T, NV, NF, NA = ds.trace_geometry()
    batcher = Batcher(ds, batch_size=len(ds), max_steps=T, num_vec=NV,
                      num_frames=NF, num_attn=NA)
    batch = batcher.pack(batcher.indices)
    bdict = {
        "question": batch.question, "question_mask": batch.question_mask,
        "video": batch.video, "video_mask": batch.video_mask,
        "trace": batch.trace, "root_reg": batch.root_reg,
        "root_is_vec": batch.root_is_vec,
    }
    mine = model.forward(params, bdict)
    my_logits = np.asarray(mine["logits"])

    compared = 0
    families_seen = set()
    for b, idx in enumerate(batcher.indices):
        rec = ds.records[idx]
        data = {
            "question": torch.tensor(ds.question_embedding(rec)),
            "video_features": torch.tensor(ds.video_feature(rec)),
            "prog_str_to_question_tokens": rec["nmn_program_span_by_word"],
            "nmn_program_list": rec["nmn_program"],
            "nmn_program_idx": rec["nmn_program_idx"],
        }
        with torch.no_grad():
            ref_out = ref_model(data, return_res_by_step=False, test_mode=True)
        ref_logits = ref_out["logits"].numpy()
        np.testing.assert_allclose(
            my_logits[b], ref_logits, rtol=2e-4, atol=2e-4,
            err_msg=f"logit mismatch for {rec['qa_id']}: {rec['nmn_program']}",
        )
        families_seen.update(rec["nmn_program"])
        compared += 1

    assert compared >= 30
    # The corpus must exercise the main module families.
    for fam in ("Exists", "Filter", "Temporal", "Localize", "Choose",
                "Superlative", "FilterFrame", "ExistsFrame", "Relate",
                "AttnVideo", "Compare"):
        assert fam in families_seen, f"corpus never exercised {fam}"


def test_audit_intermediates_parity(
    reference_modules, world_and_data, model_and_params
):
    """Per-step auditable outputs: attention registers match the reference's
    result_of_each_step for Localize/ExistsFrame/Temporal steps."""
    import torch

    from stair_tpu.ir.lowering import Opcode
    from tests.torch_ref import build_reference_model

    _, ds = world_and_data
    model, params = model_and_params
    cfg = model.config
    ref_model = build_reference_model(params, torch_config(cfg))

    T, NV, NF, NA = ds.trace_geometry()
    batcher = Batcher(ds, batch_size=8, max_steps=T, num_vec=NV,
                      num_frames=NF, num_attn=NA)
    idxs = batcher.indices[:8]
    batch = batcher.pack(idxs)
    bdict = {
        "question": batch.question, "question_mask": batch.question_mask,
        "video": batch.video, "video_mask": batch.video_mask,
        "trace": batch.trace, "root_reg": batch.root_reg,
        "root_is_vec": batch.root_is_vec,
    }
    mine = model.forward(params, bdict)
    regs_attn = np.asarray(mine["regs_attn"])

    checked = 0
    for b, idx in enumerate(idxs):
        rec = ds.records[idx]
        tr = ds.traces[idx]
        data = {
            "question": torch.tensor(ds.question_embedding(rec)),
            "video_features": torch.tensor(ds.video_feature(rec)),
            "prog_str_to_question_tokens": rec["nmn_program_span_by_word"],
            "nmn_program_list": rec["nmn_program"],
            "nmn_program_idx": rec["nmn_program_idx"],
        }
        with torch.no_grad():
            ref_out = ref_model(
                data, return_res_by_step=False,
                return_result_of_each_step=True, test_mode=True,
            )
        # result_of_each_step is in token order; map token_pos -> output.
        step_outputs = {
            pos: out for pos, (_, out) in enumerate(ref_out["result_of_each_step"])
        }
        for ins in tr.instrs:
            if ins.opcode == Opcode.EXISTSFRAME:
                ref_attn = step_outputs[ins.token_pos].numpy()
                np.testing.assert_allclose(
                    regs_attn[b, ins.out_attn], ref_attn, rtol=2e-4, atol=2e-4
                )
                checked += 1
            elif ins.opcode == Opcode.LOCALIZE:
                ref_attn = np.atleast_2d(step_outputs[ins.token_pos].numpy())
                np.testing.assert_allclose(
                    regs_attn[b, ins.out_attn], ref_attn[0],
                    rtol=2e-4, atol=2e-4,
                )
                if ins.count == 2:
                    np.testing.assert_allclose(
                        regs_attn[b, ins.out_attn_b], ref_attn[1],
                        rtol=2e-4, atol=2e-4,
                    )
                checked += 1
    assert checked >= 3


def test_batched_forward_matches_per_example():
    """The batch-level structural optimizations (expert-grouped ragged
    stages, superlative-F capacity slice + overflow cond, permutation
    sorts) must be invisible: a B=32 forward equals 32 B=1 forwards."""
    from stair_tpu.testing import workload

    cfg = workload.workload_config(
        hidden_size=64, video_size=32, max_video_length=40,
    )
    model, params = workload.build_model(cfg)
    B = 32
    batch = workload.make_batch(cfg, batch_size=B, seed=3)
    out = model.forward(params, batch, deterministic=True)
    logits = np.asarray(out["logits"])

    for b in range(0, B, 5):
        one = {
            k: ({kk: vv[b:b + 1] for kk, vv in v.items()}
                if isinstance(v, dict) else v[b:b + 1])
            for k, v in batch.items()
        }
        lone = np.asarray(
            model.forward(params, one, deterministic=True)["logits"]
        )[0]
        np.testing.assert_allclose(logits[b], lone, rtol=2e-5, atol=2e-5)

"""Video-ChatGPT path tests: CLIP parity, pooling, splice, SFT, generation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from stair_tpu.llm.clip import (
    ClipVisionConfig,
    ClipVisionTower,
    import_clip_vision,
    preprocess_frames,
)
from stair_tpu.llm.decoder import DecoderConfig
from stair_tpu.llm.videochat import (
    VideoChatConfig,
    VideoChatModel,
    build_video_prompt,
    spatio_temporal_pool,
)


def test_clip_parity_with_hf():
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = ClipVisionConfig(
        image_size=28, patch_size=14, d_model=64, num_heads=4,
        num_layers=3, d_ff=128,
    )
    tower = ClipVisionTower(cfg)
    params = import_clip_vision(hf.state_dict())

    rng = np.random.RandomState(0)
    images = rng.randn(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            torch.tensor(images.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
    # Penultimate layer, CLS dropped — the features the reference feeds the
    # projector (inference.py:87-89).
    ref_feats = ref.hidden_states[-2][:, 1:].numpy()
    mine = np.asarray(tower.patch_features(params, jnp.asarray(images)))
    np.testing.assert_allclose(mine, ref_feats, rtol=3e-4, atol=3e-4)


def test_spatio_temporal_pool():
    t, s, c = 7, 4, 8
    feats = jnp.asarray(np.random.RandomState(0).randn(t, s, c))
    pooled = np.asarray(spatio_temporal_pool(feats, max_temporal=10))
    assert pooled.shape == (10 + s, c)
    np.testing.assert_allclose(
        pooled[:t], np.asarray(feats).mean(axis=1), rtol=1e-6
    )
    assert np.all(pooled[t:10] == 0)  # zero-padded temporal slots
    np.testing.assert_allclose(
        pooled[10:], np.asarray(feats).mean(axis=0), rtol=1e-6
    )


def _tiny_model():
    dec = DecoderConfig.llama(
        vocab_size=64, d_model=32, num_heads=2, num_layers=2, d_ff=64,
        max_len=128,
    )
    vis = ClipVisionConfig(
        image_size=28, patch_size=14, d_model=16, num_heads=2,
        num_layers=2, d_ff=32,
    )
    cfg = VideoChatConfig(decoder=dec, vision=vis, max_temporal=6)
    model = VideoChatModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def test_splice_and_forward():
    cfg, model, params = _tiny_model()
    V = cfg.video_token_len             # 6 + 4 patches
    B, L = 2, 32
    rng = np.random.RandomState(0)
    token_ids = rng.randint(0, 64, (B, L)).astype(np.int32)
    video_tokens = rng.randn(B, V, cfg.vision.d_model).astype(np.float32)
    splice_start = np.array([3, 5], np.int32)
    valid_len = np.array([L, L - 4], np.int32)
    logits = model.forward(
        params, jnp.asarray(token_ids), jnp.asarray(video_tokens),
        jnp.asarray(splice_start), jnp.asarray(valid_len),
    )
    assert logits.shape == (B, L, 64)
    # Splice actually replaces embeddings: forward must differ from no-video.
    logits2 = model.forward(
        params, jnp.asarray(token_ids),
        jnp.asarray(np.zeros_like(video_tokens)),
        jnp.asarray(splice_start), jnp.asarray(valid_len),
    )
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


@pytest.mark.slow
def test_sft_learns_and_generates():
    import optax

    cfg, model, params = _tiny_model()
    V = cfg.video_token_len
    B, L = 4, 32
    rng = np.random.RandomState(0)
    video_tokens = rng.randn(B, V, cfg.vision.d_model).astype(np.float32)
    token_ids = rng.randint(4, 64, (B, L)).astype(np.int32)
    labels = np.full((B, L), -1, np.int32)
    labels[:, 20:24] = np.array([7, 8, 9, 2])   # fixed assistant reply
    token_ids[:, 20:24] = np.array([7, 8, 9, 2])
    batch = {
        "token_ids": jnp.asarray(token_ids),
        "labels": jnp.asarray(labels),
        "video_tokens": jnp.asarray(video_tokens),
        "splice_start": jnp.asarray(np.array([2] * B, np.int32)),
        "valid_len": jnp.asarray(np.array([L] * B, np.int32)),
    }
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: model.sft_loss(p, batch)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5

    toks = model.generate(
        params, batch["token_ids"], batch["video_tokens"],
        batch["splice_start"], prompt_len=jnp.asarray([20] * B),
        max_new_tokens=4, temperature=0.0,
    )
    # Greedy continuation should reproduce the memorized reply suffix.
    assert np.asarray(toks).shape == (B, 4)


def test_prompt_builder_and_frames():
    from stair_tpu.llm.frames import uniform_frame_indices

    prompt = build_video_prompt("what happens ?", 5)
    assert prompt.count("<vid_patch>") == 5
    assert "<vid_start>" in prompt and "<vid_end>" in prompt
    idx = uniform_frame_indices(200, 10)
    assert len(idx) == 10 and idx[0] == 0 and idx[-1] <= 199
    frames = (np.random.RandomState(0).rand(3, 50, 60, 3) * 255).astype(
        np.uint8
    )
    out = preprocess_frames(frames, size=28)
    assert out.shape == (3, 28, 28, 3)
    assert np.isfinite(out).all()


def test_real_video_file_inference_roundtrip(tmp_path):
    """End-to-end on real video BYTES from disk (ref
    video_chatgpt/eval/model_utils.py:35-102 semantics): write a small
    animated file, decode through frames.load_video_frames, CLIP-encode,
    splice, and generate an answer string with the tiny air-gapped model."""
    import imageio.v3 as iio

    from stair_tpu.llm import frames as fr
    from stair_tpu.llm.videochat_infer import (
        initialize_model,
        video_chatgpt_infer_batch,
    )

    rng = np.random.RandomState(0)
    clip = (rng.rand(16, 48, 64, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "clip.gif")
    iio.imwrite(path, clip, loop=0)

    decoded = fr.load_video_frames(path, num_frames=8)
    assert decoded.shape[0] == 8 and decoded.shape[-1] == 3
    assert decoded.dtype == np.uint8

    class A:
        model_path = None
        model_ckpt = None

    model, params, tokenizer = initialize_model(A())
    outs = video_chatgpt_infer_batch(
        model, params, tokenizer,
        questions=["what did they do ?"],
        frame_sets=[decoded],
        max_new_tokens=8,
    )
    assert len(outs) == 1 and isinstance(outs[0], str)


def test_weight_delta_roundtrip_through_files(tmp_path):
    """make_delta -> apply_delta through on-disk artifacts reproduces the
    finetuned tree exactly (ref video_chatgpt/model/make_delta.py /
    consolidate.py)."""
    from flax import serialization

    from stair_tpu.llm.weight_delta import main as delta_main

    rng = np.random.RandomState(1)
    base = {"a": {"w": rng.randn(4, 4).astype(np.float32)},
            "b": rng.randn(3).astype(np.float32)}
    tuned = {"a": {"w": base["a"]["w"] + 1.5},
             "b": base["b"] * 2.0}
    paths = {k: str(tmp_path / f"{k}.msgpack") for k in
             ("base", "tuned", "delta", "out")}
    with open(paths["base"], "wb") as f:
        f.write(serialization.to_bytes(base))
    with open(paths["tuned"], "wb") as f:
        f.write(serialization.to_bytes(tuned))
    delta_main(["--func", "make", "--base", paths["base"],
                "--target", paths["tuned"], "--output", paths["delta"]])
    delta_main(["--func", "apply", "--base", paths["base"],
                "--target", paths["delta"], "--output", paths["out"]])
    with open(paths["out"], "rb") as f:
        restored = serialization.from_bytes(base, f.read())
    np.testing.assert_array_equal(restored["a"]["w"], tuned["a"]["w"])
    np.testing.assert_array_equal(restored["b"], tuned["b"])


def test_consistency_benchmark_flow(tmp_path):
    """Two-questions-per-sample consistency CLI (ref
    run_inference_benchmark_consistency.py:50-88): both questions run
    against the SAME cached video features; output records carry the
    sample fields plus pred1/pred2."""
    import json

    import imageio.v3 as iio

    from stair_tpu.llm.videochat_infer import main as infer_main

    rng = np.random.RandomState(1)
    vdir = tmp_path / "videos"
    vdir.mkdir()
    clip = (rng.rand(8, 48, 64, 3) * 255).astype(np.uint8)
    iio.imwrite(str(vdir / "v0.gif"), clip, loop=0)

    gt = [
        {
            "video_name": "v0.gif",
            "Q1": "what did they do ?",
            "Q2": "what video question ?",
            "A": "answer",
        },
        {"video_name": "missing.gif", "Q1": "a", "Q2": "b", "A": "c"},
    ]
    gt_file = tmp_path / "gt.json"
    gt_file.write_text(json.dumps(gt))

    out_dir = tmp_path / "out"
    infer_main([
        "--video-dir", str(vdir), "--gt-file", str(gt_file),
        "--output-dir", str(out_dir), "--output-name", "consistency",
        "--num-frames", "4", "--batch-size", "2", "--consistency",
    ])
    with open(out_dir / "consistency.json") as f:
        results = json.load(f)
    # The missing video is skipped, like the reference's existence check.
    assert len(results) == 1
    rec = results[0]
    assert rec["video_name"] == "v0.gif" and rec["A"] == "answer"
    assert isinstance(rec["pred1"], str) and isinstance(rec["pred2"], str)

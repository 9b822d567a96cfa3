"""LLM decoder parity vs transformers' torch GPT-2 and Llama + kernel tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from stair_tpu.llm.decoder import Decoder
from stair_tpu.llm.import_weights import (
    gpt2_config_from_hf,
    import_gpt2,
    import_llama,
    llama_config_from_hf,
)
from stair_tpu.ops.attention import (
    _flash_forward,
    reference_attention,
)


def test_gpt2_logits_parity():
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(
        vocab_size=101, n_positions=64, n_embd=48, n_layer=2, n_head=4,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    cfg = gpt2_config_from_hf(hf_cfg)
    params = import_gpt2(hf.state_dict())
    model = Decoder(cfg)

    ids = np.array([[3, 14, 15, 92, 65, 35], [8, 9, 7, 9, 3, 2]], np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    mine = np.asarray(model.forward_tokens(params, jnp.asarray(ids)))
    np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-4)


def test_llama_logits_parity_with_gqa():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        attention_dropout=0.0,
    )
    torch.manual_seed(1)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_config_from_hf(hf_cfg)
    params = import_llama(hf.state_dict())
    model = Decoder(cfg)

    ids = np.array([[5, 44, 2, 17, 80, 21, 9, 30]], np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    mine = np.asarray(model.forward_tokens(params, jnp.asarray(ids)))
    np.testing.assert_allclose(mine, ref, rtol=3e-4, atol=3e-4)


def test_prefix_mask_matches_dense_mask():
    """The prefix-LM scalars produce the VideoGPT2 dual-mask semantics."""
    rng = np.random.RandomState(0)
    B, H, L, D = 2, 2, 32, 16
    q, k, v = (
        jnp.asarray(rng.randn(B, H, L, D).astype(np.float32))
        for _ in range(3)
    )
    prefix = jnp.array([10, 4], jnp.int32)
    valid = jnp.array([32, 20], jnp.int32)
    out = reference_attention(q, k, v, prefix, valid)

    # Dense recomputation with an explicit [L, L] mask per example.
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
    for b in range(B):
        mask = np.zeros((L, L), bool)
        for r in range(L):
            for c in range(L):
                mask[r, c] = (c < int(valid[b])) and (
                    c <= r or c < int(prefix[b])
                )
        s = np.where(mask, scores[b], -1e30)
        w = np.exp(s - s.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        dense = np.einsum("hqk,hkd->hqd", w, np.asarray(v[b]))
        np.testing.assert_allclose(
            np.asarray(out[b]), dense, rtol=1e-4, atol=1e-5
        )


def test_flash_kernel_interpret_parity():
    rng = np.random.RandomState(0)
    B, H, L, D = 2, 2, 128, 32
    q, k, v = (
        jnp.asarray(rng.randn(B, H, L, D).astype(np.float32))
        for _ in range(3)
    )
    prefix = jnp.array([30, 0], jnp.int32)
    valid = jnp.array([128, 100], jnp.int32)
    ref = reference_attention(q, k, v, prefix, valid)
    out = _flash_forward(
        q, k, v, prefix, valid, causal=True, sm_scale=1 / np.sqrt(D),
        block_q=64, block_kv=64, interpret=True,
    )
    for b in range(B):
        nv = int(valid[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :nv], np.asarray(ref)[b, :, :nv],
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.slow
def test_generation_and_lora():
    cfg_kw = dict(vocab_size=50, d_model=32, num_heads=2, num_layers=2,
                  d_ff=64, max_len=32)
    from stair_tpu.llm.decoder import DecoderConfig

    cfg = DecoderConfig.gpt2(**cfg_kw)
    model = Decoder(cfg)
    params = model.init(jax.random.PRNGKey(0))

    B, Lmax = 2, 16
    embeds = np.zeros((B, Lmax, cfg.d_model), np.float32)
    ids = np.array([[4, 8, 15], [16, 23, 42]], np.int32)
    embeds[:, :3] = np.asarray(params["embed"])[ids]
    toks = model.generate(
        params, jnp.asarray(embeds), jnp.array([3, 3]), max_new_tokens=5,
    )
    assert toks.shape == (2, 5)
    assert np.all(np.asarray(toks) >= 0) and np.all(np.asarray(toks) < 50)

    # LoRA: adapters init to zero delta -> identical logits; nonzero B changes.
    params = model.add_lora(params, jax.random.PRNGKey(1), rank=4)
    base = model.forward_tokens(params, jnp.asarray(ids))
    params["layers"][0]["q"]["lora_b"] = (
        params["layers"][0]["q"]["lora_b"] + 0.1
    )
    changed = model.forward_tokens(params, jnp.asarray(ids))
    assert not np.allclose(np.asarray(base), np.asarray(changed))


def test_bf16_rope_generation():
    """Generate with bf16 params on a rope (Llama-class) config.

    Regression: rope upcasts the per-step k to f32 inside decode_one, and
    inserting it into the bf16 prefill cache raised a scatter dtype error
    (decoder.py ``put`` now casts to the cache dtype) — the exact
    inference regime of scripts/bench_decode.py and videochat_infer."""
    from stair_tpu.llm.decoder import DecoderConfig

    cfg = DecoderConfig.llama(vocab_size=50, d_model=32, num_heads=2,
                              num_layers=2, d_ff=64, max_len=32)
    model = Decoder(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params
    )
    B, Lmax = 2, 16
    embeds = np.zeros((B, Lmax, cfg.d_model), np.float32)
    ids = np.array([[4, 8, 15], [16, 23, 42]], np.int32)
    embeds[:, :3] = np.asarray(params["embed"].astype(jnp.float32))[ids]
    toks = model.generate(
        params, jnp.asarray(embeds, jnp.bfloat16), jnp.array([3, 3]),
        max_new_tokens=5,
    )
    assert toks.shape == (2, 5)
    assert np.all(np.asarray(toks) >= 0) and np.all(np.asarray(toks) < 50)


@pytest.mark.parametrize("family", ["gpt2", "llama-gqa"])
def test_kv_cache_decode_matches_full_forward(family):
    """decode_one over cached KV must equal the full-sequence forward.

    The llama-gqa case pins the grouped decode attention over the
    unexpanded [B, kv, Lmax, hd] cache (kv_heads < num_heads)."""
    from stair_tpu.llm.decoder import DecoderConfig

    if family == "gpt2":
        cfg = DecoderConfig.gpt2(vocab_size=40, d_model=32, num_heads=2,
                                 num_layers=2, d_ff=64, max_len=32)
    else:
        cfg = DecoderConfig.llama(vocab_size=40, d_model=32, num_heads=4,
                                  num_kv_heads=2, num_layers=2, d_ff=64,
                                  max_len=32)
    model = Decoder(cfg)
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    B, L = 2, 10
    ids = rng.randint(0, 40, (B, L + 1)).astype(np.int32)
    full = np.asarray(model.forward_tokens(params, jnp.asarray(ids)))

    # Prefill the first L tokens, then decode token L with the cache.
    embeds = np.zeros((B, 16, cfg.d_model), np.float32)
    embeds[:, :L] = np.asarray(params["embed"])[ids[:, :L]]
    prompt_len = jnp.asarray(np.array([L, L], np.int32))
    hidden, caches = model.prefill(
        params, jnp.asarray(embeds), jnp.zeros((B,), jnp.int32), prompt_len
    )
    # Prefill hidden at position L-1 must match the full forward.
    last_logits = np.asarray(
        model.logits_from_hidden(params, hidden[:, L - 1:L])
    )[:, 0]
    np.testing.assert_allclose(last_logits, full[:, L - 1], rtol=2e-4,
                               atol=2e-4)
    tok_embed = jnp.asarray(np.asarray(params["embed"])[ids[:, L]])
    logits, _ = model.decode_one(
        params, caches, tok_embed, jnp.full((B,), L, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(logits), full[:, L], rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("ff,tied", [("relu", True), ("gated-gelu", False)])
def test_t5_logits_parity(ff, tied):
    """T5Seq2Seq matches transformers' T5 (v1.0 relu/tied and v1.1/Flan
    gated-gelu/untied — the reference's Flan-T5-Large parser recipe,
    ref hf_program_parser.py:142-205)."""
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from stair_tpu.llm.import_weights import import_t5, t5_config_from_hf
    from stair_tpu.seq2seq.t5 import T5Seq2Seq

    hf_cfg = HFT5Config(
        vocab_size=111, d_model=48, d_kv=12, num_heads=4, num_layers=2,
        num_decoder_layers=2, d_ff=96, dropout_rate=0.0,
        feed_forward_proj=ff, tie_word_embeddings=tied,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
    )
    torch.manual_seed(3)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = t5_config_from_hf(hf_cfg)
    params = import_t5(hf.state_dict())
    model = T5Seq2Seq(cfg)

    src = np.array([[5, 9, 14, 3, 0, 0], [8, 2, 7, 9, 3, 1]], np.int32)
    src_mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.float32)
    tgt_in = np.array([[0, 4, 17, 30], [0, 9, 2, 5]], np.int32)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(src, dtype=torch.long),
            attention_mask=torch.tensor(src_mask, dtype=torch.long),
            decoder_input_ids=torch.tensor(tgt_in, dtype=torch.long),
        ).logits.numpy()
    mine = np.asarray(model.logits(
        params, jnp.asarray(src), jnp.asarray(src_mask), jnp.asarray(tgt_in)
    ))
    np.testing.assert_allclose(mine, ref, rtol=3e-4, atol=3e-4)


def test_t5_beam_decodes():
    """beam_search drives T5 through the incremental interface with the
    sentencepiece special ids (bos=pad=0, eos=1)."""
    from stair_tpu.seq2seq.beam import beam_search
    from stair_tpu.seq2seq.t5 import T5Config, T5Seq2Seq

    cfg = T5Config(vocab_size=32, d_model=16, d_kv=4, num_heads=2,
                   num_layers=1, num_decoder_layers=1, d_ff=32,
                   max_src_len=8, max_tgt_len=6)
    model = T5Seq2Seq(cfg)
    params = model.init(jax.random.PRNGKey(0))
    src = np.array([[4, 7, 9, 2, 0, 0, 0, 0]], np.int32)
    sm = (src != 0).astype(np.float32)
    tokens, scores = beam_search(
        model, params, jnp.asarray(src), jnp.asarray(sm),
        beam_size=3, max_len=6, bos=0, eos=1, pad=0,
    )
    assert tokens.shape == (1, 3, 6)
    assert np.all(np.asarray(scores)[:, 0] >= np.asarray(scores)[:, 1])


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2)])
def test_llm_sharded_sft_step_matches_single_device(dp, tp, cpu_devices):
    """tp-sharded SFT step must reproduce the single-device step (loss +
    updated params) — protects parallel/mesh.py llm_param_sharding against
    numerics regressions (the multichip dryrun only smoke-checks)."""
    import optax

    from stair_tpu.llm.clip import ClipVisionConfig
    from stair_tpu.llm.decoder import DecoderConfig
    from stair_tpu.llm.videochat import VideoChatConfig, VideoChatModel
    from stair_tpu.parallel.mesh import (
        llm_param_sharding,
        make_mesh,
        shard_batch,
    )

    if len(cpu_devices) < dp * tp:
        pytest.skip(f"need {dp * tp} cpu devices")

    dec = DecoderConfig.llama(
        vocab_size=64 * tp, d_model=32 * tp, num_heads=2 * tp,
        num_layers=2, d_ff=64 * tp, max_len=128,
    )
    vis = ClipVisionConfig(
        image_size=28, patch_size=14, d_model=16, num_heads=2,
        num_layers=1, d_ff=32,
    )
    cfg = VideoChatConfig(decoder=dec, vision=vis, max_temporal=4)
    model = VideoChatModel(cfg)
    params = model.init(jax.random.PRNGKey(1))

    B, L = 2 * dp, 64
    rng = np.random.RandomState(0)
    V = cfg.video_token_len
    batch = {
        "token_ids": rng.randint(0, dec.vocab_size, (B, L)).astype(np.int32),
        "labels": rng.randint(-1, dec.vocab_size, (B, L)).astype(np.int32),
        "video_tokens": rng.randn(B, V, vis.d_model).astype(np.float32),
        "splice_start": np.full((B,), 2, np.int32),
        "valid_len": np.full((B,), L, np.int32),
    }
    optimizer = optax.adam(1e-3)

    @jax.jit
    def sft_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: model.sft_loss(p, batch)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p1, _, loss1 = sft_step(params, optimizer.init(params), batch)

    mesh = make_mesh(dp=dp, tp=tp, devices=cpu_devices)
    params2 = {
        "decoder": jax.device_put(
            params["decoder"], llm_param_sharding(params["decoder"], mesh)
        ),
        "vision": params["vision"],
        "mm_projector": params["mm_projector"],
    }
    batch2 = shard_batch(dict(batch), mesh)
    p2, _, loss2 = sft_step(params2, optimizer.init(params2), batch2)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(jax.device_get(p1))
    l2 = jax.tree_util.tree_leaves(jax.device_get(p2))
    # Same tolerance as the NMN sharded-step test: f32 reduction-order
    # differences through the tp psum get amplified by Adam's rsqrt at
    # near-zero second moments.
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_flash_route_padding_decisions():
    """Routing: 512-divisible lengths run the kernel directly; odd lengths
    above the crossover pad to a 512 multiple (masked via valid_len);
    short or heavily-padded lengths stay dense (measured crossovers on
    v5e — see _route docstring)."""
    from stair_tpu.ops.attention import _route

    def probe(Lq, Lkv=None):
        Lkv = Lkv or Lq
        q = jnp.zeros((1, 1, Lq, 64), jnp.float32)
        k = jnp.zeros((1, 1, Lkv, 64), jnp.float32)
        return _route(q, k)

    assert probe(1024)[0] == "flash"
    assert probe(2048)[0] == "flash"
    assert probe(768)[0] == "flash"      # 256-wide blocks fit
    assert probe(128)[0] == "dense"      # short: launch overhead dominates
    route, bq, bkv, pq, pkv = probe(896)  # the Video-ChatGPT shape
    assert route == "pad" and (bq, bkv) == (512, 512) and pq == pkv == 1024
    assert probe(640)[0] == "dense"      # 60% padding -> dense
    assert probe(100)[0] == "dense"      # no MXU-friendly block at all


def test_flash_padded_route_backward_interpret_parity():
    """Backward kernels on the padded route (q-tile skip active: rows
    beyond valid_len) must match autodiff of the dense reference."""
    from stair_tpu.ops.attention import (
        _flash_backward,
        _flash_forward,
        _pad_seq,
    )

    rng = np.random.RandomState(4)
    B, H, L, D = 2, 2, 300, 32
    q, k, v = (
        jnp.asarray(rng.randn(B, H, L, D).astype(np.float32) * 0.3)
        for _ in range(3)
    )
    prefix = jnp.array([40, 0], jnp.int32)
    valid = jnp.array([300, 220], jnp.int32)
    scale = 1 / np.sqrt(D)

    def ref_loss(q, k, v):
        out = reference_attention(q, k, v, prefix, valid, True, scale)
        mask = (jnp.arange(L)[None, :] < valid[:, None])[:, None, :, None]
        return jnp.sum(jnp.where(mask, out, 0.0) ** 2)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

    P = 512
    qp, kp, vp = _pad_seq(q, P), _pad_seq(k, P), _pad_seq(v, P)
    out, lse = _flash_forward(
        qp, kp, vp, prefix, valid, causal=True, sm_scale=scale,
        block_q=128, block_kv=128, interpret=True, save_residuals=True,
    )
    mask = (jnp.arange(P)[None, :] < valid[:, None])[:, None, :, None]
    do = 2.0 * jnp.where(mask, out, 0.0)
    dq, dk, dv = _flash_backward(
        qp, kp, vp, out, lse, do, prefix, valid, causal=True,
        sm_scale=scale, block_q=128, block_kv=128, interpret=True,
    )
    for g_r, g_k_arr in zip(g_ref, (dq, dk, dv)):
        for b in range(B):
            nv = int(valid[b])
            np.testing.assert_allclose(
                np.asarray(g_k_arr)[b, :, :nv],
                np.asarray(g_r)[b, :, :nv],
                rtol=2e-4, atol=2e-5,
            )


def test_flash_padded_route_interpret_parity():
    """The padded kernel path (L=896 -> 1024 with valid_len masking) must
    match dense attention on the unpadded rows."""
    from stair_tpu.ops.attention import _flash_forward, _pad_seq

    rng = np.random.RandomState(1)
    B, H, L, D = 2, 2, 384, 32
    q, k, v = (
        jnp.asarray(rng.randn(B, H, L, D).astype(np.float32) * 0.3)
        for _ in range(3)
    )
    prefix = jnp.array([50, 0], jnp.int32)
    valid = jnp.array([384, 300], jnp.int32)
    ref = reference_attention(q, k, v, prefix, valid)
    P = 512
    out = _flash_forward(
        _pad_seq(q, P), _pad_seq(k, P), _pad_seq(v, P),
        prefix, valid, causal=True, sm_scale=1 / np.sqrt(D),
        block_q=128, block_kv=128, interpret=True,
    )[:, :, :L]
    for b in range(B):
        nv = int(valid[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :nv], np.asarray(ref)[b, :, :nv],
            rtol=1e-5, atol=1e-5,
        )

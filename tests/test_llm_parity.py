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


def test_kv_cache_decode_matches_full_forward():
    """decode_one over cached KV must equal the full-sequence forward."""
    from stair_tpu.llm.decoder import DecoderConfig

    cfg = DecoderConfig.gpt2(vocab_size=40, d_model=32, num_heads=2,
                             num_layers=2, d_ff=64, max_len=32)
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

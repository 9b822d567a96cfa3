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

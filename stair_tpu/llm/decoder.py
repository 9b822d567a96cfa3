"""Decoder-only transformer family: GPT-2-class and Llama-class in one.

One implementation parameterized over the architectural axes that separate
the reference's two LM backbones (yellow-binary-tree/STAIR ``VideoGPT2.py``
uses GPT-2; the Video-ChatGPT path uses Llama):

  * positions: learned embeddings (GPT-2) or rotary (Llama);
  * norm: LayerNorm (GPT-2) or RMSNorm (Llama), pre-norm in both;
  * MLP: GELU (GPT-2, tanh approximation) or SwiGLU (Llama);
  * attention: MHA or grouped-query (Llama 2/3), always through the Pallas
    prefix-LM flash kernel (:mod:`stair_tpu.ops.attention`) — the per-example
    ``prefix_len`` realizes VideoGPT2's "video tokens visible to everyone"
    dual mask (VideoGPT2.py:56-82) with two scalars instead of mask tensors;
  * optional LoRA adapters on q/v projections (ref VideoGPT2.py:287-295);
  * biases toggleable (GPT-2 yes, Llama no).

Weights import from HF checkpoints via :mod:`stair_tpu.llm.import_weights`;
numerics are parity-tested against transformers' torch implementations.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from stair_tpu.ops.attention import flash_attention, reference_attention


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    d_model: int = 768
    num_heads: int = 12
    num_kv_heads: int | None = None       # GQA; None = num_heads
    num_layers: int = 12
    d_ff: int = 3072
    max_len: int = 1024
    pos: str = "learned"                  # 'learned' | 'rope'
    norm: str = "ln"                      # 'ln' | 'rms'
    mlp: str = "gelu"                     # 'gelu' | 'swiglu'
    use_bias: bool = True
    tie_embeddings: bool = True
    rope_theta: float = 10000.0
    lora_rank: int = 0
    rms_eps: float = 1e-6
    #: Rematerialize each transformer layer in the backward pass (keeping
    #: matmul outputs): required to train >=1B-param configs on one 16GB
    #: chip — activation memory drops from O(layers x intermediates) to
    #: O(layers x layer-inputs).
    remat: bool = False
    #: 'dots' keeps projection outputs (cheapest recompute; ~220 MB/layer
    #: at d=2560/L=1024/B=4 — 36-layer configs pay ~8 GB); 'full' saves
    #: only layer boundaries (~20 MB/layer) and recomputes everything —
    #: what lets 3B params + grads + backward fit one 16 GB chip.
    remat_policy: str = "dots"            # 'dots' | 'full'

    @property
    def kv_heads(self):
        return self.num_kv_heads or self.num_heads

    @property
    def head_dim(self):
        return self.d_model // self.num_heads

    @classmethod
    def gpt2(cls, vocab_size=50257, **kw):
        return cls(vocab_size=vocab_size, pos="learned", norm="ln",
                   mlp="gelu", use_bias=True, tie_embeddings=True, **kw)

    @classmethod
    def llama(cls, vocab_size=32000, d_model=4096, num_heads=32,
              num_layers=32, d_ff=11008, max_len=2048, **kw):
        return cls(vocab_size=vocab_size, d_model=d_model,
                   num_heads=num_heads, num_layers=num_layers, d_ff=d_ff,
                   max_len=max_len, pos="rope", norm="rms", mlp="swiglu",
                   use_bias=False, tie_embeddings=False, **kw)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _norm(p, x, kind, eps):
    if kind == "rms":
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + eps) * p["scale"]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _proj(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _lora(p, x, y):
    """y + x @ A @ B (applied when adapters exist)."""
    if "lora_a" in p:
        y = y + (x @ p["lora_a"]) @ p["lora_b"]
    return y


def _rope(x, positions, theta):
    """Rotate pairs (HF Llama convention: split halves)."""
    B, L, H, D = x.shape
    half = D // 2
    freq = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = positions[:, :, None].astype(jnp.float32) * freq[None, None, :]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _gelu_tanh(x):
    return 0.5 * x * (
        1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x))
    )


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

class Decoder:
    def __init__(self, config: DecoderConfig):
        self.config = config

    # -- init ----------------------------------------------------------------

    def init(self, rng):
        cfg = self.config
        D, F = cfg.d_model, cfg.d_ff
        kvd = cfg.kv_heads * cfg.head_dim
        keys = iter(jax.random.split(rng, 16 + 16 * cfg.num_layers))

        def lin(fi, fo, bias=None, std=0.02):
            p = {"w": jax.random.normal(next(keys), (fi, fo)) * std}
            if cfg.use_bias if bias is None else bias:
                p["b"] = jnp.zeros((fo,))
            if cfg.lora_rank:
                pass  # adapters added separately via add_lora
            return p

        def norm_p():
            p = {"scale": jnp.ones((D,))}
            if cfg.norm == "ln":
                p["bias"] = jnp.zeros((D,))
            return p

        def layer():
            p = {
                "ln1": norm_p(),
                "q": lin(D, D), "k": lin(D, kvd), "v": lin(D, kvd),
                "o": lin(D, D),
                "ln2": norm_p(),
            }
            if cfg.mlp == "swiglu":
                p["gate"] = lin(D, F)
                p["up"] = lin(D, F)
                p["down"] = lin(F, D)
            else:
                p["up"] = lin(D, F)
                p["down"] = lin(F, D)
            return p

        params = {
            "embed": jax.random.normal(next(keys), (cfg.vocab_size, D)) * 0.02,
            "layers": [layer() for _ in range(cfg.num_layers)],
            "ln_f": norm_p(),
        }
        if cfg.pos == "learned":
            params["pos_embed"] = jax.random.normal(
                next(keys), (cfg.max_len, D)) * 0.01
        if not cfg.tie_embeddings:
            params["lm_head"] = {
                "w": jax.random.normal(next(keys), (D, cfg.vocab_size)) * 0.02
            }
        return params

    def add_lora(self, params, rng, rank=None):
        """Attach LoRA adapters to q/v projections (ref VideoGPT2.py:287-295)."""
        cfg = self.config
        rank = rank or cfg.lora_rank or 8
        keys = iter(jax.random.split(rng, 2 * len(params["layers"])))
        for layer in params["layers"]:
            for name in ("q", "v"):
                fi, fo = layer[name]["w"].shape
                layer[name]["lora_a"] = (
                    jax.random.normal(next(keys), (fi, rank)) / np.sqrt(rank)
                )
                layer[name]["lora_b"] = jnp.zeros((rank, fo))
        return params

    # -- forward -------------------------------------------------------------

    def hidden_states(
        self, params, input_embeds, prefix_len, valid_len,
        positions=None, use_flash=True,
    ):
        """input_embeds [B, L, D] -> final hidden states [B, L, D]."""
        cfg = self.config
        B, L, D = input_embeds.shape
        x = input_embeds
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        if cfg.pos == "learned":
            x = x + params["pos_embed"][positions]

        h_, kv_, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim

        def one_layer(layer, x):
            a_in = _norm(layer["ln1"], x, cfg.norm, cfg.rms_eps)
            q = _lora(layer["q"], a_in, _proj(layer["q"], a_in))
            k = _proj(layer["k"], a_in)
            v = _lora(layer["v"], a_in, _proj(layer["v"], a_in))
            q = q.reshape(B, L, h_, hd)
            k = k.reshape(B, L, kv_, hd)
            v = v.reshape(B, L, kv_, hd)
            if cfg.pos == "rope":
                q = _rope(q, positions, cfg.rope_theta)
                k = _rope(k, positions, cfg.rope_theta)
            if kv_ != h_:
                rep = h_ // kv_
                k = jnp.repeat(k, rep, axis=2)
                v = jnp.repeat(v, rep, axis=2)
            q = jnp.moveaxis(q, 1, 2)  # [B, H, L, hd]
            k = jnp.moveaxis(k, 1, 2)
            v = jnp.moveaxis(v, 1, 2)
            attend = flash_attention if use_flash else reference_attention
            attn = attend(q, k, v, prefix_len, valid_len)
            attn = jnp.moveaxis(attn, 1, 2).reshape(B, L, D)
            x = x + _proj(layer["o"], attn)

            m_in = _norm(layer["ln2"], x, cfg.norm, cfg.rms_eps)
            if cfg.mlp == "swiglu":
                h = jax.nn.silu(_proj(layer["gate"], m_in)) * _proj(
                    layer["up"], m_in
                )
            else:
                h = _gelu_tanh(_proj(layer["up"], m_in))
            return x + _proj(layer["down"], h)

        if cfg.remat:
            policy = (
                None if cfg.remat_policy == "full"
                else jax.checkpoint_policies
                .checkpoint_dots_with_no_batch_dims
            )
            one_layer = jax.checkpoint(
                one_layer, policy=policy, prevent_cse=False,
            )
        for layer in params["layers"]:
            x = one_layer(layer, x)
        return _norm(params["ln_f"], x, cfg.norm, cfg.rms_eps)


    def logits_from_hidden(self, params, hidden):
        if self.config.tie_embeddings:
            return hidden @ params["embed"].T
        return hidden @ params["lm_head"]["w"]

    def forward_tokens(self, params, token_ids, prefix_len=None,
                       valid_len=None, input_embeds=None):
        """Token ids (or pre-built embeds) -> logits [B, L, V]."""
        B, L = token_ids.shape[:2]
        if input_embeds is None:
            input_embeds = params["embed"][token_ids]
        if prefix_len is None:
            prefix_len = jnp.zeros((B,), jnp.int32)
        if valid_len is None:
            valid_len = jnp.full((B,), L, jnp.int32)
        hidden = self.hidden_states(params, input_embeds, prefix_len, valid_len)
        return self.logits_from_hidden(params, hidden)

    # -- generation (prefill + KV-cache decode) ------------------------------

    def _project_qkv(self, layer, x, positions):
        """x [B, L, D] -> q [B, h, L, hd], k/v [B, kv, L, hd].

        k/v stay at ``kv_heads`` (GQA caches must not store the expanded
        heads: that multiplies cache memory and decode HBM traffic by the
        group factor — decode reads the whole cache every token)."""
        cfg = self.config
        B, L, D = x.shape
        h_, kv_, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim
        q = _lora(layer["q"], x, _proj(layer["q"], x)).reshape(B, L, h_, hd)
        k = _proj(layer["k"], x).reshape(B, L, kv_, hd)
        v = _lora(layer["v"], x, _proj(layer["v"], x)).reshape(B, L, kv_, hd)
        if cfg.pos == "rope":
            q = _rope(q, positions, cfg.rope_theta)
            k = _rope(k, positions, cfg.rope_theta)
        return (jnp.moveaxis(q, 1, 2), jnp.moveaxis(k, 1, 2),
                jnp.moveaxis(v, 1, 2))

    def _expand_kv(self, k, v):
        """[B, kv, L, hd] -> [B, h, L, hd] for kernels that want full heads."""
        cfg = self.config
        if cfg.kv_heads == cfg.num_heads:
            return k, v
        rep = cfg.num_heads // cfg.kv_heads
        return jnp.repeat(k, rep, axis=1), jnp.repeat(v, rep, axis=1)

    def _layer_tail(self, layer, x, attn_out):
        cfg = self.config
        B, L, D = x.shape
        x = x + _proj(layer["o"], attn_out.reshape(B, L, D))
        m_in = _norm(layer["ln2"], x, cfg.norm, cfg.rms_eps)
        if cfg.mlp == "swiglu":
            h = jax.nn.silu(_proj(layer["gate"], m_in)) * _proj(
                layer["up"], m_in
            )
        else:
            h = _gelu_tanh(_proj(layer["up"], m_in))
        return x + _proj(layer["down"], h)

    def prefill(self, params, input_embeds, prefix_len, valid_len):
        """Full-prompt forward that also returns per-layer KV caches.

        Returns (hidden [B, L, D], caches: list of (k, v) [B, h, L, hd]).
        """
        cfg = self.config
        B, L, D = input_embeds.shape
        positions = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        x = input_embeds
        if cfg.pos == "learned":
            x = x + params["pos_embed"][positions]
        caches = []
        for layer in params["layers"]:
            a_in = _norm(layer["ln1"], x, cfg.norm, cfg.rms_eps)
            q, k, v = self._project_qkv(layer, a_in, positions)
            caches.append((k, v))                # [B, kv, L, hd]
            kf, vf = self._expand_kv(k, v)
            attn = flash_attention(q, kf, vf, prefix_len, valid_len)
            x = self._layer_tail(layer, x, jnp.moveaxis(attn, 1, 2))
        return _norm(params["ln_f"], x, cfg.norm, cfg.rms_eps), caches

    def decode_one(self, params, caches, token_embed, cur_len):
        """One KV-cache decode step.

        token_embed [B, D] for position ``cur_len`` [B]; caches are updated
        in place (functionally) at that position. Returns (logits, caches).
        """
        cfg = self.config
        B, D = token_embed.shape
        Lmax = caches[0][0].shape[2]
        positions = cur_len[:, None]                       # [B, 1]
        x = token_embed[:, None, :]
        if cfg.pos == "learned":
            x = x + params["pos_embed"][jnp.minimum(cur_len, cfg.max_len - 1)][:, None]
        cols = jnp.arange(Lmax)[None, None, None, :]
        h_, kv_, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim
        g = h_ // kv_
        new_caches = []
        for layer, (ck, cv) in zip(params["layers"], caches):
            a_in = _norm(layer["ln1"], x, cfg.norm, cfg.rms_eps)
            q, k, v = self._project_qkv(layer, a_in, positions)
            # Insert this step's k/v at cur_len.
            def put(cache, new):
                # rope upcasts k to f32; the cache keeps the prefill dtype.
                return jax.vmap(
                    lambda c, n, t: jax.lax.dynamic_update_slice(
                        c, n.astype(c.dtype), (0, t, 0)
                    )
                )(cache, new, cur_len)
            ck = put(ck, k)
            cv = put(cv, v)
            new_caches.append((ck, cv))
            mask = cols <= cur_len[:, None, None, None]    # [B,1,1,Lmax]
            # Grouped attention over the unexpanded [B, kv, Lmax, hd]
            # cache: query heads fold into a per-kv-head group axis.
            qg = q[:, :, 0].reshape(B, kv_, g, hd)
            s = jnp.einsum("bkgd,bkld->bkgl", qg, ck) / np.sqrt(hd)
            s = jnp.where(mask, s, -1e30)
            w = jax.nn.softmax(s, axis=-1)
            attn = jnp.einsum("bkgl,bkld->bkgd", w, cv)
            attn = attn.reshape(B, h_, 1, hd)
            x = self._layer_tail(layer, x, jnp.moveaxis(attn, 1, 2))
        x = _norm(params["ln_f"], x, cfg.norm, cfg.rms_eps)
        logits = self.logits_from_hidden(params, x)[:, 0]
        return logits, new_caches

    def generate(
        self, params, input_embeds, prompt_len, max_new_tokens,
        prefix_len=None, temperature=0.0, rng=None, eos_id=None,
    ):
        """Prefill once (flash kernel), then KV-cache decode.

        ``input_embeds`` [B, Lmax, D] holds the prompt with room for
        ``max_new_tokens`` more; ``prompt_len`` [B] marks the prompt end.
        Returns generated token ids [B, max_new_tokens].
        """
        B, Lmax, D = input_embeds.shape
        prompt_len = prompt_len.astype(jnp.int32)
        if prefix_len is None:
            prefix_len = jnp.zeros((B,), jnp.int32)
        if rng is None:
            rng = jax.random.PRNGKey(0)

        hidden, caches = self.prefill(
            params, input_embeds, prefix_len, prompt_len
        )
        last = hidden[jnp.arange(B), jnp.clip(prompt_len - 1, 0, Lmax - 1)]
        logits0 = self.logits_from_hidden(params, last[:, None, :])[:, 0]

        def sample(logits, key):
            if temperature and temperature > 0:
                return jax.random.categorical(
                    key, logits / temperature
                ).astype(jnp.int32)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        rng, k0 = jax.random.split(rng)
        tok0 = sample(logits0, k0)

        def step(carry, i):
            caches, tok, cur_len, done, rng = carry
            rng, key = jax.random.split(rng)
            embed = params["embed"][tok]
            logits, caches = self.decode_one(
                params, caches, embed, jnp.minimum(cur_len, Lmax - 1)
            )
            new_tok = sample(logits, key)
            if eos_id is not None:
                done = done | (tok == eos_id)
                new_tok = jnp.where(done, tok, new_tok)
            return (caches, new_tok, cur_len + 1, done, rng), tok

        (_, _, _, _, _), tokens = jax.lax.scan(
            step,
            (caches, tok0, prompt_len, jnp.zeros((B,), bool), rng),
            jnp.arange(max_new_tokens),
        )
        return jnp.moveaxis(tokens, 0, 1)                  # [B, T]

"""CLIP vision tower (ViT) in JAX.

The reference extracts frame features with HF ``CLIPVisionModel`` ViT-L/14
and uses the penultimate layer's patch tokens
(yellow-binary-tree/STAIR ``video_chatgpt/eval/model_utils.py:149-174``,
``inference.py:87-89``). This is the same ViT implemented TPU-native: conv
patch embedding as one MXU matmul over unfolded patches, pre-LN transformer
with quick-GELU, class token + learned positions. Weights import from HF
checkpoints; parity is tested against the torch implementation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from stair_tpu.models.modules import _init_linear, linear


@dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    d_model: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    d_ff: int = 4096
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2


def _ln(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ClipVisionTower:
    def __init__(self, config: ClipVisionConfig):
        self.config = config

    def init(self, rng):
        cfg = self.config
        D, F = cfg.d_model, cfg.d_ff
        P = cfg.patch_size
        keys = iter(jax.random.split(rng, 8 + 6 * cfg.num_layers))

        def ln_p():
            return {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}

        def layer():
            return {
                "ln1": ln_p(),
                "q": _init_linear(next(keys), D, D),
                "k": _init_linear(next(keys), D, D),
                "v": _init_linear(next(keys), D, D),
                "o": _init_linear(next(keys), D, D),
                "ln2": ln_p(),
                "fc1": _init_linear(next(keys), D, F),
                "fc2": _init_linear(next(keys), F, D),
            }

        return {
            "patch_proj": jax.random.normal(
                next(keys), (3 * P * P, D)) * 0.02,
            "class_embed": jax.random.normal(next(keys), (D,)) * 0.02,
            "pos_embed": jax.random.normal(
                next(keys), (cfg.num_patches + 1, D)) * 0.02,
            "pre_ln": ln_p(),
            "layers": [layer() for _ in range(cfg.num_layers)],
        }

    def _attn(self, p, x, num_heads):
        B, L, D = x.shape
        h, hd = num_heads, D // num_heads
        q = linear(p["q"], x).reshape(B, L, h, hd)
        k = linear(p["k"], x).reshape(B, L, h, hd)
        v = linear(p["v"], x).reshape(B, L, h, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        w = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, L, D)
        return linear(p["o"], out)

    def forward_features(self, params, images, until_layer=-1):
        """Run the tower; return hidden states after ``until_layer`` blocks
        (negative = from the end, -1 = penultimate output)."""
        cfg = self.config
        eps = cfg.layer_norm_eps
        B = images.shape[0]
        P = cfg.patch_size
        G = cfg.image_size // P
        x = images.reshape(B, G, P, G, P, 3)
        x = x.transpose(0, 1, 3, 5, 2, 4)
        x = x.reshape(B, G * G, 3 * P * P)
        x = x @ params["patch_proj"]
        cls = jnp.broadcast_to(
            params["class_embed"], (B, 1, cfg.d_model)
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["pos_embed"][None]
        x = _ln(params["pre_ln"], x, eps)
        layers = params["layers"]
        n = len(layers) + until_layer if until_layer < 0 else until_layer
        for layer in layers[:n]:
            h = _ln(layer["ln1"], x, eps)
            x = x + self._attn(layer, h, cfg.num_heads)
            h = _ln(layer["ln2"], x, eps)
            x = x + linear(layer["fc2"], _quick_gelu(linear(layer["fc1"], h)))
        return x

    def patch_features(self, params, images):
        """[B, H, W, 3] -> [B, S, D]: penultimate hidden states, CLS dropped
        — exactly what the reference feeds the projector."""
        return self.forward_features(params, images, until_layer=-1)[:, 1:]


def import_clip_vision(state_dict) -> dict:
    """HF CLIPVisionModel state dict -> ClipVisionTower params."""

    def _np(t):
        return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)

    sd = dict(state_dict)
    pfx = ("vision_model."
           if any(k.startswith("vision_model.") for k in sd) else "")

    def g(name):
        return _np(sd[pfx + name])

    conv = g("embeddings.patch_embedding.weight")      # [D, 3, P, P]
    D = conv.shape[0]
    patch_proj = conv.reshape(D, -1).T                 # [(3*P*P), D]
    n_layer = 1 + max(
        int(k[len(pfx) + len("encoder.layers."):].split(".")[0])
        for k in sd if k.startswith(pfx + "encoder.layers.")
    )
    layers = []
    for i in range(n_layer):
        b = f"encoder.layers.{i}."
        layers.append({
            "ln1": {"scale": g(b + "layer_norm1.weight"),
                    "bias": g(b + "layer_norm1.bias")},
            "q": {"w": g(b + "self_attn.q_proj.weight").T,
                  "b": g(b + "self_attn.q_proj.bias")},
            "k": {"w": g(b + "self_attn.k_proj.weight").T,
                  "b": g(b + "self_attn.k_proj.bias")},
            "v": {"w": g(b + "self_attn.v_proj.weight").T,
                  "b": g(b + "self_attn.v_proj.bias")},
            "o": {"w": g(b + "self_attn.out_proj.weight").T,
                  "b": g(b + "self_attn.out_proj.bias")},
            "ln2": {"scale": g(b + "layer_norm2.weight"),
                    "bias": g(b + "layer_norm2.bias")},
            "fc1": {"w": g(b + "mlp.fc1.weight").T,
                    "b": g(b + "mlp.fc1.bias")},
            "fc2": {"w": g(b + "mlp.fc2.weight").T,
                    "b": g(b + "mlp.fc2.bias")},
        })
    return {
        "patch_proj": patch_proj,
        "class_embed": g("embeddings.class_embedding"),
        "pos_embed": g("embeddings.position_embedding.weight"),
        "pre_ln": {"scale": g("pre_layrnorm.weight"),
                   "bias": g("pre_layrnorm.bias")},
        "layers": layers,
    }


#: CLIP image normalization (the reference's CLIPImageProcessor values).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_frames(frames_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """[T, H, W, 3] uint8 -> [T, size, size, 3] float32 CLIP-normalized."""
    from PIL import Image

    out = np.empty((len(frames_uint8), size, size, 3), np.float32)
    for i, frame in enumerate(frames_uint8):
        img = Image.fromarray(frame).convert("RGB").resize(
            (size, size), Image.BICUBIC
        )
        out[i] = (np.asarray(img, np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    return out

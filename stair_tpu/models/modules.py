"""The 18 neural modules as pure JAX functions.

Numerics mirror the reference modules (yellow-binary-tree/STAIR
``video_nmn/modules.py``) including its quirks — e.g. the Filter module's
"softmax attention" over a [F, 1] tensor normalizes along the singleton axis
and therefore degenerates to uniform sum-pooling (``modules.py:353-374``); we
keep that behavior under ``filter_attention='parity'`` and offer a proper
masked softmax under ``'softmax'``.

All functions operate on one example (the executor vmaps over the batch):

  * vec    — [H]
  * frames — [F, H] with a validity mask [F]
  * attn   — [F]

Unlike the reference, every frame-axis reduction here is masked, because
videos are padded to a fixed F for compilation; on unpadded inputs the
numerics agree exactly (validated by the torch parity tests).

Parameters live in plain nested dicts of arrays. Linear weights use the
[in, out] convention (transposed from torch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

COS_EPS = 1e-8  # torch.nn.CosineSimilarity eps


# ---------------------------------------------------------------------------
# Small building blocks
# ---------------------------------------------------------------------------

def linear(p, x):
    return x @ p["w"] + p["b"]


def dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def cosine(x, y, axis=-1):
    """torch.nn.CosineSimilarity semantics: per-element norm clamp.

    Norms accumulate in float32 regardless of input dtype (bf16 squares
    underflow well before the clamp epsilon).
    """
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    nx = _safe_sqrt(jnp.sum(xf * xf, axis=axis))
    ny = _safe_sqrt(jnp.sum(yf * yf, axis=axis))
    dot = jnp.sum(xf * yf, axis=axis)
    return (dot / jnp.maximum(nx * ny, COS_EPS)).astype(x.dtype)


def _safe_sqrt(s):
    """sqrt with a finite gradient at 0 (an exactly-zero vector otherwise
    injects NaN into the backward pass even when a ``where`` discards the
    forward value — e.g. the executor's null-expert rows)."""
    return jnp.sqrt(jnp.maximum(s, 1e-30))


def cosine_matrix(x, y):
    """All-pairs cosine: x [K, H], y [F, H] -> [K, F].

    Same math as ``cosine(x[:, None], y[None, :])`` but the dot products run
    as ONE [K, H] @ [H, F] MXU matmul instead of a broadcast
    multiply-reduce that materializes (or at best streams) a [K, F, H]
    intermediate — the executor calls this with K = F = 64, where the
    broadcast form cost ~30 ms/step in the backward pass.
    """
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    dot = xf @ yf.T                                      # [K, F]
    nx = _safe_sqrt(jnp.sum(xf * xf, axis=-1))
    ny = _safe_sqrt(jnp.sum(yf * yf, axis=-1))
    return (dot / jnp.maximum(nx[:, None] * ny[None, :], COS_EPS)).astype(
        x.dtype
    )


def masked_softmax(x, mask, axis=-1):
    x = jnp.where(mask, x, -jnp.inf)
    x = x - jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    e = jnp.where(mask, jnp.exp(x), 0.0)
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-30)


def layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize semantics (norm clamped below by eps).

    Uses the grad-safe sqrt: exactly-zero rows (unwritten/scratch registers)
    otherwise emit NaN cotangents even under a zero loss weight."""
    norm = _safe_sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


# ---------------------------------------------------------------------------
# Module forward functions
# ---------------------------------------------------------------------------

def and_module(a, b):
    """ref modules.py:7-12 — elementwise min (any kind)."""
    return jnp.minimum(a, b)


def compare_module(p, feat1, feat2):
    """ref modules.py:15-21."""
    return jax.nn.relu(linear(p, jnp.concatenate([feat1, feat2])))


def equals_module(p, feat1, feat2):
    """ref modules.py:24-37."""
    return jax.nn.relu(linear(p, jnp.concatenate([feat1, feat2])))


def choose_module(kw1, kw2, query):
    """ref modules.py:40-56 — hard select by cosine similarity."""
    take_first = cosine(kw1, query) > cosine(kw2, query)
    return jnp.where(take_first, kw1, kw2)


def xor_module(p, feat1, feat2):
    """ref modules.py:59-72."""
    x = jnp.concatenate([jnp.abs(feat1 - feat2), feat1, feat2])
    return jax.nn.relu(linear(p, x))


def xorframe_module(attn1, attn2):
    """ref modules.py:75-80."""
    return jnp.abs(attn1 - attn2)


def query_module(p, kw, rate, rng, deterministic):
    """ref modules.py:83-99 (unregistered in the reference; supported here)."""
    return dropout(jax.nn.relu(linear(p["l1"], kw)), rate, rng, deterministic)


def toaction_module(p, action, kw, rate, rng, deterministic):
    """ref modules.py:102-120."""
    h = jax.nn.relu(linear(p["l1"], jnp.concatenate([action, kw])))
    h = dropout(h, rate, rng, deterministic)
    return jax.nn.relu(linear(p["l2"], h))


def hasitem_module(p, frames, mask, rate, rng, deterministic):
    """ref modules.py:123-138 — per-frame plausibility [F]."""
    r1, r2 = jax.random.split(rng)
    h = dropout(jax.nn.relu(linear(p["l1"], frames)), rate, r1, deterministic)
    out = jax.nn.sigmoid(linear(p["l2"], h))[..., 0]
    out = dropout(out, rate, r2, deterministic)
    return out * mask


def exists_module(p, kw, feat, rate, rng, deterministic):
    """ref modules.py:141-159 — cat[feat, kw, feat*kw] -> 2-layer MLP."""
    r1, r2 = jax.random.split(rng)
    x = jnp.concatenate([feat, kw, feat * kw])
    h = dropout(jax.nn.relu(linear(p["l1"], x)), rate, r1, deterministic)
    h = dropout(jax.nn.relu(linear(p["l2"], h)), rate, r2, deterministic)
    return h


def existsframe_module(kw, frames, mask):
    """ref modules.py:162-178 — rescaled cosine attention [F]."""
    scores = cosine(frames, kw[None, :])
    return (scores + 1.0) * 0.49 * mask


def localize_scores(p, frames, keywords, mask, rate, rng, deterministic):
    """ref modules.py:181-217 — projected cosine attention [K, F].

    ``keywords``: [K, H]. Scores on padded frames are zeroed.
    """
    h = dropout(jax.nn.relu(linear(p["v1"], frames)), rate, rng, deterministic)
    feat = linear(p["v2"], h)                       # [F, H]
    kw = linear(p["k"], keywords)                   # [K, H]
    scores = cosine_matrix(kw, feat)                # [K, F]
    return (scores + 1.0) * 0.49 * mask[None, :]


def superlative_module(
    p, localize_p, mode_is_min, actions, frames, mask,
    rate, rng, deterministic, action_mask=None,
):
    """ref modules.py:220-248 — soft-argmax over actions.

    ``actions``: [K, H] (K = 1, 2, or F when fed by FilterFrame).
    ``action_mask``: [K] validity (None = all valid). The reference flips
    weights for 'min' as ``1 - softmax`` (modules.py:245-246) — kept as-is.
    """
    scores = localize_scores(
        p=localize_p, frames=frames, keywords=actions, mask=mask,
        rate=rate, rng=rng, deterministic=deterministic,
    )                                               # [K, F]
    row = jnp.sum(scores, axis=1)                   # [K]
    if action_mask is None:
        action_mask = jnp.ones_like(row, dtype=bool)
    w = masked_softmax(row, action_mask, axis=0)
    w = jnp.where(mode_is_min, 1.0 - w, w) * action_mask
    pooled = jnp.sum(w[:, None] * actions, axis=0)  # [H]
    return jax.nn.relu(linear(p["dense"], pooled))


def _conv1d_same(x, w, b):
    """torch Conv1d(1, 1, k, padding='same', zeros) on a 1-D signal."""
    k = w.shape[0]
    left = (k - 1) // 2
    pad = jnp.pad(x, (left, k - 1 - left))
    out = jnp.convolve(pad, w[::-1], mode="valid")
    return out + b


def conv1d_same_matrix(w, length):
    """[length, length] banded matrix T with ``T @ x == _conv1d_same(x, w)``
    (bias excluded).

    XLA lowers tiny odd-shaped 1-D convolutions poorly on TPU; as a banded
    matmul the same op rides the MXU and — because ``w`` is loop-invariant —
    the matrix build hoists out of the executor scan. Cross-correlation
    (torch Conv1d semantics): ``out[i] = sum_u x[u] * w[u-i+left]`` for
    ``0 <= u-i+left < k``.
    """
    k = w.shape[0]
    left = (k - 1) // 2
    i = jnp.arange(length)[:, None]
    u = jnp.arange(length)[None, :]
    j = u - i + left
    # Build via a constant one-hot basis rather than w[clip(j)]: the
    # gather's backward is a serialized scatter-add into [k] (profiled
    # ~32 us per layer per scan step); the contraction's backward is a
    # dense reduce over the loop-invariant basis.
    basis = (j[None, :, :] == jnp.arange(k)[:, None, None])
    return jnp.einsum("s,sfu->fu", w, basis.astype(w.dtype))


def temporal_related_attn(p, mode, attn_mean, conv_mode: bool):
    """The gated temporal attention (ref modules.py:251-325).

    mode: 0=while (identity), 1=before, 2=after, 3=between — nonzero modes
    run a learned 3-layer stack with per-mode parameters.
    """
    midx = jnp.maximum(mode - 1, 0)
    if conv_mode:
        F = attn_mean.shape[-1]
        t1 = jax.vmap(lambda w: conv1d_same_matrix(w, F))(p["c1_w"])[midx]
        t2 = jax.vmap(lambda w: conv1d_same_matrix(w, F))(p["c2_w"])[midx]
        t3 = jax.vmap(lambda w: conv1d_same_matrix(w, F))(p["c3_w"])[midx]
        h = jax.nn.relu(t1 @ attn_mean + p["c1_b"][midx])
        h = jax.nn.relu(t2 @ h + p["c2_b"][midx])
        out = jax.nn.sigmoid(t3 @ h + p["c3_b"][midx])
    else:
        h = jax.nn.relu(attn_mean @ p["l1_w"][midx] + p["l1_b"][midx])
        h = jax.nn.relu(h @ p["l2_w"][midx] + p["l2_b"][midx])
        out = jax.nn.sigmoid(h @ p["l3_w"][midx] + p["l3_b"][midx])
    return jnp.where(mode == 0, attn_mean, out)


def temporal_related_attn_batched(p, mode, attn_mean, conv_mode: bool):
    """Batched ``temporal_related_attn``: mode [B] int, attn_mean [B, F].

    The per-mode parameter gathers (``w[midx]``) become one-hot
    contractions: under vmap a per-example gather from a [3, ...] table
    backward-lowers to a SERIALIZED per-example scatter-add (measured
    ~13 ms/step at B=128) — computing all three modes densely and
    selecting is ~100x cheaper at these shapes.
    """
    B, F = attn_mean.shape
    midx = jnp.maximum(mode - 1, 0)
    oh = jax.nn.one_hot(midx, 3, dtype=attn_mean.dtype)      # [B, 3]

    if conv_mode:
        def layer(x, w, b, act):
            t = jax.vmap(lambda ww: conv1d_same_matrix(ww, F))(w)  # [3,F,F]
            y = jnp.einsum("bu,mfu->bmf", x, t)                    # [B,3,F]
            y = jnp.einsum("bm,bmf->bf", oh, y) + (oh @ b)[:, None]
            return act(y)

        h = layer(attn_mean, p["c1_w"], p["c1_b"], jax.nn.relu)
        h = layer(h, p["c2_w"], p["c2_b"], jax.nn.relu)
        out = layer(h, p["c3_w"], p["c3_b"], jax.nn.sigmoid)
    else:
        def layer(x, w, b, act):
            y = jnp.einsum("bu,muf->bmf", x, w)
            y = jnp.einsum("bm,bmf->bf", oh, y) + jnp.einsum(
                "bm,mf->bf", oh, b
            )
            return act(y)

        h = layer(attn_mean, p["l1_w"], p["l1_b"], jax.nn.relu)
        h = layer(h, p["l2_w"], p["l2_b"], jax.nn.relu)
        out = layer(h, p["l3_w"], p["l3_b"], jax.nn.sigmoid)
    return jnp.where((mode == 0)[:, None], attn_mean, out)


def temporal_module(
    p, mode, frames, attn_mean, mask, conv_mode, rate, rng, deterministic
):
    """ref modules.py:310-327 — returns (new frames [F, H], related attn [F])."""
    related = temporal_related_attn(p, mode, attn_mean, conv_mode) * mask
    h = jax.nn.relu(linear(p["dense"], related[:, None] * frames))
    h = dropout(h, rate, rng, deterministic)
    return layer_norm(p["ln"], h), related


def attnvideo_module(frames, attn):
    """ref modules.py:330-340."""
    return attn[:, None] * frames


def _filter_mlp(w1, b1, w2, b2, frames, rate, rng, deterministic):
    r1, r2 = jax.random.split(rng)
    h = dropout(jax.nn.relu(frames @ w1 + b1), rate, r1, deterministic)
    return dropout(jax.nn.relu(h @ w2 + b2), rate, r2, deterministic)


def filter_module_vec(
    p, frames, kw, mask, rate, rng, deterministic, attention="parity"
):
    """ref modules.py:343-378, tensor-keyword path -> [H].

    'parity' replicates the reference's degenerate uniform attention (the
    softmax normalizes a [F, 1] tensor along the singleton axis); 'softmax'
    is the corrected masked softmax over frames.
    """
    feat = _filter_mlp(
        p["repr_w1"], p["repr_b1"], p["repr_w2"], p["repr_b2"],
        frames, rate, rng, deterministic,
    )                                               # [F, H]
    if attention == "parity":
        weights = mask[:, None]
    else:
        fk = jnp.concatenate(
            [feat, jnp.broadcast_to(kw[None, :], feat.shape)], axis=1
        )
        logits = (fk @ p["attn_w"] + p["attn_b"])[:, 0]     # [F]
        weights = masked_softmax(logits, mask)[:, None]
    pooled = jnp.sum(weights * feat * mask[:, None], axis=0)
    return jax.nn.relu(linear(p["dense"], pooled))


def filter_module_kw(p, frames, kw_index, mask, rate, rng, deterministic):
    """ref modules.py:369-377, type-keyword path: per-type MLP + sum-pool."""
    w1 = p["kw_w1"][kw_index]
    b1 = p["kw_b1"][kw_index]
    w2 = p["kw_w2"][kw_index]
    b2 = p["kw_b2"][kw_index]
    feat = _filter_mlp(w1, b1, w2, b2, frames, rate, rng, deterministic)
    pooled = jnp.sum(feat * mask[:, None], axis=0)
    return jax.nn.relu(linear(p["dense"], pooled))


def filterframe_module_vec(p, frames, kw, mask, rate, rng, deterministic):
    """ref modules.py:381-414, tensor-keyword path -> [F, H]."""
    r1, r2 = jax.random.split(rng)
    feat = _filter_mlp(
        p["repr_w1"], p["repr_b1"], p["repr_w2"], p["repr_b2"],
        frames, rate, r1, deterministic,
    )
    fk = jnp.concatenate(
        [feat, jnp.broadcast_to(kw[None, :], feat.shape)], axis=1
    )
    gate = jax.nn.sigmoid(fk @ p["attn_w"] + p["attn_b"])   # [F, 1]
    gated = gate * feat
    out = jax.nn.relu(linear(p["dense"], gated))
    out = dropout(out, rate, r2, deterministic)
    return out * mask[:, None]


def filterframe_module_kw(p, frames, kw_index, mask, rate, rng, deterministic):
    """ref modules.py:405-413, type-keyword path -> [F, H]."""
    r1, r2 = jax.random.split(rng)
    w1 = p["kw_w1"][kw_index]
    b1 = p["kw_b1"][kw_index]
    w2 = p["kw_w2"][kw_index]
    b2 = p["kw_b2"][kw_index]
    feat = _filter_mlp(w1, b1, w2, b2, frames, rate, r1, deterministic)
    out = jax.nn.relu(linear(p["dense"], feat))
    out = dropout(out, rate, r2, deterministic)
    return out * mask[:, None]


def relate_module(p, mode_is_backward, attn, mask):
    """ref modules.py:417-435 — learned per-position shift, masked softmax."""
    F = attn.shape[0]
    beta = p["beta"][:F]
    shifted = jnp.where(mode_is_backward, attn - beta, attn + beta)
    return masked_softmax(shifted, mask)


# ---------------------------------------------------------------------------
# Parameter initialization (torch-default-compatible distributions)
# ---------------------------------------------------------------------------

def _uniform(rng, shape, bound):
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def _init_linear(rng, fan_in, fan_out):
    r1, r2 = jax.random.split(rng)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": _uniform(r1, (fan_in, fan_out), bound),
        "b": _uniform(r2, (fan_out,), bound),
    }


def init_module_params(rng, config) -> dict:
    """All module parameters for one model. ``config`` keys: hidden_size,
    max_video_length, dropout, object_types, have_pretrain_head."""
    H = config["hidden_size"]
    F = config["max_video_length"]
    conv_mode = F > 32
    keys = iter(jax.random.split(rng, 64))

    def lin(fi, fo):
        return _init_linear(next(keys), fi, fo)

    def stacked_lin(n, fi, fo):
        ws, bs = [], []
        for _ in range(n):
            p = _init_linear(next(keys), fi, fo)
            ws.append(p["w"])
            bs.append(p["b"])
        return jnp.stack(ws), jnp.stack(bs)

    params = {
        "compare": lin(2 * H, H),
        "equals": lin(2 * H, H),
        "xor": lin(3 * H, H),
        "query": {"l1": lin(H, H)},
        "toaction": {"l1": lin(2 * H, H), "l2": lin(H, H)},
        "hasitem": {"l1": lin(H, H), "l2": lin(H, 1)},
        "exists": {"l1": lin(3 * H, H), "l2": lin(H, H)},
        "localize": {"v1": lin(H, H), "v2": lin(H, H), "k": lin(H, H)},
        "superlative": {"dense": lin(H, H)},
        "relate": {"beta": jax.random.uniform(next(keys), (F,))},
    }

    # Temporal: three mode-parameterized layers (+ identity 'while').
    t: dict = {
        "dense": lin(H, H),
        "ln": {"scale": jnp.ones((H,)), "bias": jnp.zeros((H,))},
    }
    if conv_mode:
        k = round(F / 4)
        for name, ksize in (("c1", k), ("c2", k), ("c3", 2 * k + 1)):
            bound = 1.0 / np.sqrt(ksize)
            t[name + "_w"] = _uniform(next(keys), (3, ksize), bound)
            t[name + "_b"] = _uniform(next(keys), (3,), bound)
    else:
        for name in ("l1", "l2", "l3"):
            w, b = stacked_lin(3, F, F)
            t[name + "_w"] = w
            t[name + "_b"] = b
    params["temporal"] = t

    # Filter / FilterFrame: representation MLP + stacked type-keyword MLPs
    # (order: actions, objects, relations — matches TYPE_KEYWORDS).
    for name in ("filter", "filterframe"):
        repr1, repr2 = lin(H, H), lin(H, H)
        kw_w1, kw_b1 = stacked_lin(3, H, H)
        kw_w2, kw_b2 = stacked_lin(3, H, H)
        attn = lin(2 * H, 1)
        params[name] = {
            "repr_w1": repr1["w"], "repr_b1": repr1["b"],
            "repr_w2": repr2["w"], "repr_b2": repr2["b"],
            "kw_w1": kw_w1, "kw_b1": kw_b1, "kw_w2": kw_w2, "kw_b2": kw_b2,
            "attn_w": attn["w"], "attn_b": attn["b"],
            "dense": lin(H, H),
        }

    if config.get("have_pretrain_head", False):
        params["heads"] = {
            "equals": lin(H, 1),
            "exists": lin(H, 2),
            "xor": lin(H, 2),
            "query": lin(H, config["object_types"]),
            "filterframe": lin(H, config["object_types"]),
        }
    return params

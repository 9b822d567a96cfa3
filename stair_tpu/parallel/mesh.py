"""Mesh + sharding rules for the NMN training step.

The reference has no distributed support of its own (single GPU, batch 1 —
SURVEY §2 parallelism inventory); the TPU-native replacement is a
``jax.sharding.Mesh`` over ICI with

  * ``dp`` — data parallelism: every [B, ...] batch array is sharded on its
    leading axis; XLA inserts the gradient all-reduce;
  * ``tp`` — tensor parallelism: the answer decoder's vocab projection and
    the classifier head are sharded on their output axis (the largest
    matmuls in the model); GSPMD inserts the logits all-gather where the
    loss needs the full vocab row.

Everything else (module parameters: [H, H] with H=512) is replicated —
sharding 512-wide matmuls under-utilizes the MXU, so replication is the
faster layout at this model scale. The same rules compile unchanged on a
virtual CPU mesh (tests) and a real TPU slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 0, tp: int = 1, devices=None) -> Mesh:
    if devices is None:
        # Respect a pinned jax_default_device: plugin backends (axon TPU)
        # stay the default *backend* even when tests pin the CPU platform,
        # and a mesh must live on the platform the rest of the computation
        # uses — mixed-platform arguments are rejected by jit.
        default = getattr(jax.config, "jax_default_device", None)
        if default is not None:
            devices = jax.devices(default.platform)
        else:
            import os

            plats = os.environ.get("JAX_PLATFORMS", "")
            if plats:
                # The axon TPU plugin ignores JAX_PLATFORMS, so a forced
                # platform (e.g. CLI smoke runs / virtual CPU meshes with
                # xla_force_host_platform_device_count) must be honored
                # here explicitly or the mesh lands on the single tunnel
                # chip.
                devices = jax.devices(plats.split(",")[0])
            else:
                devices = jax.devices()
    if dp <= 0:
        dp = max(1, len(devices) // tp)
    need = dp * tp
    if need > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard every batch array on its leading (batch) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(params, mesh: Mesh):
    """Sharding pytree for the params: decoder vocab projection over tp,
    everything else replicated."""
    rep = replicated(mesh)

    tp = mesh.shape["tp"]

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "decoder" in names and "l2" in names:
            # Vocab axis must divide evenly (vocab sizes are arbitrary).
            if "w" in names and leaf.shape[1] % tp == 0:
                return NamedSharding(mesh, P(None, "tp"))
            if "b" in names and leaf.shape[0] % tp == 0:
                return NamedSharding(mesh, P("tp"))
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


def llm_param_sharding(params, mesh: Mesh):
    """Megatron-style sharding for the decoder-only LLM family.

    Per layer: q/k/v and up/gate projections shard their output axis over
    ``tp`` (head-parallel / ffn-parallel); o and down projections shard the
    input axis, so each layer needs exactly one all-reduce per sublayer
    (inserted by GSPMD). Embedding/vocab shard over tp when divisible;
    norms and biases replicate. The ``dp`` axis is used for batch sharding
    only.
    """
    rep = replicated(mesh)
    tp = mesh.shape["tp"]

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]

        def ok(axis):
            return leaf.ndim >= 1 and leaf.shape[axis] % tp == 0

        if "layers" in names and "w" in names:
            if any(n in names for n in ("q", "k", "v", "up", "gate")):
                if ok(1):
                    return NamedSharding(mesh, P(None, "tp"))
            if any(n in names for n in ("o", "down")):
                if ok(0):
                    return NamedSharding(mesh, P("tp", None))
        if names[-1:] == ["embed"] or "lm_head" in names:
            if leaf.ndim == 2 and leaf.shape[-1] % tp == 0 and "embed" not in names:
                return NamedSharding(mesh, P(None, "tp"))
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


#: Batch-dict keys whose leading axis is NOT the example axis (shared
#: tables / sparse slot arrays) — replicated rather than dp-sharded.
REPLICATED_BATCH_KEYS = frozenset({
    "class_emb", "class_emb_mask", "class_valid", "class_token_ids",
    "ff_index", "ff_gold", "ff_valid",
})


def shard_batch(batch_dict: dict, mesh: Mesh) -> dict:
    """Device-put a batch dict: example-axis arrays shard over dp, shared
    tables replicate."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    dp = mesh.shape["dp"]

    def put(key, x):
        if key in REPLICATED_BATCH_KEYS:
            return jax.device_put(x, rep)
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % dp == 0:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    out = {}
    for key, val in batch_dict.items():
        if isinstance(val, dict):
            out[key] = {k: put(k, v) for k, v in val.items()}
        else:
            out[key] = put(key, val)
    return out

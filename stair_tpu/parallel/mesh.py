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


def shard_batch(batch_dict: dict, mesh: Mesh) -> dict:
    """Device-put a batch dict with dp sharding on the leading axis."""
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch_dict)

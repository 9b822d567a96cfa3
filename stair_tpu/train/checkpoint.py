"""Checkpointing: params + config + optimizer state, with mid-run resume.

The reference pickles the whole torch module and saves best-only with no
optimizer state (yellow-binary-tree/STAIR ``train_module.py:212-216``), so
interrupted runs cannot resume. Here checkpoints are framework-neutral
msgpack pytrees (flax.serialization) with a JSON config sidecar:

  <dir>/params.msgpack, <dir>/opt_state.msgpack, <dir>/config.json,
  <dir>/trainer_state.json

``best_model/`` keeps the reference layout name so downstream tooling finds
it.
"""

from __future__ import annotations

import json
import os

import jax
from flax import serialization


def save_checkpoint(out_dir, params, config_dict, opt_state=None, trainer_state=None):
    os.makedirs(out_dir, exist_ok=True)
    params = jax.device_get(params)
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config_dict, f, indent=2)
    if opt_state is not None:
        with open(os.path.join(out_dir, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(opt_state)))
    if trainer_state is not None:
        with open(os.path.join(out_dir, "trainer_state.json"), "w") as f:
            json.dump(trainer_state, f)


def load_config(ckpt_dir) -> dict:
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        return json.load(f)


def load_params(ckpt_dir, template):
    """Load params into the structure of ``template``.

    Tolerant to model evolution: leaves present in both are restored
    (shapes must match); leaves only in the template keep their fresh
    initialization; leaves only in the checkpoint are ignored. Both cases
    are reported.
    """
    from flax import traverse_util

    with open(os.path.join(ckpt_dir, "params.msgpack"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    flat_t = traverse_util.flatten_dict(
        serialization.to_state_dict(template), sep="/"
    )
    flat_r = traverse_util.flatten_dict(raw, sep="/")
    missing = sorted(set(flat_t) - set(flat_r))
    extra = sorted(set(flat_r) - set(flat_t))
    if missing:
        print(f"checkpoint missing {len(missing)} leaves "
              f"(kept fresh init): {missing[:4]}...")
    if extra:
        print(f"checkpoint has {len(extra)} unused leaves: {extra[:4]}...")
    merged = {
        k: flat_r.get(k, v) for k, v in flat_t.items()
    }
    return serialization.from_state_dict(
        template, traverse_util.unflatten_dict(merged, sep="/")
    )


def load_opt_state(ckpt_dir, template):
    path = os.path.join(ckpt_dir, "opt_state.msgpack")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_trainer_state(ckpt_dir) -> dict | None:
    path = os.path.join(ckpt_dir, "trainer_state.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)

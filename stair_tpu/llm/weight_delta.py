"""Weight-delta distribution: publish fine-tunes as diffs against a base.

Equivalent of yellow-binary-tree/STAIR ``video_chatgpt/model/make_delta.py``
and ``consolidate.py``: a fine-tuned checkpoint is stored as per-leaf deltas
from the base model (newly-added leaves — projector, adapters, resized rows
— are stored whole), and applying the delta reconstructs the fine-tune.
Works on any msgpack param pytree in this framework.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from flax import serialization, traverse_util


def _flat(params):
    return traverse_util.flatten_dict(params, sep="/")


def make_delta(base: dict, finetuned: dict) -> dict:
    """finetuned - base per shared leaf; new/shape-changed leaves whole."""
    fb, ff = _flat(base), _flat(finetuned)
    delta = {}
    for key, val in ff.items():
        val = np.asarray(val)
        if key in fb and np.shape(fb[key]) == val.shape:
            delta[key] = val - np.asarray(fb[key])
        else:
            delta[key] = val  # new leaf: store whole
    return traverse_util.unflatten_dict(delta, sep="/")


def apply_delta(base: dict, delta: dict) -> dict:
    fb, fd = _flat(base), _flat(delta)
    out = {}
    for key, val in fd.items():
        val = np.asarray(val)
        if key in fb and np.shape(fb[key]) == val.shape:
            out[key] = np.asarray(fb[key]) + val
        else:
            out[key] = val
    return traverse_util.unflatten_dict(out, sep="/")


def _load(path):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _save(tree, path):
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(jax.device_get(tree)))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--func", choices=["make", "apply"], required=True)
    p.add_argument("--base", required=True)
    p.add_argument("--target", required=True,
                   help="fine-tuned params (make) or delta file (apply)")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)
    base = _load(args.base)
    target = _load(args.target)
    if args.func == "make":
        _save(make_delta(base, target), args.output)
    else:
        _save(apply_delta(base, target), args.output)
    print("wrote", args.output)


if __name__ == "__main__":
    main()

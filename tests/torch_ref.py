"""Helpers to load stair_tpu parameters into the reference PyTorch model.

Used by parity tests only: my JAX parameter pytree is converted into a torch
``state_dict`` for the reference ``VideoNMN`` so both implementations run
with identical weights and outputs can be compared bit-for-bit (up to f32
accumulation order).
"""

from __future__ import annotations

import numpy as np
import torch


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def _lin(sd, prefix, p):
    sd[prefix + ".weight"] = _t(p["w"]).T.contiguous()
    sd[prefix + ".bias"] = _t(p["b"])


def _lin_wb(sd, prefix, w, b):
    sd[prefix + ".weight"] = _t(w).T.contiguous()
    sd[prefix + ".bias"] = _t(b)


def _lstm(sd, prefix, p):
    for tag, d in (("", p["fwd"]), ("_reverse", p["bwd"])):
        sd[prefix + ".weight_ih_l0" + tag] = _t(d["wi"]).T.contiguous()
        sd[prefix + ".weight_hh_l0" + tag] = _t(d["wh"]).T.contiguous()
        sd[prefix + ".bias_ih_l0" + tag] = _t(d["bi"])
        sd[prefix + ".bias_hh_l0" + tag] = _t(d["bh"])


def params_to_state_dict(params, config) -> dict:
    """Map a stair_tpu params pytree onto reference VideoNMN state_dict keys."""
    m = params["modules"]
    sd: dict[str, torch.Tensor] = {}
    S = "submodules."

    _lin(sd, S + "Compare.param.0", m["compare"])
    _lin(sd, S + "Equals.param.0", m["equals"])
    _lin(sd, S + "Xor.param.0", m["xor"])
    # Query is unregistered in the reference NAME_TO_MODULE (dead code).
    _lin(sd, S + "ToAction.param.0", m["toaction"]["l1"])
    _lin(sd, S + "ToAction.param.3", m["toaction"]["l2"])
    _lin(sd, S + "HasItem.param.0", m["hasitem"]["l1"])
    _lin(sd, S + "HasItem.param.3", m["hasitem"]["l2"])
    _lin(sd, S + "Exists.param.0", m["exists"]["l1"])
    _lin(sd, S + "Exists.param.3", m["exists"]["l2"])

    loc = m["localize"]
    for owner in ("Localize", "Superlative.localize_module"):
        _lin(sd, S + owner + ".video_linear.0", loc["v1"])
        _lin(sd, S + owner + ".video_linear.3", loc["v2"])
        _lin(sd, S + owner + ".keyword_linear.0", loc["k"])
    _lin(sd, S + "Superlative.dense.0", m["superlative"]["dense"])

    t = m["temporal"]
    conv_mode = config["max_video_length"] > 32
    for i, mode in enumerate(("before", "after", "between")):
        if conv_mode:
            for li, name in ((0, "c1"), (2, "c2"), (4, "c3")):
                sd[S + f"Temporal.relate.{mode}.{li}.weight"] = _t(
                    t[name + "_w"][i]
                ).reshape(1, 1, -1)
                sd[S + f"Temporal.relate.{mode}.{li}.bias"] = _t(
                    t[name + "_b"][i]
                ).reshape(1)
        else:
            for li, name in ((0, "l1"), (2, "l2"), (4, "l3")):
                _lin_wb(sd, S + f"Temporal.relate.{mode}.{li}",
                        t[name + "_w"][i], t[name + "_b"][i])
    _lin(sd, S + "Temporal.dense.0", t["dense"])
    sd[S + "Temporal.layer_norm.weight"] = _t(t["ln"]["scale"])
    sd[S + "Temporal.layer_norm.bias"] = _t(t["ln"]["bias"])

    # Filter: representation + actions/objects/relations (stack order 0/1/2).
    f = m["filter"]
    _lin_wb(sd, S + "Filter.param.representation.0", f["repr_w1"], f["repr_b1"])
    _lin_wb(sd, S + "Filter.param.representation.3", f["repr_w2"], f["repr_b2"])
    for i, kw in enumerate(("actions", "objects", "relations")):
        _lin_wb(sd, S + f"Filter.param.{kw}.0", f["kw_w1"][i], f["kw_b1"][i])
        _lin_wb(sd, S + f"Filter.param.{kw}.3", f["kw_w2"][i], f["kw_b2"][i])
    _lin_wb(sd, S + "Filter.attention.0", f["attn_w"], f["attn_b"])
    _lin(sd, S + "Filter.dense.0", f["dense"])

    ff = m["filterframe"]
    _lin_wb(sd, S + "FilterFrame.param.representation.0", ff["repr_w1"], ff["repr_b1"])
    _lin_wb(sd, S + "FilterFrame.param.representation.3", ff["repr_w2"], ff["repr_b2"])
    for i, kw in ((0, "actions"), (2, "relations")):  # torch has no 'objects'
        _lin_wb(sd, S + f"FilterFrame.param.{kw}.0", ff["kw_w1"][i], ff["kw_b1"][i])
        _lin_wb(sd, S + f"FilterFrame.param.{kw}.3", ff["kw_w2"][i], ff["kw_b2"][i])
    _lin_wb(sd, S + "FilterFrame.attention.0", ff["attn_w"], ff["attn_b"])
    _lin(sd, S + "FilterFrame.dense.0", ff["dense"])

    sd[S + "Relate.beta"] = _t(m["relate"]["beta"])

    if config.get("have_pretrain_head"):
        h = m["heads"]
        _lin(sd, S + "Equals.pretrain_head", h["equals"])
        _lin(sd, S + "Exists.pretrain_head", h["exists"])
        _lin(sd, S + "Xor.pretrain_head", h["xor"])
        _lin(sd, S + "FilterFrame.pretrain_head", h["filterframe"])

    _lstm(sd, S + "video_encoder", params["video_encoder"])
    _lstm(sd, S + "text_encoder", params["text_encoder"])
    _lin(sd, S + "decoder.0", params["decoder"]["l1"])
    _lin(sd, S + "decoder.3", params["decoder"]["l2"])
    return sd


def build_reference_model(params, config, pretrain_modules=()):
    """Instantiate the reference VideoNMN with my weights, in eval mode."""
    from video_nmn.module_net import VideoNMN as TorchVideoNMN

    model = TorchVideoNMN(config, pretrain_modules=set(pretrain_modules))
    sd = params_to_state_dict(params, config)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # Only dead-weight keys may be missing (e.g. FilterFrame 'objects' MLP).
    assert not unexpected, f"unexpected keys: {unexpected}"
    assert not missing, f"missing keys: {missing}"
    model.eval()
    return model

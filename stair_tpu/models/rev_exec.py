"""Reversible executor scan: custom-VJP register machine for training.

The executor's registers are SSA (``ir/lowering.py``: every real register
is written exactly once; the scratch slot only ever receives values no one
reads), which makes the instruction scan *reversible*: the register files
BEFORE step ``t`` are recovered from the files AFTER it by re-zeroing the
slots step ``t`` wrote. The backward pass therefore needs **no stacked
carries and no stacked residuals** — it walks the trace in reverse,
reconstructing each step's input registers exactly (zeroing is exact in
any float dtype) and re-running the step under ``jax.vjp``.

Why this beats ``lax.scan`` + ``jax.checkpoint`` autodiff for this model:

  * no [T, B, N, F, H] carry stack is written in the forward pass or
    re-read in the backward (SSA reconstruction replaces it);
  * both directions address registers with slice-sized gathers/scatters
    ([B, F, H] per operand) instead of the one-hot contractions/blends
    the differentiable path needs (a one-hot read/write streams the whole
    [B, N, F, H] file; its transpose streams it again) — the transposes
    are hand-written here, so the "scatter-add in the backward" problem
    that forced one-hot (``models/nmn.py reg_read``) never appears;
  * the step's math is replayed from the reconstructed registers — the
    same recompute ``jax.checkpoint`` would do, minus the bookkeeping.

Gradient parity with the autodiff path is regression-tested
(``tests/test_rev_exec.py``). Reference behavior being trained:
yellow-binary-tree/STAIR ``video_nmn/module_net.py:94-133`` (the eager
per-example interpreter this compiled register machine replaces).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from stair_tpu.ops import regslots


def _use_slot_kernels():
    """On-TPU slot writes default to the Pallas aliased kernels
    (ops/regslots.py) — XLA materializes a full register-file copy around
    every scatter here, measured on v5e. STAIR_REV_SLOTS=0 falls back to
    XLA scatters on all platforms (measurement escape hatch)."""
    return os.environ.get("STAIR_REV_SLOTS", "1") != "0"


def _take(file, idx):
    """file [B, N, ...], idx [B] -> [B, ...] (slot gather)."""
    return jnp.take_along_axis(
        file, idx.reshape((-1,) + (1,) * (file.ndim - 1)), axis=1
    )[:, 0]


def _set(file, idx, val):
    """file[b, idx[b]] = val[b]. (b, idx[b]) pairs are unique and sorted
    along b, so XLA lowers this to a vectorized in-place update."""
    if _use_slot_kernels():
        return regslots.slot_set(file, idx, val)
    b = jnp.arange(file.shape[0])
    return file.at[b, idx].set(val, unique_indices=True,
                               indices_are_sorted=True)


def _zero(file, idx):
    if _use_slot_kernels():
        return regslots.slot_zero(file, idx)
    b = jnp.arange(file.shape[0])
    return file.at[b, idx].set(0.0, unique_indices=True,
                               indices_are_sorted=True)


def _add(file, idx, val):
    if _use_slot_kernels():
        return regslots.slot_add(file, idx, val)
    b = jnp.arange(file.shape[0])
    return file.at[b, idx].add(val, unique_indices=True,
                               indices_are_sorted=True)


def _gather_operands(regs, f):
    """The 7 register reads of one step, for the whole batch."""
    rv, rf, ra = regs
    return (
        _take(rv, f["va"]), _take(rv, f["vb"]), _take(rv, f["vc"]),
        _take(rf, f["fa"]), _take(rf, f["fb"]),
        _take(ra, f["aa"]), _take(ra, f["ab"]),
    )


def _scatter_writes(regs, f, new):
    """The 4 register writes of one step (order matters: attn_b last,
    matching the differentiable path's blend order)."""
    rv, rf, ra = regs
    new_vec, new_frames, new_attn, new_attn_b = new
    rv = _set(rv, f["out_vec"], new_vec)
    rf = _set(rf, f["out_frames"], new_frames)
    ra = _set(ra, f["out_attn"], new_attn)
    ra = _set(ra, f["out_attn_b"], new_attn_b)
    return rv, rf, ra


def _init_regs(core, video0):
    B = video0.shape[0]
    dt = video0.dtype
    nv, nf, na = core.num_vec, core.num_frames, core.num_attn
    F, H = video0.shape[1], video0.shape[2]
    rv0 = jnp.zeros((B, nv + 1, H), dt)
    rf0 = jnp.zeros((B, nf + 1, F, H), dt)
    rf0 = rf0.at[:, 0].set(video0)
    ra0 = jnp.zeros((B, na + 1, F), dt)
    return rv0, rf0, ra0


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def rev_exec(core, diff, ints):
    """Run the executor scan with the reversible backward.

    ``core`` is a static carrier (``RevCore``) holding the step function
    and register-file geometry; ``diff`` the differentiable inputs
    ``(video0, mods, tables, tokens, tmask, vmask, aux)``; ``ints`` the
    integer/PRNG inputs ``(fields, example_rngs, heavy_rng)`` with
    ``fields`` the [T, B] trace field dict. Returns final (rv, rf, ra).
    """
    return _fwd_scan(core, diff, ints)


class RevCore:
    """Static step carrier. ``step(operands, consts, f_t, t, aux_t,
    example_rngs, heavy_rng) -> (new_vec, new_frames, new_attn,
    new_attn_b)`` must close over ONLY static configuration — every traced
    value reaches it through the arguments (a closure tracer would leak
    into the deferred backward trace)."""

    def __init__(self, step, num_vec, num_frames, num_attn):
        self.step = step
        self.num_vec = num_vec
        self.num_frames = num_frames
        self.num_attn = num_attn


def _fwd_scan(core, diff, ints):
    video0, mods, tables, tokens, tmask, vmask, aux = diff
    fields, ex_rngs, h_rng = ints
    T = aux.shape[0]
    consts = (mods, tables, tokens, tmask, vmask)

    def body(regs, sc):
        f_t, t, aux_t = sc
        ops = _gather_operands(regs, f_t)
        new = core.step(ops, consts, f_t, t, aux_t, ex_rngs, h_rng)
        return _scatter_writes(regs, f_t, new), None

    regs, _ = jax.lax.scan(
        body, _init_regs(core, video0), (fields, jnp.arange(T), aux)
    )
    return regs


def _rev_fwd(core, diff, ints):
    finals = _fwd_scan(core, diff, ints)
    # Residuals: the final registers and the raw inputs — nothing per-step.
    return finals, (finals, diff, ints)


def _rev_bwd(core, res, ct):
    (rv, rf, ra), diff, ints = res
    video0, mods, tables, tokens, tmask, vmask, aux = diff
    fields, ex_rngs, h_rng = ints
    T = aux.shape[0]
    consts = (mods, tables, tokens, tmask, vmask)
    d_rv, d_rf, d_ra = ct

    zeros_consts = jax.tree_util.tree_map(jnp.zeros_like, consts)

    def body(carry, sc):
        rv, rf, ra, d_rv, d_rf, d_ra, d_consts = carry
        f_t, t, aux_t = sc

        # Output cotangents, extracted in reverse write order so an
        # attn slot written twice in one step (out_attn == out_attn_b,
        # only via scratch) credits the surviving write.
        d_new_attn_b = _take(d_ra, f_t["out_attn_b"])
        d_ra = _zero(d_ra, f_t["out_attn_b"])
        d_new_attn = _take(d_ra, f_t["out_attn"])
        d_ra = _zero(d_ra, f_t["out_attn"])
        d_new_frames = _take(d_rf, f_t["out_frames"])
        d_rf = _zero(d_rf, f_t["out_frames"])
        d_new_vec = _take(d_rv, f_t["out_vec"])
        d_rv = _zero(d_rv, f_t["out_vec"])

        # Reconstruct the step's INPUT register files: SSA slots were zero
        # before their write; the scratch slot's value is never read and
        # never consumed, so its reconstruction is free to be zero too.
        ra_p = _zero(_zero(ra, f_t["out_attn_b"]), f_t["out_attn"])
        rf_p = _zero(rf, f_t["out_frames"])
        rv_p = _zero(rv, f_t["out_vec"])

        ops = _gather_operands((rv_p, rf_p, ra_p), f_t)

        def replay(ops_, consts_, aux_t_):
            return core.step(ops_, consts_, f_t, t, aux_t_, ex_rngs, h_rng)

        _, vjp = jax.vjp(replay, ops, consts, aux_t)
        d_ops, d_consts_t, d_aux_t = vjp(
            (d_new_vec, d_new_frames, d_new_attn, d_new_attn_b)
        )

        d_rv = _add(d_rv, f_t["va"], d_ops[0])
        d_rv = _add(d_rv, f_t["vb"], d_ops[1])
        d_rv = _add(d_rv, f_t["vc"], d_ops[2])
        d_rf = _add(d_rf, f_t["fa"], d_ops[3])
        d_rf = _add(d_rf, f_t["fb"], d_ops[4])
        d_ra = _add(d_ra, f_t["aa"], d_ops[5])
        d_ra = _add(d_ra, f_t["ab"], d_ops[6])

        d_consts = jax.tree_util.tree_map(
            jnp.add, d_consts, d_consts_t
        )
        return (rv_p, rf_p, ra_p, d_rv, d_rf, d_ra, d_consts), d_aux_t

    carry0 = (rv, rf, ra, d_rv, d_rf, d_ra, zeros_consts)
    carry, d_aux = jax.lax.scan(
        body, carry0, (fields, jnp.arange(T), aux), reverse=True
    )
    _, _, _, d_rv, d_rf, d_ra, d_consts = carry
    d_mods, d_tables, d_tokens, d_tmask, d_vmask = d_consts
    # rf slot 0 held the (masked) encoded video; rv0/ra0 and the other
    # rf0 slots were internal zeros, so their cotangents are dropped.
    d_video0 = d_rf[:, 0]
    d_diff = (d_video0, d_mods, d_tables, d_tokens, d_tmask, d_vmask, d_aux)
    d_ints = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), ints
    )
    return d_diff, d_ints


rev_exec.defvjp(_rev_fwd, _rev_bwd)

"""Masked bidirectional LSTM via ``lax.scan``.

The reference encodes questions and videos with cuDNN BiLSTMs
(yellow-binary-tree/STAIR ``video_nmn/module_net.py:39-47``). On TPU the
input projection is hoisted out of the recurrence as one big MXU matmul
([L, D] @ [D, 4h]) and only the [h, 4h] recurrent matmul rides the scan.
Sequences are padded; masked steps carry state through unchanged, which makes
the final forward carry equal the state at the true last token and (running
the reverse direction over the reversed sequence) the final backward carry
equal the state at token 0 — exactly torch's ``h_n`` semantics for packed
sequences.

Gate layout follows torch: [input, forget, cell, output] chunks of size h.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def init_lstm_params(rng, input_size: int, hidden_size: int) -> dict:
    """One bidirectional layer. torch-style U(-1/sqrt(h), 1/sqrt(h)) init.

    Weights are stored transposed from torch: wi [D, 4h], wh [h, 4h]; torch's
    two bias vectors (b_ih, b_hh) are kept separate for exact parity.
    """
    bound = 1.0 / np.sqrt(hidden_size)
    keys = jax.random.split(rng, 8)

    def u(key, shape):
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

    def direction(ks):
        return {
            "wi": u(ks[0], (input_size, 4 * hidden_size)),
            "wh": u(ks[1], (hidden_size, 4 * hidden_size)),
            "bi": u(ks[2], (4 * hidden_size,)),
            "bh": u(ks[3], (4 * hidden_size,)),
        }

    return {"fwd": direction(keys[:4]), "bwd": direction(keys[4:])}


def _mm(a, b, mm_dtype):
    """Matmul, optionally running the MXU in a lower precision while
    accumulating (and carrying state) in float32."""
    if mm_dtype is None:
        return a @ b
    return jnp.dot(
        a.astype(mm_dtype), b.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )


def _direction_scan(p, x, mask, mm_dtype=None):
    """One direction over [L, D] with mask [L]; returns (h_seq [L, h], h_last)."""
    h_dim = p["wh"].shape[0]
    wh = p["wh"] if mm_dtype is None else p["wh"].astype(mm_dtype)
    if mm_dtype is None:
        x_proj = x @ p["wi"] + p["bi"] + p["bh"]    # [L, 4h], hoisted
        bias = None
    else:
        # Store the hoisted projection in the compute dtype: the f32
        # [L, 4h] stack is the encoder's dominant HBM stream (profiled
        # ~2 x 270 MB per direction per batch at B=1024/F=64 video
        # encode — ~1.5 ms/forward of write+readback). The bias sum is
        # re-added per step in f32 so only the matmul output is rounded.
        x_proj = _mm(x, p["wi"], mm_dtype).astype(mm_dtype)
        bias = (p["bi"] + p["bh"]).astype(jnp.float32)

    def step(carry, inp):
        h, c = carry
        gates_x, valid = inp
        if bias is not None:
            gates_x = gates_x.astype(jnp.float32) + bias
        gates = gates_x + _mm(h, wh, mm_dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        return (h, c), h

    init = (jnp.zeros((h_dim,)), jnp.zeros((h_dim,)))
    (h_last, _), h_seq = jax.lax.scan(step, init, (x_proj, mask[:, None]))
    return h_seq, h_last


def bilstm(params, x, mask, mm_dtype=None):
    """Run the BiLSTM on one sequence.

    Args:
      x: [L, D] padded sequence; mask: [L] validity.
      mm_dtype: optional lower precision for the matmuls (state and
        accumulation stay float32) — set by the model in bf16 compute mode.
    Returns:
      token_features [L, 2h] (zeroed on padding) and the sentence feature
      [2h] = concat(final forward state, final backward state).
    """
    fwd_seq, fwd_last = _direction_scan(params["fwd"], x, mask, mm_dtype)
    bwd_seq_rev, bwd_last = _direction_scan(
        params["bwd"], x[::-1], mask[::-1], mm_dtype
    )
    bwd_seq = bwd_seq_rev[::-1]
    tokens = jnp.concatenate([fwd_seq, bwd_seq], axis=-1) * mask[:, None]
    sentence = jnp.concatenate([fwd_last, bwd_last], axis=-1)
    return tokens, sentence


# ---------------------------------------------------------------------------
# Pallas BiLSTM (deterministic/eval forward)
# ---------------------------------------------------------------------------
#
# The scan-based path above is correct and differentiable, but on TPU its
# forward pays for the per-step output stacking: XLA materializes each
# direction's h_seq with one dynamic_update_slice per step into an
# [L, B, h] buffer and then transposes — profiled at ~5.4 ms/batch of the
# deterministic NMN forward at B=1024/F=64/H=512, as much as the whole
# executor megakernel. This kernel runs the recurrence with the (h, c)
# states in VMEM scratch that PERSISTS across a (batch-tile, time) grid:
# the input projection stays one big hoisted MXU matmul (done in XLA,
# outside), each grid step does only the [Bt, h] @ [h, 4h] recurrent
# matmul + gate math for BOTH directions (the backward direction reads
# its blocks through reversed index maps — no data reversal copies), and
# each token's output row is written once, straight to its final layout.
# Forward-only (no custom VJP): training keeps the differentiable scan,
# mirroring the executor kernels' gating.


def _bilstm_kernel(L, out_dtype, train=False):
    def kernel(xpf_ref, xpb_ref, mf_ref, mb_ref, whf_ref, whb_ref,
               bf_ref, bb_ref, tf_ref, tb_ref, sent_ref, *rest):
        if train:
            (hfst_ref, cfst_ref, hbst_ref, cbst_ref,
             hf_s, cf_s, hb_s, cb_s) = rest
        else:
            hfst_ref = cfst_ref = hbst_ref = cbst_ref = None
            hf_s, cf_s, hb_s, cb_s = rest
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _reset():
            hf_s[...] = jnp.zeros_like(hf_s)
            cf_s[...] = jnp.zeros_like(cf_s)
            hb_s[...] = jnp.zeros_like(hb_s)
            cb_s[...] = jnp.zeros_like(cb_s)

        def direction(xp_ref, m_ref, wh_ref, b_ref, h_s, c_s, tok_ref,
                      hst_ref, cst_ref):
            h, c = h_s[...], c_s[...]
            gates = (
                xp_ref[...].astype(jnp.float32)
                + b_ref[...].astype(jnp.float32)
                + jnp.dot(h.astype(wh_ref.dtype), wh_ref[...],
                          preferred_element_type=jnp.float32)
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            o = jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            # Mask rides a [L, 1, B] layout (time on the grid axis); the
            # [Bt] lane vector is relaid to a [Bt, 1] sublane column.
            valid = m_ref[0, 0, :].astype(jnp.float32)[:, None]
            h = jnp.where(valid > 0, h_new, h)
            c = jnp.where(valid > 0, c_new, c)
            h_s[...] = h
            c_s[...] = c
            # tokens are mask-zeroed (the scan path multiplies at the end).
            # Output rides [Bp, 1, L*h] ((Bt, 1, h) blocks): the singleton
            # keeps Mosaic's last-two-dims rule satisfied while letting a
            # downstream Pallas consumer (the executor megakernel) read
            # the SAME buffer with (1, 1, F*h) blocks — no XLA relayout
            # copy between the kernels (profiled 2 x 0.4 ms/fwd @ B=1024).
            tok_ref[...] = (h * valid).astype(out_dtype)[:, None, :]
            if hst_ref is not None:
                # Training residuals: the POST-MASK carried state, f32 —
                # exactly what the backward kernel needs to recompute each
                # step's gates/activations bit-identically (h enters the
                # recurrent matmul through the same dtype cast) with no
                # gate stacks stored.
                hst_ref[...] = h
                cst_ref[...] = c
            return h

        hf = direction(xpf_ref, mf_ref, whf_ref, bf_ref, hf_s, cf_s,
                       tf_ref, hfst_ref, cfst_ref)
        hb = direction(xpb_ref, mb_ref, whb_ref, bb_ref, hb_s, cb_s,
                       tb_ref, hbst_ref, cbst_ref)
        # Final carries = sentence feature (always f32); the block's
        # index map is constant over t, so only the last write hits HBM.
        hd = hf.shape[1]
        sent_ref[:, :hd] = hf
        sent_ref[:, hd:] = hb

    return kernel


def bilstm_pallas(params, x, mask, mm_dtype=None, interpret=False,
                  block_batch=512, token_dtype=jnp.float32,
                  return_halves=False):
    """Batched BiLSTM forward as one Pallas kernel.

    Args:
      x: [B, L, D] padded sequences; mask: [B, L] validity.
      mm_dtype: same contract as ``bilstm`` (matmul precision; state f32).
      token_dtype: dtype the kernel writes token rows in. Passing the
        model's compute dtype here rounds once (bitwise-identical to the
        scan path's f32 tokens followed by an .astype) and halves the
        write traffic; the sentence feature stays float32.
      return_halves: also return the per-direction token stacks
        ([B, L, h] fwd, [B, L, h] bwd) so a downstream kernel can consume
        them without materializing the concatenated [B, L, 2h] array.
    Returns:
      (token_features [B, L, 2h], sentence [B, 2h]) — tokens in
      ``token_dtype``, sentence float32 — numerically matching
      ``jax.vmap(bilstm)``'s hoisted-projection math; with
      ``return_halves``, a third element (tok_fwd, tok_bwd).

    Layout note (Mosaic wants the last two block dims (8k, 128k)-aligned
    or array-sized): time is flattened into the minor axis — xp ships as
    [B, L*4h] with (Bt, 4h) blocks column-indexed by the time grid axis,
    tokens come back as [B, L*h], and the mask rides [L, 1, B] so its
    per-step block is (1, 1, Bt).
    """
    B, L, _ = x.shape
    h = params["fwd"]["wh"].shape[0]
    xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b, (Bp, Bt) = _prep(
        params, x, mask, mm_dtype, block_batch
    )
    tok_f, tok_b, sent = _forward_call(
        L, h, Bp, Bt, token_dtype, interpret, False,
        xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b,
    )
    # Kernel outputs are [Bp, 1, L*h]; the 3-D view pays an XLA relayout
    # copy, so it is built lazily — flat halves go straight into the
    # executor megakernel and the copies are dead code in logits jits.
    flat_f, flat_b = tok_f[:B], tok_b[:B]
    tok_f = flat_f.reshape(B, L, h)
    tok_b = flat_b.reshape(B, L, h)
    tokens = jnp.concatenate([tok_f, tok_b], axis=-1)
    if return_halves == "flat":
        return tokens, sent[:B], (flat_f, flat_b)
    if return_halves:
        return tokens, sent[:B], (tok_f, tok_b)
    return tokens, sent[:B]


def _prep(params, x, mask, mm_dtype, block_batch):
    """Hoisted input projection + padding/packing (differentiable XLA)."""
    B, L, _ = x.shape
    h = params["fwd"]["wh"].shape[0]
    pf, pb = params["fwd"], params["bwd"]

    if mm_dtype is None:
        xp_f = x @ pf["wi"] + pf["bi"] + pf["bh"]
        xp_b = x @ pb["wi"] + pb["bi"] + pb["bh"]
        bias_f = jnp.zeros((1, 4 * h), jnp.float32)
        bias_b = jnp.zeros((1, 4 * h), jnp.float32)
        wh_f, wh_b = pf["wh"], pb["wh"]
    else:
        # Mirror _direction_scan's bf16 mode: the hoisted projection is
        # stored in the compute dtype WITHOUT bias; bias re-added in f32
        # per step so only the matmul output is rounded.
        xp_f = _mm(x, pf["wi"], mm_dtype).astype(mm_dtype)
        xp_b = _mm(x, pb["wi"], mm_dtype).astype(mm_dtype)
        bias_f = (pf["bi"] + pf["bh"]).astype(jnp.float32)[None, :]
        bias_b = (pb["bi"] + pb["bh"]).astype(jnp.float32)[None, :]
        wh_f = pf["wh"].astype(mm_dtype)
        wh_b = pb["wh"].astype(mm_dtype)

    # Mosaic wants the sublane dim 8-aligned (or array-sized); round the
    # tile up so small eval batches still lower on TPU.
    Bt = min(block_batch, -(-B // 8) * 8)
    pad = (-B) % Bt
    if pad:
        xp_f = jnp.pad(xp_f, ((0, pad), (0, 0), (0, 0)))
        xp_b = jnp.pad(xp_b, ((0, pad), (0, 0), (0, 0)))
        mask_p = jnp.pad(mask, ((0, pad), (0, 0)))
    else:
        mask_p = mask
    Bp = B + pad
    xp_f = xp_f.reshape(Bp, L * 4 * h)
    xp_b = xp_b.reshape(Bp, L * 4 * h)
    mask_t = mask_p.astype(jnp.float32).T[:, None, :]        # [L, 1, Bp]
    return xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b, (Bp, Bt)


def _forward_call(L, h, Bp, Bt, token_dtype, interpret, train,
                  xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b):
    """The forward pallas_call; with ``train`` also emits the f32 h/c
    state stacks per direction (backward-pass residuals)."""

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((Bt, 1, h), lambda i, t: (i, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 1, h), lambda i, t: (i, 0, L - 1 - t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, 2 * h), lambda i, t: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bp, 1, L * h), token_dtype),
        jax.ShapeDtypeStruct((Bp, 1, L * h), token_dtype),
        jax.ShapeDtypeStruct((Bp, 2 * h), jnp.float32),
    ]
    if train:
        # State stacks live in ORIGINAL position order for both
        # directions (the bwd direction's internal step t touches
        # position L-1-t, like its token output).
        out_specs += [
            pl.BlockSpec((Bt, h), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),          # hf stack
            pl.BlockSpec((Bt, h), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),          # cf stack
            pl.BlockSpec((Bt, h), lambda i, t: (i, L - 1 - t),
                         memory_space=pltpu.VMEM),          # hb stack
            pl.BlockSpec((Bt, h), lambda i, t: (i, L - 1 - t),
                         memory_space=pltpu.VMEM),          # cb stack
        ]
        out_shape += [
            jax.ShapeDtypeStruct((Bp, L * h), jnp.float32)
            for _ in range(4)
        ]

    return pl.pallas_call(
        _bilstm_kernel(L, token_dtype, train=train),
        grid=(Bp // Bt, L),
        in_specs=[
            pl.BlockSpec((Bt, 4 * h), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 4 * h), lambda i, t: (i, L - 1 - t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Bt), lambda i, t: (t, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Bt), lambda i, t: (L - 1 - t, 0, i),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Bt, h), jnp.float32),   # hf
            pltpu.VMEM((Bt, h), jnp.float32),   # cf
            pltpu.VMEM((Bt, h), jnp.float32),   # hb
            pltpu.VMEM((Bt, h), jnp.float32),   # cb
        ],
        interpret=interpret,
    )(xp_f, xp_b, mask_t, mask_t, wh_f, wh_b, bias_f, bias_b)


# ---------------------------------------------------------------------------
# Pallas BiLSTM training twin (hand-written backward)
# ---------------------------------------------------------------------------
#
# The training encoder used to ride the autodiff lax.scan, whose backward
# re-reads stacked residuals (gate activations + h/c carries, ~6 [L, B, h]
# f32 streams per direction) from HBM — the traffic the forward kernel
# proved was worth ~5.4 ms/batch (REPORT r3 #13). This twin stores only
# the two POST-MASK state stacks (h, c; f32) per direction and recomputes
# each step's gates in the backward from the stored h_{t-1} — the same
# [Bt, h] @ [h, 4h] matmul the forward paid, bit-identically (h enters
# through the same dtype cast), so the linearization point matches the
# forward exactly. The backward walks the time grid in reverse with the
# (dh, dc) adjoint state in VMEM scratch, emits per-step dgates straight
# into the dxp stacks (which XLA contracts against x / wi for the input
# projection grads), and accumulates dwh/dbias into constant-index-map
# f32 blocks (cross-tile reduction on-chip, one writeback).
#
# LSTM adjoint recurrences (masked steps carry the adjoint through
# unchanged, mirroring the forward's state carry):
#   dh_t       = dh_carry + dtok_t * valid_t
#   dc_new     = dc_carry * valid_t + dh_t * valid_t * o * (1 - tanh2(c_t))
#   dgates     = [di*i(1-i), df*f(1-f), dg(1-g2), do*o(1-o)]
#   dh_carry'  = dh_t * (1-valid_t) + dgates @ wh^T
#   dc_carry'  = dc_carry * (1-valid_t) + dc_new * f


def _bilstm_bwd_kernel(L):
    def kernel(xpf_ref, xpb_ref, mf_ref, mb_ref, whf_ref, whb_ref,
               bf_ref, bb_ref,
               hfp_ref, cfc_ref, cfp_ref,
               hbp_ref, cbc_ref, cbp_ref,
               dtf_ref, dtb_ref, dsent_ref,
               dxpf_ref, dxpb_ref, dwhf_o, dwhb_o, dbf_o, dbb_o,
               dhf_s, dcf_s, dhb_s, dcb_s):
        i_idx = pl.program_id(0)
        k = pl.program_id(1)
        h = dhf_s.shape[1]
        first = k == L - 1                   # both directions' step 0

        @pl.when((i_idx == 0) & (k == 0))
        def _init_wgrads():
            dwhf_o[...] = jnp.zeros_like(dwhf_o)
            dwhb_o[...] = jnp.zeros_like(dwhb_o)
            dbf_o[...] = jnp.zeros_like(dbf_o)
            dbb_o[...] = jnp.zeros_like(dbb_o)

        @pl.when(k == 0)
        def _init_adjoint():
            ds = dsent_ref[...].astype(jnp.float32)
            dhf_s[...] = ds[:, :h]
            dhb_s[...] = ds[:, h:]
            dcf_s[...] = jnp.zeros_like(dcf_s)
            dcb_s[...] = jnp.zeros_like(dcb_s)

        def direction(xp_ref, m_ref, wh_ref, b_ref, hp_ref, cc_ref,
                      cp_ref, dtok_ref, dxp_ref, dwh_o, db_o, dh_s,
                      dc_s):
            valid = m_ref[0, 0, :].astype(jnp.float32)[:, None]  # [Bt, 1]
            hp = jnp.where(first, 0.0, hp_ref[...])              # h_{t-1}
            cp = jnp.where(first, 0.0, cp_ref[...])              # c_{t-1}
            cc = cc_ref[...]                                     # c_t
            gates = (
                xp_ref[...].astype(jnp.float32)
                + b_ref[...].astype(jnp.float32)
                + jnp.dot(hp.astype(wh_ref.dtype), wh_ref[...],
                          preferred_element_type=jnp.float32)
            )
            ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
            ia = jax.nn.sigmoid(ig)
            fa = jax.nn.sigmoid(fg)
            oa = jax.nn.sigmoid(og)
            ga = jnp.tanh(gg)
            dh = dh_s[...] + dtok_ref[:, 0, :].astype(jnp.float32) * valid
            dh_new = dh * valid
            tc = jnp.tanh(cc)
            dc_new = dc_s[...] * valid + dh_new * oa * (1.0 - tc * tc)
            dgates = jnp.concatenate([
                dc_new * ga * ia * (1.0 - ia),
                dc_new * cp * fa * (1.0 - fa),
                dc_new * ia * (1.0 - ga * ga),
                dh_new * tc * oa * (1.0 - oa),
            ], axis=-1)                                          # [Bt, 4h]
            dxp_ref[...] = dgates.astype(dxp_ref.dtype)
            dwh_o[...] = dwh_o[...] + jax.lax.dot_general(
                hp.astype(wh_ref.dtype), dgates.astype(wh_ref.dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db_o[...] = db_o[...] + jnp.sum(dgates, axis=0,
                                            keepdims=True)
            dh_s[...] = dh * (1.0 - valid) + jax.lax.dot_general(
                dgates.astype(wh_ref.dtype), wh_ref[...],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dc_s[...] = dc_s[...] * (1.0 - valid) + dc_new * fa

        direction(xpf_ref, mf_ref, whf_ref, bf_ref, hfp_ref, cfc_ref,
                  cfp_ref, dtf_ref, dxpf_ref, dwhf_o, dbf_o, dhf_s,
                  dcf_s)
        direction(xpb_ref, mb_ref, whb_ref, bb_ref, hbp_ref, cbc_ref,
                  cbp_ref, dtb_ref, dxpb_ref, dwhb_o, dbb_o, dhb_s,
                  dcb_s)

    return kernel


def _backward_call(L, h, Bp, Bt, interpret,
                   xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b,
                   hf, cf, hb, cb, dtok_f, dtok_b, dsent):
    """Run the backward kernel over the reverse time grid."""

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def blk(index_map):
        return pl.BlockSpec((Bt, h), index_map, memory_space=pltpu.VMEM)

    def blk4(index_map):
        return pl.BlockSpec((Bt, 4 * h), index_map,
                            memory_space=pltpu.VMEM)

    # Grid axis k walks time in REVERSE for both directions: the fwd
    # direction's step t = L-1-k lives at position t; the bwd direction's
    # step t_b = L-1-k lives at position k (its stacks are stored in
    # position order, like its token output).
    dxp_f, dxp_b, dwh_f, dwh_b, dbf, dbb = pl.pallas_call(
        _bilstm_bwd_kernel(L),
        grid=(Bp // Bt, L),
        in_specs=[
            blk4(lambda i, k: (i, L - 1 - k)),               # xp_f @ t
            blk4(lambda i, k: (i, k)),                       # xp_b @ t_b
            pl.BlockSpec((1, 1, Bt), lambda i, k: (L - 1 - k, 0, i),
                         memory_space=pltpu.VMEM),           # mask fwd
            pl.BlockSpec((1, 1, Bt), lambda i, k: (k, 0, i),
                         memory_space=pltpu.VMEM),           # mask bwd
            full(), full(), full(), full(),                  # wh, bias
            blk(lambda i, k: (i, jnp.maximum(L - 2 - k, 0))),  # hf @ t-1
            blk(lambda i, k: (i, L - 1 - k)),                  # cf @ t
            blk(lambda i, k: (i, jnp.maximum(L - 2 - k, 0))),  # cf @ t-1
            blk(lambda i, k: (i, jnp.minimum(k + 1, L - 1))),  # hb @ t-1
            blk(lambda i, k: (i, k)),                          # cb @ t
            blk(lambda i, k: (i, jnp.minimum(k + 1, L - 1))),  # cb @ t-1
            pl.BlockSpec((Bt, 1, h), lambda i, k: (i, 0, L - 1 - k),
                         memory_space=pltpu.VMEM),             # dtok_f
            pl.BlockSpec((Bt, 1, h), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),             # dtok_b
            pl.BlockSpec((Bt, 2 * h), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),             # dsent
        ],
        out_specs=[
            blk4(lambda i, k: (i, L - 1 - k)),               # dxp_f
            blk4(lambda i, k: (i, k)),                       # dxp_b
            full(), full(), full(), full(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L * 4 * h), xp_f.dtype),
            jax.ShapeDtypeStruct((Bp, L * 4 * h), xp_b.dtype),
            jax.ShapeDtypeStruct((h, 4 * h), jnp.float32),
            jax.ShapeDtypeStruct((h, 4 * h), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * h), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, h), jnp.float32),   # dhf
            pltpu.VMEM((Bt, h), jnp.float32),   # dcf
            pltpu.VMEM((Bt, h), jnp.float32),   # dhb
            pltpu.VMEM((Bt, h), jnp.float32),   # dcb
        ],
        interpret=interpret,
    )(xp_f, xp_b, mask_t, mask_t, wh_f, wh_b, bias_f, bias_b,
      hf, cf, cf, hb, cb, cb, dtok_f, dtok_b, dsent)
    return dxp_f, dxp_b, dwh_f, dwh_b, dbf, dbb


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _train_core(L, h, Bp, Bt, token_dtype_name, interpret):
    """custom_vjp'd (xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b) ->
    (tok_f, tok_b, sent) for fixed geometry."""
    token_dtype = jnp.dtype(token_dtype_name)

    @jax.custom_vjp
    def core(xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b):
        out = _forward_call(L, h, Bp, Bt, token_dtype, interpret, False,
                            xp_f, xp_b, mask_t, wh_f, wh_b, bias_f,
                            bias_b)
        return out[0], out[1], out[2]

    def fwd(xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b):
        tok_f, tok_b, sent, hf, cf, hb, cb = _forward_call(
            L, h, Bp, Bt, token_dtype, interpret, True,
            xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b,
        )
        res = (xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b,
               hf, cf, hb, cb)
        return (tok_f, tok_b, sent), res

    def bwd(res, g):
        (xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b,
         hf, cf, hb, cb) = res
        dtok_f, dtok_b, dsent = g
        dxp_f, dxp_b, dwh_f, dwh_b, dbf, dbb = _backward_call(
            L, h, Bp, Bt, interpret,
            xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b,
            hf, cf, hb, cb,
            dtok_f.astype(token_dtype), dtok_b.astype(token_dtype),
            dsent.astype(jnp.float32),
        )
        return (dxp_f, dxp_b, jnp.zeros_like(mask_t),
                dwh_f.astype(wh_f.dtype), dwh_b.astype(wh_b.dtype),
                dbf.astype(bias_f.dtype), dbb.astype(bias_b.dtype))

    core.defvjp(fwd, bwd)
    return core


def bilstm_pallas_train(params, x, mask, mm_dtype=None, interpret=False,
                        block_batch=512, token_dtype=jnp.float32,
                        return_halves=False):
    """Differentiable batched BiLSTM as Pallas forward + backward kernels.

    Same contract as :func:`bilstm_pallas`, but with a hand-written
    backward (see the design note above), so TPU training no longer pays
    the autodiff scan's stacked-residual HBM traffic. Gradients flow to
    every parameter (wi/bi/bh via the XLA input projection in ``_prep``,
    wh/bias via the kernel's accumulators) and to ``x``.
    """
    B, L, _ = x.shape
    h = params["fwd"]["wh"].shape[0]
    xp_f, xp_b, mask_t, wh_f, wh_b, bias_f, bias_b, (Bp, Bt) = _prep(
        params, x, mask, mm_dtype, block_batch
    )
    core = _train_core(L, h, Bp, Bt, jnp.dtype(token_dtype).name,
                       bool(interpret))
    tok_f, tok_b, sent = core(xp_f, xp_b, mask_t, wh_f, wh_b,
                              bias_f, bias_b)
    tok_f = tok_f[:B, 0].reshape(B, L, h)
    tok_b = tok_b[:B, 0].reshape(B, L, h)
    tokens = jnp.concatenate([tok_f, tok_b], axis=-1)
    if return_halves:
        return tokens, sent[:B], (tok_f, tok_b)
    return tokens, sent[:B]


# ---------------------------------------------------------------------------
# Transformer encoder alternative (--encoder transformer)
# ---------------------------------------------------------------------------

def init_transformer_encoder_params(rng, input_size: int, hidden_size: int,
                                    num_layers: int = 2, num_heads: int = 4,
                                    max_len: int = 512) -> dict:
    """A small pre-norm transformer encoder with the BiLSTM's interface.

    The reference is LSTM-only; SURVEY §7 flags a transformer encoder as the
    config-flagged alternative — parallel over the sequence (no recurrence),
    which maps far better onto the MXU than a 64-step scan.
    """
    from stair_tpu.models.modules import _init_linear

    H = hidden_size
    keys = iter(jax.random.split(rng, 4 + 6 * num_layers))

    def lin(fi, fo):
        return _init_linear(next(keys), fi, fo)

    def ln():
        return {"scale": jnp.ones((H,)), "bias": jnp.zeros((H,))}

    return {
        "in_proj": lin(input_size, H),
        "pos": jax.random.normal(next(keys), (max_len, H)) * 0.02,
        "layers": [
            {
                "ln1": ln(),
                "q": lin(H, H), "k": lin(H, H), "v": lin(H, H),
                "o": lin(H, H),
                "ln2": ln(),
                "up": lin(H, 2 * H), "down": lin(2 * H, H),
            }
            for _ in range(num_layers)
        ],
        "ln_f": ln(),
    }


def transformer_encode(params, x, mask, num_heads: int = 4):
    """[L, D] + [L] mask -> (token_features [L, H], sentence feature [H]).

    Sentence feature = masked mean of token features (the transformer
    counterpart of the BiLSTM's final-state concat).
    """
    from stair_tpu.models.modules import layer_norm, linear

    L = x.shape[0]
    h = linear(params["in_proj"], x) + params["pos"][:L]
    heads = num_heads
    attn_mask = (mask > 0)[None, :]
    for layer in params["layers"]:
        a_in = layer_norm(layer["ln1"], h)
        hd = a_in.shape[-1] // heads
        q = linear(layer["q"], a_in).reshape(L, heads, hd)
        k = linear(layer["k"], a_in).reshape(L, heads, hd)
        v = linear(layer["v"], a_in).reshape(L, heads, hd)
        s = jnp.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
        s = jnp.where(attn_mask[None], s, -1e30)
        w = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", w, v).reshape(L, -1)
        h = h + linear(layer["o"], attn)
        m_in = layer_norm(layer["ln2"], h)
        h = h + linear(layer["down"], jax.nn.gelu(linear(layer["up"], m_in)))
    tokens = layer_norm(params["ln_f"], h) * mask[:, None]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    sentence = jnp.sum(tokens, axis=0) / denom
    return tokens, sentence

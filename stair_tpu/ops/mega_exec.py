"""Pallas executor MEGAKERNEL: the whole instruction scan in ONE kernel.

The fused per-step kernel (``ops/executor_step.py``) already moved the
heavy module families into VMEM, but the scan still paid per step for
B grid tiles, the XLA glue between kernels (operand gathers, temporal
bands, dense3, superlative heads, register writebacks) and an HBM round
trip of every register write. At B=1024 that fixed cost measured
~2.2 ms/step against ~0.4 ms of matmul.

This kernel runs ONE example's ENTIRE program per grid tile:

  * the three register files live in VMEM scratch for all T steps —
    zero inter-step HBM traffic (the files are written back once);
  * the per-step instruction fields ride an SMEM block (``[T, NSF]``
    int32 per example) driving ``pl.when``-predicated module branches —
    no XLA glue, no per-step sorting, no scalar prefetch tables;
  * every weight table is VMEM-resident across the whole grid (block
    index constant => fetched once);
  * SUPERLATIVE_F is computed exactly per example (its [F, F] cosine is
    tiny at F=64) — the batched path's B/8 capacity slice + overflow
    cond (``models/nmn.py supf_sliced``) disappears.

Dynamic register indexing follows the Mosaic rules learned on this
repo's earlier kernels: the frames file keeps its slot axis OUT of the
tiled last-two dims (rank-3 ``[N, F, H]`` scratch, ``pl.ds`` on dim 0),
while the small vec/attn files use one-hot reads and blended writes.

Deterministic/eval only (dropout-free); training keeps the tuned
ragged_dot scan. Reference behavior being replaced:
yellow-binary-tree/STAIR ``video_nmn/module_net.py:94-133`` (the Python
stack interpreter) plus every module in ``video_nmn/modules.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stair_tpu.ir.lowering import Opcode
from stair_tpu.models.modules import conv1d_same_matrix

# Scalar field columns in the per-example [T, NSF] SMEM block.
(F_OP, F_E1, F_VA, F_VB, F_VC, F_FA, F_FB, F_AA, F_AB, F_MODE, F_COUNT,
 F_SS, F_SE, F_OUT_V, F_OUT_F, F_OUT_A, F_OUT_AB) = range(17)
NSF = 17

_COS_EPS = 1e-8


def _i32(x):
    """Python int (possibly > 2^31) -> wrapped int32 constant."""
    return jnp.int32(np.int32(np.uint32(x)))


def hash_keep(shape, b, t, site, seed0, seed1, rate):
    """Deterministic counter-based dropout mask: [shape] f32 of
    {0, 1/(1-rate)}.

    A murmur3-style integer hash over (element index, example, step,
    site, seed) — identical bits in the forward and backward kernels
    (and under the Pallas interpreter, where pltpu.prng_* has no
    lowering), so masks are reproduced instead of stored. Quality needs
    are modest (independent Bernoulli keeps for dropout); the finalizer
    passes that bar.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    h = r * _i32(0x9E3779B1) + c * _i32(0x85EBCA77)
    h = h ^ (seed0 + b * _i32(0xC2B2AE3D) + t * _i32(0x27D4EB2F)
             + site * _i32(0x165667B1))
    h = h + seed1
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * _i32(0x85EBCA6B)
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * _i32(0xC2B2AE35)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    u = jax.lax.shift_right_logical(h, 8) & jnp.int32(0xFFFFFF)
    thresh = jnp.int32(int(rate * float(1 << 24)))
    return jnp.where(u >= thresh, jnp.float32(1.0 / (1.0 - rate)),
                     jnp.float32(0.0))


def _onehot_row(idx, n):
    """[n, 1] float32 one-hot column (Mosaic-safe 2-D iota)."""
    return (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
            == idx).astype(jnp.float32)


def _sel_vec(file_ref, idx):
    """One-hot read of row ``idx`` from a [N, D] scratch file -> [D] f32."""
    n = file_ref.shape[0]
    sel = _onehot_row(idx, n)
    return jnp.sum(file_ref[...].astype(jnp.float32) * sel, axis=0)


def _blend_write(file_ref, idx, value):
    """Blend ``value`` [D] into row ``idx`` of a [N, D] scratch file."""
    n = file_ref.shape[0]
    oh = _onehot_row(idx, n).astype(file_ref.dtype)
    v = value.astype(file_ref.dtype)
    file_ref[...] = file_ref[...] * (1.0 - oh) + oh * v[None, :]


def _cos_scalar(a, b):
    """torch CosineSimilarity on two [H] f32 vectors -> scalar f32."""
    na = jnp.sqrt(jnp.maximum(jnp.sum(a * a), 1e-30))
    nb = jnp.sqrt(jnp.maximum(jnp.sum(b * b), 1e-30))
    return jnp.sum(a * b) / jnp.maximum(na * nb, _COS_EPS)


def _masked_softmax_f(x, mask):
    """models.modules.masked_softmax over a [F] f32 row with bool mask."""
    neg = jnp.float32(-jnp.inf)
    xm = jnp.where(mask, x, neg)
    xm = xm - jnp.max(xm)
    e = jnp.where(mask, jnp.exp(xm), 0.0)
    return e / jnp.maximum(jnp.sum(e), 1e-30)


def _make_kernel(T, Nv, Nf, Na, F, H, L, dt, rate=0.0, train=False,
                 fsoft=False, flat=False):
    OP_PUSH = int(Opcode.PUSH_TEXT)
    OP_ANDV = int(Opcode.AND_VEC)
    OP_ANDA = int(Opcode.AND_ATTN)
    OP_CMP = int(Opcode.COMPARE)
    OP_EQ = int(Opcode.EQUALS)
    OP_CHOOSE = int(Opcode.CHOOSE)
    OP_XOR = int(Opcode.XOR)
    OP_XORF = int(Opcode.XORFRAME)
    OP_QUERY = int(Opcode.QUERY)
    OP_TOA = int(Opcode.TOACTION)
    OP_HAS = int(Opcode.HASITEM)
    OP_EX = int(Opcode.EXISTS)
    OP_EXF = int(Opcode.EXISTSFRAME)
    OP_LOC = int(Opcode.LOCALIZE)
    OP_SUPV = int(Opcode.SUPERLATIVE_V)
    OP_SUPF = int(Opcode.SUPERLATIVE_F)
    OP_TEMP = int(Opcode.TEMPORAL)
    OP_ATTNV = int(Opcode.ATTNVIDEO)
    OP_FV = int(Opcode.FILTER_V)
    OP_FK = int(Opcode.FILTER_K)
    OP_FFV = int(Opcode.FILTERFRAME_V)
    OP_FFK = int(Opcode.FILTERFRAME_K)
    OP_REL = int(Opcode.RELATE)

    def kernel(s_ref, vfa_ref, vfb_ref, vm_ref, toka_ref, tokb_ref,
               tm_ref, aux_ref,
               w1u_ref, b1u_ref, w2u_ref, b2u_ref, w2t_ref, b2t_ref,
               fdw_ref, fdb_ref, cw_ref, cb_ref, eqw_ref, eqb_ref,
               xw_ref, xb_ref, qw_ref, qb_ref, taw1_ref, tab1_ref,
               taw2_ref, tab2_ref, exw1_ref, exb1_ref, exw2_ref, exb2_ref,
               supw_ref, supb_ref, ffwf_ref, ffkw_ref, ffab_ref,
               fltw_ref, fltk_ref, fltb_ref,
               lns_ref, lnb_ref, beta_ref,
               t1_ref, t2_ref, t3_ref, tb1_ref, tb2_ref, tb3_ref,
               *rest):
        if train:
            seed_ref = rest[0]
            rest = rest[1:]
        (rv_out, rf_out, ra_out,
         rv_s, rf_s, ra_s, feat_s, nv_s) = rest
        vm = vm_ref[0, 0].astype(jnp.float32)                # [F]
        vmask_b = vm > 0

        if train and rate > 0.0:
            bidx = pl.program_id(0)

            def drop(x32, t, site):
                return x32 * hash_keep(
                    x32.shape, bidx, t, site,
                    seed_ref[0], seed_ref[1], rate,
                )
        else:
            def drop(x32, t, site):
                return x32

        # ---- register-file init ---------------------------------------
        # Encoded video arrives as the BiLSTM's two direction stacks;
        # the [F, H] concat happens here in VMEM instead of in an XLA
        # copy over HBM (the fused array is dead code in logits jits).
        # ``flat`` inputs are the LSTM kernel's [B, 1, F*Hh] buffers read
        # verbatim ((1, 1, F*Hh) blocks) and reshaped in VMEM — the XLA
        # relayout copy between the kernels disappears.
        Hh = H // 2

        def half(ref):
            if flat:
                return ref[0, 0].reshape(-1, Hh)
            return ref[0]

        rv_s[...] = jnp.zeros((Nv, H), dt)
        ra_s[...] = jnp.zeros((Na, F), dt)
        rf_s[...] = jnp.zeros((Nf, F, H), dt)
        video = jnp.concatenate(
            [half(vfa_ref), half(vfb_ref)], axis=-1
        )                                                    # [F, H] dt
        rf_s[0] = (video.astype(jnp.float32) * vm[:, None]).astype(dt)

        def lin_dt(x, w_ref, b_row):
            """dt matmul + dt bias add, mirroring modules.linear under
            the executor's compute dtype (one rounding after the MXU)."""
            y = jnp.dot(x.astype(dt), w_ref[...],
                        preferred_element_type=jnp.float32).astype(dt)
            return y + b_row.astype(dt)

        def step(t, _):
            def s(k):
                return s_ref[0, t, k]

            op = s(F_OP)
            e1 = s(F_E1)
            mode = s(F_MODE)
            count = s(F_COUNT)

            # ---- operand reads (one-hot for small files) --------------
            va = _sel_vec(rv_s, s(F_VA))                     # [H] f32
            vb = _sel_vec(rv_s, s(F_VB))
            aa = _sel_vec(ra_s, s(F_AA))                     # [F] f32
            ab = _sel_vec(ra_s, s(F_AB))
            fa = rf_s[pl.ds(s(F_FA), 1)][0]                  # [F, H] dt

            is_filter = (op >= OP_FV) & (op <= OP_FFK)
            is_ff = (op == OP_FFV) | (op == OP_FFK)

            # Every step writes zeros to out_attn/out_attn_b first and a
            # branch then overwrites its real slot — reproducing the XLA
            # path's unconditional register writes (whose zero defaults
            # land in the scratch slot) at [Na, F]-blend cost.
            _blend_write(ra_s, s(F_OUT_A), jnp.zeros((F,), dt))
            _blend_write(ra_s, s(F_OUT_AB), jnp.zeros((F,), dt))

            # ---- stage 1: expert two-layer frames MLP -----------------
            # (filter x8 | localize v1/v2 | null | hasitem) — identical
            # expert table layout to models/nmn.py _fused_tables.
            nv_s[...] = jnp.zeros((1, H), dt)

            @pl.when(e1 != 9)
            def _stage1():
                w1 = w1u_ref[pl.ds(e1, 1)][0]                # [H, H]
                b1 = b1u_ref[pl.ds(e1, 1)][0]                # [1, H]
                w2 = w2u_ref[pl.ds(e1, 1)][0]
                b2 = b2u_ref[pl.ds(e1, 1)][0]
                h = jnp.dot(fa, w1, preferred_element_type=jnp.float32)
                h = drop(
                    jax.nn.relu(h + b1.astype(jnp.float32)), t, 0
                ).astype(dt)
                h2 = jnp.dot(h, w2, preferred_element_type=jnp.float32)
                h2 = h2 + b2.astype(jnp.float32)             # [F, H] f32
                feat32 = jnp.where(
                    is_filter, drop(jax.nn.relu(h2), t, 1), h2
                )
                feat_s[...] = feat32.astype(dt)

            # ---- vec candidates ---------------------------------------
            # Every vec producer writes nv_s under predication; the
            # unconditional blend below then lands it (zeros for non-vec
            # ops, matching the XLA path's scratch-register write).
            @pl.when(op == OP_PUSH)
            def _push():
                pos = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
                tmv = tm_ref[0, 0]                           # [L] dt
                ss, se = s(F_SS), s(F_SE)
                valid = (tmv.astype(jnp.float32) > 0).astype(jnp.float32)
                in_span = ((pos[0] >= ss)
                           & (pos[0] < se)).astype(jnp.float32)
                span_w = jnp.where(ss < 0, valid,
                                   in_span * valid).astype(dt)
                # Span mean per direction stack, concatenated — column-
                # wise identical to the fused [L, H] dot.
                pa = jnp.dot(span_w[None, :], half(toka_ref),
                             preferred_element_type=jnp.float32)
                pb = jnp.dot(span_w[None, :], half(tokb_ref),
                             preferred_element_type=jnp.float32)
                push = (jnp.concatenate([pa, pb], axis=-1)
                        / jnp.maximum(jnp.sum(
                            span_w.astype(jnp.float32)), 1.0))[0]
                sel_t = (jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
                         == t).astype(jnp.float32)
                aux_row = jnp.sum(
                    aux_ref[0].astype(jnp.float32) * sel_t, axis=0
                )                                            # [H] f32
                nv_s[...] = jnp.where(
                    ss == -2, aux_row, push
                ).astype(dt)[None, :]

            @pl.when(op == OP_ANDV)
            def _and_vec():
                nv_s[...] = jnp.minimum(va, vb).astype(dt)[None, :]

            @pl.when(op == OP_CHOOSE)
            def _choose():
                vc = _sel_vec(rv_s, s(F_VC))
                take_first = _cos_scalar(va, vc) > _cos_scalar(vb, vc)
                nv_s[...] = jnp.where(
                    take_first, va, vb
                ).astype(dt)[None, :]

            @pl.when(op == OP_CMP)
            def _cmp():
                y = (jnp.dot(va.astype(dt)[None, :], cw_ref[:H],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(vb.astype(dt)[None, :], cw_ref[H:],
                               preferred_element_type=jnp.float32))
                nv_s[...] = jax.nn.relu(
                    y.astype(dt) + cb_ref[...].astype(dt)
                )

            @pl.when(op == OP_EQ)
            def _eq():
                y = (jnp.dot(va.astype(dt)[None, :], eqw_ref[:H],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(vb.astype(dt)[None, :], eqw_ref[H:],
                               preferred_element_type=jnp.float32))
                nv_s[...] = jax.nn.relu(
                    y.astype(dt) + eqb_ref[...].astype(dt)
                )

            @pl.when(op == OP_XOR)
            def _xor():
                d = jnp.abs(va - vb).astype(dt)[None, :]
                y = (jnp.dot(d, xw_ref[:H],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(va.astype(dt)[None, :], xw_ref[H:2 * H],
                               preferred_element_type=jnp.float32)
                     + jnp.dot(vb.astype(dt)[None, :], xw_ref[2 * H:],
                               preferred_element_type=jnp.float32))
                nv_s[...] = jax.nn.relu(
                    y.astype(dt) + xb_ref[...].astype(dt)
                )

            @pl.when(op == OP_QUERY)
            def _query():
                q = jax.nn.relu(lin_dt(va[None, :], qw_ref, qb_ref[...]))
                nv_s[...] = drop(
                    q.astype(jnp.float32), t, 4
                ).astype(dt)

            @pl.when(op == OP_TOA)
            def _toaction():
                y = (jnp.dot(va.astype(dt)[None, :], taw1_ref[:H],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(vb.astype(dt)[None, :], taw1_ref[H:],
                               preferred_element_type=jnp.float32))
                h = jax.nn.relu(y.astype(dt) + tab1_ref[...].astype(dt))
                h = drop(h.astype(jnp.float32), t, 5).astype(dt)
                nv_s[...] = jax.nn.relu(lin_dt(h, taw2_ref,
                                               tab2_ref[...]))

            @pl.when(op == OP_EX)
            def _exists():
                # exists_module: kw=va, feat=vb, x=[feat, kw, feat*kw].
                prod = (vb * va).astype(dt)[None, :]
                y = (jnp.dot(vb.astype(dt)[None, :], exw1_ref[:H],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(va.astype(dt)[None, :], exw1_ref[H:2 * H],
                               preferred_element_type=jnp.float32)
                     + jnp.dot(prod, exw1_ref[2 * H:],
                               preferred_element_type=jnp.float32))
                h = jax.nn.relu(y.astype(dt) + exb1_ref[...].astype(dt))
                h = drop(h.astype(jnp.float32), t, 6).astype(dt)
                ex = jax.nn.relu(lin_dt(h, exw2_ref, exb2_ref[...]))
                nv_s[...] = drop(
                    ex.astype(jnp.float32), t, 7
                ).astype(dt)

            @pl.when((op == OP_FV) | (op == OP_FK))
            def _filter():
                # Parity pooling: uniform sum over valid frames (the
                # reference's degenerate softmax), weights*feat*mask.
                # fsoft (--filter-attention softmax, the corrected
                # variant): FILTER_V pools with a masked softmax over
                # per-frame logits feat @ attn_w[:H] + (va @ attn_w[H:]
                # + attn_b) on the already-VMEM-resident feat tile
                # (mirrors models/nmn.py heavy_stages' softmax branch);
                # keyword-string filters (FILTER_K) keep parity pooling.
                if fsoft:
                    logits = jnp.dot(
                        feat_s[...], fltw_ref[...],
                        preferred_element_type=jnp.float32,
                    )[:, 0]                                  # [F] f32
                    kb = (jnp.dot(va.astype(dt)[None, :], fltk_ref[...],
                                  preferred_element_type=jnp.float32)
                          [0, 0]
                          + fltb_ref[...].astype(jnp.float32)[0, 0])
                    soft = _masked_softmax_f(logits + kb, vmask_b)
                    w = jnp.where(op == OP_FV, soft, vm)
                else:
                    w = vm
                pooled = jnp.sum(
                    feat_s[...].astype(jnp.float32)
                    * (w * vm)[:, None], axis=0
                )                                            # [H] f32
                nv_s[...] = jax.nn.relu(
                    lin_dt(pooled[None, :], fdw_ref, fdb_ref[...])
                )

            def _superlative(scores_f32, actions_dt, amask):
                """scores [K, F] f32 (already vm-scaled), actions [K, H]
                dt, amask [K, 1] bool -> [1, H] dt."""
                row = jnp.sum(scores_f32 * vm[None, :], axis=1,
                              keepdims=True)                 # [K, 1]
                neg = jnp.float32(-jnp.inf)
                xm = jnp.where(amask, row, neg)
                xm = xm - jnp.max(xm)
                e = jnp.where(amask, jnp.exp(xm), 0.0)
                w = e / jnp.maximum(jnp.sum(e), 1e-30)       # [K, 1]
                w = jnp.where(mode == 1, 1.0 - w, w)
                w = jnp.where(amask, w, 0.0)
                pooled = jnp.sum(
                    w * actions_dt.astype(jnp.float32), axis=0
                )                                            # [H]
                return jax.nn.relu(
                    lin_dt(pooled[None, :], supw_ref, supb_ref[...])
                )

            def _loc_cos(kw_dt):
                """Localize cosine of [1, H] dt keyword vs stage-1 feat:
                -> [F] f32 rescaled scores (mirrors executor_step.py)."""
                featf = feat_s[...].astype(jnp.float32)
                nf = jnp.sqrt(jnp.maximum(
                    jnp.sum(featf * featf, axis=1), 1e-30))
                kw32 = kw_dt.astype(jnp.float32)[0]
                nk = jnp.sqrt(jnp.maximum(jnp.sum(kw32 * kw32), 1e-30))
                dots = jnp.dot(featf, kw32[:, None],
                               preferred_element_type=jnp.float32)[:, 0]
                cos_k = (dots / jnp.maximum(nf * nk, 1e-8)).astype(dt)
                return (cos_k.astype(jnp.float32) + 1.0) * 0.49 * vm

            @pl.when(op == OP_SUPV)
            def _sup_v():
                ka = lin_dt(va[None, :], w2t_ref[2], b2t_ref[2])
                kb = lin_dt(vb[None, :], w2t_ref[2], b2t_ref[2])
                scores = jnp.concatenate(
                    [_loc_cos(ka)[None, :], _loc_cos(kb)[None, :]], axis=0
                )                                            # [2, F]
                actions = jnp.concatenate(
                    [va.astype(dt)[None, :], vb.astype(dt)[None, :]],
                    axis=0,
                )
                amask = (jax.lax.broadcasted_iota(jnp.int32, (2, 1), 0)
                         < count)
                nv_s[...] = _superlative(scores, actions, amask)

            @pl.when(op == OP_SUPF)
            def _sup_f():
                featf = feat_s[...].astype(jnp.float32)
                fb = rf_s[pl.ds(s(F_FB), 1)][0]              # [F, H] dt
                kw_f = lin_dt(fb, w2t_ref[2], b2t_ref[2])    # [F, H] dt
                # cosine_matrix(kw_f, feat): f32 dots + per-row norms.
                kf = kw_f.astype(jnp.float32)
                dots = jax.lax.dot_general(
                    kf, featf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                            # [F, F]
                nk = jnp.sqrt(jnp.maximum(jnp.sum(kf * kf, axis=1),
                                          1e-30))
                nf = jnp.sqrt(jnp.maximum(
                    jnp.sum(featf * featf, axis=1), 1e-30))
                cosm = (dots / jnp.maximum(nk[:, None] * nf[None, :],
                                           _COS_EPS)).astype(dt)
                scores = ((cosm.astype(jnp.float32) + 1.0) * 0.49
                          * vm[None, :])                     # [F, F]
                nv_s[...] = _superlative(scores, fb, vm[:, None] > 0)

            _blend_write(rv_s, s(F_OUT_V), nv_s[...][0])

            # ---- frames candidates ------------------------------------
            # Each frames producer stores its output slot directly; the
            # scratch slot only ever receives zeros in the XLA path, and
            # it starts zero here, so non-frames steps skip the write.
            @pl.when(is_ff)
            def _ffout():
                featf = feat_s[...].astype(jnp.float32)
                gk = (jnp.dot(va.astype(dt)[None, :], ffkw_ref[...],
                              preferred_element_type=jnp.float32)[0, 0]
                      + ffab_ref[...].astype(jnp.float32)[0, 0])
                glog = jnp.dot(feat_s[...], ffwf_ref[...],
                               preferred_element_type=jnp.float32)[:, 0]
                gate = jnp.where(op == OP_FFV,
                                 jax.nn.sigmoid(glog + gk), 1.0)
                x2 = (gate[:, None] * featf).astype(dt)
                y2 = jnp.dot(x2, w2t_ref[0],
                             preferred_element_type=jnp.float32)
                y2 = y2 + b2t_ref[0].astype(jnp.float32)
                rf_s[pl.ds(s(F_OUT_F), 1)] = (
                    drop(jax.nn.relu(y2), t, 2) * vm[:, None]
                ).astype(dt)[None]

            @pl.when(op == OP_TEMP)
            def _temporal():
                faf = fa.astype(jnp.float32)
                am = jnp.where(count == 2, (aa + ab) * 0.5, aa)  # [F] f32
                midx = jnp.maximum(mode - 1, 0)
                amd = am.astype(dt)[None, :]                 # [1, F]
                h1 = jax.nn.relu(
                    jnp.dot(amd, t1_ref[pl.ds(midx, 1)][0],
                            preferred_element_type=jnp.float32)
                    + tb1_ref[pl.ds(midx, 1)][0].astype(jnp.float32)
                ).astype(dt)
                h2 = jax.nn.relu(
                    jnp.dot(h1, t2_ref[pl.ds(midx, 1)][0],
                            preferred_element_type=jnp.float32)
                    + tb2_ref[pl.ds(midx, 1)][0].astype(jnp.float32)
                ).astype(dt)
                g = jax.nn.sigmoid(
                    jnp.dot(h2, t3_ref[pl.ds(midx, 1)][0],
                            preferred_element_type=jnp.float32)
                    + tb3_ref[pl.ds(midx, 1)][0].astype(jnp.float32)
                )[0]                                         # [F] f32
                related = jnp.where(mode == 0, am, g) * vm
                # Stash for the out_attn_b write below (same dtype rules
                # as temporal_related_attn_batched * vmask).
                x2 = (related[:, None] * faf).astype(dt)
                y2 = jnp.dot(x2, w2t_ref[1],
                             preferred_element_type=jnp.float32)
                y2 = y2 + b2t_ref[1].astype(jnp.float32)
                ry = drop(jax.nn.relu(y2), t, 2)
                mu = jnp.mean(ry, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(ry - mu), axis=-1,
                               keepdims=True)
                ln = (ry - mu) * jax.lax.rsqrt(var + 1e-5)
                ln = (ln * lns_ref[...].astype(jnp.float32)
                      + lnb_ref[...].astype(jnp.float32))
                rf_s[pl.ds(s(F_OUT_F), 1)] = ln.astype(dt)[None]
                # related also feeds ra[out_attn_b] (overwrites the zero
                # blend above, which runs before all branches).
                _blend_write(ra_s, s(F_OUT_AB), related.astype(dt))

            @pl.when(op == OP_ATTNV)
            def _attnvideo():
                rf_s[pl.ds(s(F_OUT_F), 1)] = (
                    aa[:, None] * fa.astype(jnp.float32)
                ).astype(dt)[None]

            # ---- attn candidates (each predicated; the zero blends at
            # the top of the step already emulated the XLA default) -----
            @pl.when((op == OP_ANDA) | (op == OP_XORF))
            def _attn_elem():
                v = jnp.where(op == OP_ANDA, jnp.minimum(aa, ab),
                              jnp.abs(aa - ab))
                _blend_write(ra_s, s(F_OUT_A), v.astype(dt))

            @pl.when(op == OP_HAS)
            def _hasitem():
                # sigmoid of stage-1 expert-10 column 0.
                col = feat_s[...].astype(jnp.float32)[:, 0]
                hv = drop(jax.nn.sigmoid(col)[None, :], t, 3)[0]
                _blend_write(ra_s, s(F_OUT_A), (hv * vm).astype(dt))

            @pl.when(op == OP_EXF)
            def _existsframe():
                faf = fa.astype(jnp.float32)
                dot = jnp.sum(faf * va[None, :], axis=1)
                nx = jnp.sqrt(jnp.maximum(
                    jnp.sum(faf * faf, axis=1), 1e-30))
                nv_ = jnp.sqrt(jnp.maximum(jnp.sum(va * va), 1e-30))
                cos = dot / jnp.maximum(nx * nv_, _COS_EPS)
                _blend_write(ra_s, s(F_OUT_A),
                             ((cos + 1.0) * 0.49 * vm).astype(dt))

            @pl.when(op == OP_REL)
            def _relate():
                beta = beta_ref[0].astype(jnp.float32)       # [F]
                shifted = jnp.where(mode == 1, aa - beta, aa + beta)
                _blend_write(
                    ra_s, s(F_OUT_A),
                    _masked_softmax_f(shifted, vmask_b).astype(dt),
                )

            @pl.when(op == OP_LOC)
            def _localize():
                ka = lin_dt(va[None, :], w2t_ref[2], b2t_ref[2])
                kb = lin_dt(vb[None, :], w2t_ref[2], b2t_ref[2])
                _blend_write(ra_s, s(F_OUT_A), _loc_cos(ka).astype(dt))
                _blend_write(ra_s, s(F_OUT_AB), _loc_cos(kb).astype(dt))

            return 0

        jax.lax.fori_loop(0, T, step, 0)

        rv_out[0] = rv_s[...]
        rf_out[0] = rf_s[...]
        ra_out[0] = ra_s[...]

    return kernel


def prepare_args(cfg, mods, tables, trace_fields, video_halves,
                 video_mask, token_halves, token_mask, aux_vec=None):
    """Pack the executor's inputs into the kernel argument tuple.

    Kept as a separate (fully differentiable) XLA stage so the training
    path can wrap ONLY the pallas_call in a custom VJP — the concat/cast
    /banding transposes here are then handled by autodiff, and the
    hand-written backward kernel only owes gradients for the prepared
    arrays. Returns ``(meta, args)`` with ``meta`` a hashable geometry
    tuple consumed by ``forward_call``.
    """
    vf_a, vf_b = video_halves
    tok_a, tok_b = token_halves
    # Flat halves ([B, 1, F*Hh] / [B, 1, L*Hh], straight off the Pallas
    # BiLSTM) are detected by the singleton middle axis; geometry then
    # comes from the model config.
    flat = vf_a.ndim == 3 and vf_a.shape[1] == 1 and (
        vf_a.shape[2] > vf_a.shape[1])
    if flat:
        B = vf_a.shape[0]
        F = cfg.max_video_length
        Hh = vf_a.shape[2] // F
        L = tok_a.shape[2] // Hh
        assert vf_a.shape == (B, 1, F * Hh), (vf_a.shape, F, Hh)
        assert tok_a.shape == (B, 1, L * Hh)
    else:
        B, F, Hh = vf_a.shape
        L = tok_a.shape[1]
        assert tok_a.shape[-1] == Hh and tok_b.shape == tok_a.shape
    H = 2 * Hh
    assert vf_b.shape == vf_a.shape
    T = trace_fields["opcode"].shape[1]
    dt = vf_a.dtype
    Nv, Nf, Na = cfg.num_vec + 1, cfg.num_frames + 1, cfg.num_attn + 1

    # ---- scalar pack: [B, T, NSF] int32 --------------------------------
    op = trace_fields["opcode"]
    mode = trace_fields["mode"]
    is_ff = (op == int(Opcode.FILTERFRAME_V)) | (
        op == int(Opcode.FILTERFRAME_K))
    is_filter = is_ff | (op == int(Opcode.FILTER_V)) | (
        op == int(Opcode.FILTER_K))
    is_kw = (op == int(Opcode.FILTER_K)) | (
        op == int(Opcode.FILTERFRAME_K))
    is_locsup = ((op == int(Opcode.LOCALIZE))
                 | (op == int(Opcode.SUPERLATIVE_V))
                 | (op == int(Opcode.SUPERLATIVE_F)))
    e1 = jnp.where(
        is_filter,
        jnp.where(is_ff, 4, 0) + jnp.where(is_kw, 1 + mode, 0),
        jnp.where(is_locsup, 8,
                  jnp.where(op == int(Opcode.HASITEM), 10, 9)),
    )
    scal = jnp.stack([
        op, e1, trace_fields["va"], trace_fields["vb"],
        trace_fields["vc"], trace_fields["fa"], trace_fields["fb"],
        trace_fields["aa"], trace_fields["ab"], mode,
        trace_fields["count"], trace_fields["span_start"],
        trace_fields["span_end"], trace_fields["out_vec"],
        trace_fields["out_frames"], trace_fields["out_attn"],
        trace_fields["out_attn_b"],
    ], axis=-1).astype(jnp.int32)                            # [B, T, NSF]

    # ---- temporal band matrices (hoisted; tiny) -------------------------
    tmp = mods["temporal"]
    if cfg.conv_temporal:
        def bands(w):
            return jax.vmap(
                lambda ww: conv1d_same_matrix(ww, F).T
            )(w).astype(dt)

        t1m, t2m, t3m = bands(tmp["c1_w"]), bands(tmp["c2_w"]), bands(
            tmp["c3_w"])
        tb1 = jnp.broadcast_to(
            tmp["c1_b"][:, None, None], (3, 1, F)).astype(dt)
        tb2 = jnp.broadcast_to(
            tmp["c2_b"][:, None, None], (3, 1, F)).astype(dt)
        tb3 = jnp.broadcast_to(
            tmp["c3_b"][:, None, None], (3, 1, F)).astype(dt)
    else:
        t1m, t2m, t3m = (tmp["l1_w"].astype(dt), tmp["l2_w"].astype(dt),
                         tmp["l3_w"].astype(dt))
        tb1 = tmp["l1_b"][:, None, :].astype(dt)
        tb2 = tmp["l2_b"][:, None, :].astype(dt)
        tb3 = tmp["l3_b"][:, None, :].astype(dt)

    if aux_vec is None:
        aux_vec = jnp.zeros((B, T, H), dt)

    ffw = mods["filterframe"]["attn_w"].astype(dt)           # [2H, 1]
    flw = mods["filter"]["attn_w"].astype(dt)                # [2H, 1]
    fsoft = getattr(cfg, "filter_attention", "parity") == "softmax"

    def row(x):
        return jnp.asarray(x, dt).reshape(1, -1)

    args = (
        scal,
        vf_a, vf_b,
        video_mask.astype(dt).reshape(B, 1, F),
        tok_a, tok_b,
        token_mask.astype(dt).reshape(B, 1, L),
        aux_vec.astype(dt),
        tables["w1u"], tables["b1u"][:, None, :],
        tables["w2u"], tables["b2u"][:, None, :],
        tables["w2t"], tables["b2t"][:, None, :],
        tables["dense3"][0], row(tables["db3"][0]),
        mods["compare"]["w"].astype(dt), row(mods["compare"]["b"]),
        mods["equals"]["w"].astype(dt), row(mods["equals"]["b"]),
        mods["xor"]["w"].astype(dt), row(mods["xor"]["b"]),
        mods["query"]["l1"]["w"].astype(dt), row(mods["query"]["l1"]["b"]),
        mods["toaction"]["l1"]["w"].astype(dt),
        row(mods["toaction"]["l1"]["b"]),
        mods["toaction"]["l2"]["w"].astype(dt),
        row(mods["toaction"]["l2"]["b"]),
        mods["exists"]["l1"]["w"].astype(dt), row(mods["exists"]["l1"]["b"]),
        mods["exists"]["l2"]["w"].astype(dt), row(mods["exists"]["l2"]["b"]),
        mods["superlative"]["dense"]["w"].astype(dt),
        row(mods["superlative"]["dense"]["b"]),
        ffw[:H], ffw[H:],
        jnp.asarray(mods["filterframe"]["attn_b"], dt).reshape(1, 1),
        flw[:H], flw[H:],
        jnp.asarray(mods["filter"]["attn_b"], dt).reshape(1, 1),
        row(tmp["ln"]["scale"]), row(tmp["ln"]["bias"]),
        row(mods["relate"]["beta"][:F]),
        t1m, t2m, t3m, tb1, tb2, tb3,
    )
    meta = (B, T, Nv, Nf, Na, F, H, Hh, L, jnp.dtype(dt).name, fsoft,
            flat)
    return meta, args


def forward_call(meta, args, interpret=False, rate=0.0, seed=None):
    """The forward pallas_call over prepared args (see prepare_args).

    ``seed`` ([2] int32) switches on TRAIN mode: hash-counter dropout at
    ``rate`` is applied at the same sites as the XLA training path
    (``models/nmn.py heavy_stages`` / the per-module functions), with
    masks derived from (seed, example, step, site) so the backward
    kernel (``ops/mega_grad.py``) reproduces them instead of storing.
    """
    B, T, Nv, Nf, Na, F, H, Hh, L, dt_name, fsoft, flat = meta
    dt = jnp.dtype(dt_name)
    train = seed is not None

    def im_example(i):
        return (i, 0, 0)

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    if flat:
        vspec = pl.BlockSpec((1, 1, F * Hh), im_example,
                             memory_space=pltpu.VMEM)
        tspec = pl.BlockSpec((1, 1, L * Hh), im_example,
                             memory_space=pltpu.VMEM)
    else:
        vspec = pl.BlockSpec((1, F, Hh), im_example,
                             memory_space=pltpu.VMEM)
        tspec = pl.BlockSpec((1, L, Hh), im_example,
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, T, NSF), im_example, memory_space=pltpu.SMEM),
        vspec, vspec,
        pl.BlockSpec((1, 1, F), im_example, memory_space=pltpu.VMEM),
        tspec, tspec,
        pl.BlockSpec((1, 1, L), im_example, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, H), im_example, memory_space=pltpu.VMEM),
    ] + [full() for _ in range(len(args) - 8)]
    if train:
        args = tuple(args) + (jnp.asarray(seed, jnp.int32),)
        in_specs = in_specs + [pl.BlockSpec(memory_space=pltpu.SMEM)]

    kernel = _make_kernel(T, Nv, Nf, Na, F, H, L, dt,
                          rate=rate if train else 0.0, train=train,
                          fsoft=fsoft, flat=flat)
    rv, rf, ra = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, Nv, H), im_example, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nf, F, H), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Na, F), im_example, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Nv, H), dt),
            jax.ShapeDtypeStruct((B, Nf, F, H), dt),
            jax.ShapeDtypeStruct((B, Na, F), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nv, H), dt),        # rv_s
            pltpu.VMEM((Nf, F, H), dt),     # rf_s
            pltpu.VMEM((Na, F), dt),        # ra_s
            pltpu.VMEM((F, H), dt),         # feat_s
            pltpu.VMEM((1, H), dt),         # nv_s
        ],
        # The resident weight tables (~12 MB at H=512 bf16) plus the
        # register files exceed Mosaic's default 16 MB scoped-vmem cap;
        # v5e has 128 MB of physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return rv, rf, ra


def mega_exec(cfg, mods, tables, trace_fields, video_halves, video_mask,
              token_halves, token_mask, aux_vec=None, interpret=False):
    """Run the whole executor scan as one Pallas kernel.

    Inputs mirror ``VideoNMN.run_trace``'s scan state: ``trace_fields``
    is the [B, T] int32 field dict, ``video_halves`` /``token_halves``
    are the BiLSTM direction stacks ((fwd, bwd) [B, F|L, H/2] dt pairs —
    concatenated in VMEM, so no fused [.., H] array is materialized),
    masks [B, F]/[B, L], ``aux_vec`` [B, T, H] or None. Returns the
    three final register files (rv [B, Nv+1, H], rf [B, Nf+1, F, H],
    ra [B, Na+1, F]) in dt.
    """
    meta, args = prepare_args(
        cfg, mods, tables, trace_fields, video_halves, video_mask,
        token_halves, token_mask, aux_vec=aux_vec,
    )
    return forward_call(meta, args, interpret=interpret)

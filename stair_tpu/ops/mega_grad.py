"""Hand-written backward for the executor megakernel (training path).

The forward megakernel (``ops/mega_exec.py``) runs one example's entire
program per grid tile with the three register files resident in VMEM.
Because the register machine is SSA (every instruction writes fresh
slots; the per-file scratch slot only ever receives zeros), the FINAL
register files contain every step's output — so the backward needs no
stacked residuals at all: it re-reads operands from the final files,
recomputes each step's cheap forward intermediates in VMEM, and walks
the instructions in reverse, accumulating

  * gradient register files (VMEM scratch, f32) that flow operand
    cotangents from consumers back to producers,
  * weight-table gradients into f32 output blocks with CONSTANT index
    maps (the block stays VMEM-resident across the whole grid, i.e. the
    cross-example reduction happens on-chip and is written back once),
  * data cotangents (video/token direction stacks, aux vectors) into
    per-example blocks.

Dropout masks are NOT stored: both kernels derive them from the same
counter-based hash (``mega_exec.hash_keep``) keyed on
(seed, example, step, site), so the backward reproduces the forward's
masks bit-for-bit — including under the Pallas interpreter, where
``pltpu.prng_*`` has no lowering.

This replaces the autodiff of the XLA ragged_dot scan
(``models/nmn.py heavy_stages``/``scan_body``), whose backward was
dominated by register-file one-hot contraction transposes and
[T, B, F, H] residual re-reads. Reference behavior being differentiated:
yellow-binary-tree/STAIR ``video_nmn/module_net.py:94-133`` plus every
module in ``video_nmn/modules.py``, under the training dropout sites of
``video_nmn/modules.py`` (rate applied after each hidden ReLU).

Gradient conventions mirror JAX/XLA exactly where they are observable:
``min(a,b)`` splits ties 0.5/0.5, ``|x|`` has slope +1 at 0, masked
softmax uses the standard jacobian (the max-subtraction is detached),
and the cosine eps-clamps zero their branch of the quotient rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stair_tpu.ir.lowering import Opcode
from stair_tpu.ops.mega_exec import (
    NSF, F_OP, F_E1, F_VA, F_VB, F_VC, F_FA, F_FB, F_AA, F_AB, F_MODE,
    F_COUNT, F_SS, F_SE, F_OUT_V, F_OUT_F, F_OUT_A, F_OUT_AB,
    _COS_EPS, hash_keep, forward_call,
)

# args-tuple layout (see mega_exec.prepare_args): 8 data entries then 38
# weight entries. Gradients are owed for DATA_GRAD_IDX and all weights.
N_DATA = 8
DATA_GRAD_IDX = (1, 2, 4, 5, 7)      # vf_a, vf_b, tok_a, tok_b, aux

import os as _os
_SKIP = frozenset(
    s for s in _os.environ.get("STAIR_MEGA_BWD_SKIP", "").split(",") if s
)
if _SKIP:  # debugging aid only: gradients are silently WRONG with it set
    import warnings

    warnings.warn(
        "STAIR_MEGA_BWD_SKIP is set (%s): the training megakernel will "
        "SKIP those backward branches and produce wrong gradients. This "
        "is a kernel-debugging knob, never a training configuration."
        % ",".join(sorted(_SKIP)),
        stacklevel=2,
    )


def _onehot_col(idx, n):
    """[n, 1] f32 one-hot column."""
    return (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
            == idx).astype(jnp.float32)


def _gt0(x):
    """relu-slope mask of a possibly-bf16 preactivation, compared in f32.

    Mosaic on v5e has no bf16 vector cmpf ("Target does not support this
    comparison" on vector<8x128x2xbf16>); bf16->f32 is exact, so the f32
    comparison is bitwise-identical to the forward's dt-precision relu
    threshold."""
    return (x.astype(jnp.float32) > 0).astype(jnp.float32)


def _vsum(x32):
    """Mosaic-safe scalar sum of a 1-D f32 vector.

    A plain ``jnp.sum`` of a lane-vector that was itself produced by an
    axis-1 reduction carries an implicit-dim layout
    (``{*,0},(8,128),-2``) whose lane reduction fails to lower
    ("Not implemented: Offset change"). Reducing the transposed column
    along sublanes lowers cleanly (verified against plain/keepdims/
    broadcast forms, which all fail on v7x Mosaic)."""
    return jnp.sum(x32[:, None], axis=0, keepdims=True)[0, 0]


def _vdot(a32, b32):
    """Mosaic-safe sum(a*b) of 1-D f32 vectors (see ``_vsum``)."""
    return _vsum(a32 * b32)


def _make_bwd_kernel(T, Nv, Nf, Na, F, H, L, dt, rate, train,
                     fsoft=False):
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
    Hh = H // 2

    def kernel(*refs):
        it = iter(refs)

        def nxt():
            return next(it)

        # ---- inputs (same order as the forward args) --------------------
        s_ref = nxt()
        vfa_ref, vfb_ref, vm_ref = nxt(), nxt(), nxt()
        toka_ref, tokb_ref, tm_ref, aux_ref = nxt(), nxt(), nxt(), nxt()
        w1u_ref, b1u_ref, w2u_ref, b2u_ref = nxt(), nxt(), nxt(), nxt()
        w2t_ref, b2t_ref = nxt(), nxt()
        fdw_ref, fdb_ref = nxt(), nxt()
        cw_ref, cb_ref = nxt(), nxt()
        eqw_ref, eqb_ref = nxt(), nxt()
        xw_ref, xb_ref = nxt(), nxt()
        qw_ref, qb_ref = nxt(), nxt()
        taw1_ref, tab1_ref, taw2_ref, tab2_ref = (nxt(), nxt(), nxt(),
                                                  nxt())
        exw1_ref, exb1_ref, exw2_ref, exb2_ref = (nxt(), nxt(), nxt(),
                                                  nxt())
        supw_ref, supb_ref = nxt(), nxt()
        ffwf_ref, ffkw_ref, ffab_ref = nxt(), nxt(), nxt()
        fltw_ref, fltk_ref, fltb_ref = nxt(), nxt(), nxt()
        lns_ref, lnb_ref, beta_ref = nxt(), nxt(), nxt()
        t1_ref, t2_ref, t3_ref = nxt(), nxt(), nxt()
        tb1_ref, tb2_ref, tb3_ref = nxt(), nxt(), nxt()
        seed_ref = nxt() if train else None
        rv_ref, rf_ref, ra_ref = nxt(), nxt(), nxt()
        drv_ref, drf_ref, dra_ref = nxt(), nxt(), nxt()
        # ---- outputs ----------------------------------------------------
        # Video/token cotangents leave the kernel FULL-WIDTH ([.., H]);
        # the XLA wrapper splits them into direction halves. In-kernel
        # [:, Hh:] lane slices are not lane-aligned at small H and
        # Mosaic rejects the offset change.
        dvid_o, dtok_o, daux_o = nxt(), nxt(), nxt()
        dw1u_o, db1u_o, dw2u_o, db2u_o = nxt(), nxt(), nxt(), nxt()
        dw2t_o, db2t_o = nxt(), nxt()
        dfdw_o, dfdb_o = nxt(), nxt()
        dcw_o, dcb_o = nxt(), nxt()
        deqw_o, deqb_o = nxt(), nxt()
        dxw_o, dxb_o = nxt(), nxt()
        dqw_o, dqb_o = nxt(), nxt()
        dtaw1_o, dtab1_o, dtaw2_o, dtab2_o = (nxt(), nxt(), nxt(),
                                              nxt())
        dexw1_o, dexb1_o, dexw2_o, dexb2_o = (nxt(), nxt(), nxt(),
                                              nxt())
        dsupw_o, dsupb_o = nxt(), nxt()
        dffwf_o, dffkw_o, dffab_o = nxt(), nxt(), nxt()
        dfltw_o, dfltk_o, dfltb_o = nxt(), nxt(), nxt()
        dlns_o, dlnb_o, dbeta_o = nxt(), nxt(), nxt()
        dt1_o, dt2_o, dt3_o = nxt(), nxt(), nxt()
        dtb1_o, dtb2_o, dtb3_o = nxt(), nxt(), nxt()
        # ---- scratch ----------------------------------------------------
        grv_s, grf_s, gra_s = nxt(), nxt(), nxt()
        feat_s, h_s, gfeat_s = nxt(), nxt(), nxt()
        dtok_s, daux_s = nxt(), nxt()
        try:
            nxt()
        except StopIteration:
            pass
        else:  # pragma: no cover - arity guard
            raise AssertionError("extra kernel refs")

        b = pl.program_id(0)

        def when(cond, name):
            """pl.when, skippable via STAIR_MEGA_BWD_SKIP (TPU-lowering
            bisection aid; empty in production)."""
            if name in _SKIP:
                return lambda f: None
            return pl.when(cond)
        wgrad_outs = (
            dw1u_o, db1u_o, dw2u_o, db2u_o, dw2t_o, db2t_o, dfdw_o,
            dfdb_o, dcw_o, dcb_o, deqw_o, deqb_o, dxw_o, dxb_o, dqw_o,
            dqb_o, dtaw1_o, dtab1_o, dtaw2_o, dtab2_o, dexw1_o, dexb1_o,
            dexw2_o, dexb2_o, dsupw_o, dsupb_o, dffwf_o, dffkw_o,
            dffab_o, dfltw_o, dfltk_o, dfltb_o, dlns_o, dlnb_o, dbeta_o,
            dt1_o, dt2_o, dt3_o, dtb1_o, dtb2_o, dtb3_o,
        )

        @pl.when(b == 0)
        def _init_wgrads():
            for o in wgrad_outs:
                o[...] = jnp.zeros_like(o)

        vm = vm_ref[0, 0].astype(jnp.float32)                 # [F]
        vmask_b = vm > 0
        grv_s[...] = drv_ref[0].astype(jnp.float32)
        grf_s[...] = drf_ref[0].astype(jnp.float32)
        gra_s[...] = dra_ref[0].astype(jnp.float32)
        dtok_s[...] = jnp.zeros((L, H), jnp.float32)
        daux_s[...] = jnp.zeros((T, H), jnp.float32)

        if train and rate > 0.0:
            def dmask(shape, t, site):
                return hash_keep(shape, b, t, site, seed_ref[0],
                                 seed_ref[1], rate)
        else:
            def dmask(shape, t, site):
                return jnp.ones(shape, jnp.float32)

        def selv32(file_ref, idx):
            n = file_ref.shape[0]
            sel = _onehot_col(idx, n)
            return jnp.sum(file_ref[...].astype(jnp.float32) * sel,
                           axis=0)

        def acc_row(file_s, idx, val32):
            """file_s [n, D] f32 scratch += one_hot(idx) * val32 [D]."""
            oh = _onehot_col(idx, file_s.shape[0])
            file_s[...] = file_s[...] + oh * val32[None, :]

        def acc_rf(idx, val32):
            grf_s[pl.ds(idx, 1)] = (grf_s[pl.ds(idx, 1)]
                                    + val32[None].astype(jnp.float32))

        def lin_dt(x, w_ref, b_row):
            y = jnp.dot(x.astype(dt), w_ref[...],
                        preferred_element_type=jnp.float32).astype(dt)
            return y + b_row.astype(dt)

        def mm(x32, w):
            """x [m, K] @ w [K, N] -> [m, N] f32 (dt operands, f32 acc)."""
            return jax.lax.dot_general(
                x32.astype(dt), w.astype(dt), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def mmT(g32, w):
            """g [m, N] @ w^T for w [K, N] -> [m, K] f32."""
            return jax.lax.dot_general(
                g32.astype(dt), w.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def outer(x32, g32):
            """x [m, K]^T @ g [m, N] -> [K, N] f32."""
            return jax.lax.dot_general(
                x32.astype(dt), g32.astype(dt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def acc_const(out_ref, val32):
            out_ref[...] = out_ref[...] + val32

        def acc_expert(out_ref, e, val32):
            out_ref[pl.ds(e, 1)] = out_ref[pl.ds(e, 1)] + val32[None]

        def cos_rows_bwd(g, rows32, kw32):
            """VJP of per-row cosine(rows [F, H], kw [H]) -> [F].

            Returns (g_rows [F, H], g_kw [H]). Mirrors modules.cosine:
            norms are sqrt(max(ss, 1e-30)), denominator max(nx*nk, eps).
            """
            dots = jnp.sum(rows32 * kw32[None, :], axis=1)       # [F]
            ssr = jnp.sum(rows32 * rows32, axis=1)
            ssk = jnp.sum(kw32 * kw32)
            nr = jnp.sqrt(jnp.maximum(ssr, 1e-30))
            nk = jnp.sqrt(jnp.maximum(ssk, 1e-30))
            den = jnp.maximum(nr * nk, _COS_EPS)
            gdot = g / den
            gden = jnp.where(nr * nk > _COS_EPS,
                             -g * dots / (den * den), 0.0)
            gnr = jnp.where(ssr > 1e-30, gden * nk / (2.0 * nr), 0.0)
            gnk_tot = _vdot(gden, nr)
            gssk = jnp.where(ssk > 1e-30, gnk_tot / (2.0 * nk), 0.0)
            g_rows = (gdot[:, None] * kw32[None, :]
                      + 2.0 * gnr[:, None] * rows32)
            g_kw = (jnp.sum(gdot[:, None] * rows32, axis=0)
                    + 2.0 * gssk * kw32)
            return g_rows, g_kw

        def cos_matrix_bwd(g, kf32, featf32):
            """VJP of cosine_matrix(kf [F, H], featf [F, H]) -> [F, F]."""
            dots = jax.lax.dot_general(
                kf32, featf32, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                    # [F, F]
            ssk = jnp.sum(kf32 * kf32, axis=1)
            ssf = jnp.sum(featf32 * featf32, axis=1)
            nk = jnp.sqrt(jnp.maximum(ssk, 1e-30))
            nf = jnp.sqrt(jnp.maximum(ssf, 1e-30))
            prod = nk[:, None] * nf[None, :]
            den = jnp.maximum(prod, _COS_EPS)
            gdot = g / den
            gden = jnp.where(prod > _COS_EPS, -g * dots / (den * den),
                             0.0)
            gnk = jnp.sum(gden * nf[None, :], axis=1)
            gnf = jnp.sum(gden * nk[:, None], axis=0)
            dnk = jnp.where(ssk > 1e-30, gnk / (2.0 * nk), 0.0)
            dnf = jnp.where(ssf > 1e-30, gnf / (2.0 * nf), 0.0)
            g_kf = (jax.lax.dot_general(
                gdot, featf32, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + 2.0 * dnk[:, None] * kf32)
            g_feat = (jax.lax.dot_general(
                gdot, kf32, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + 2.0 * dnf[:, None] * featf32)
            return g_kf, g_feat

        def step(k, _):
            t = T - 1 - k

            def s(kk):
                return s_ref[0, t, kk]

            op = s(F_OP)
            e1 = s(F_E1)
            mode = s(F_MODE)
            count = s(F_COUNT)
            fa_i = s(F_FA)
            out_v, out_f = s(F_OUT_V), s(F_OUT_F)
            out_a, out_ab = s(F_OUT_A), s(F_OUT_AB)

            is_filter = (op >= OP_FV) & (op <= OP_FFK)
            is_ff = (op == OP_FFV) | (op == OP_FFK)

            va = selv32(rv_ref[0], s(F_VA))                   # [H] f32
            vb = selv32(rv_ref[0], s(F_VB))
            aa = selv32(ra_ref[0], s(F_AA))                   # [F] f32
            ab = selv32(ra_ref[0], s(F_AB))
            fa = rf_ref[0, pl.ds(fa_i, 1)][0]                 # [F, H] dt
            fa32 = fa.astype(jnp.float32)

            gov = selv32(grv_s, out_v)                        # [H]
            gof = grf_s[pl.ds(out_f, 1)][0]                   # [F, H] f32
            goab = selv32(gra_s, out_ab)                      # [F]
            # LOCALIZE count==1 aliases out_a == out_ab: the second write
            # (kb scores) wins, so out_a's cotangent must not ALSO flow
            # through the overwritten ka write. Predicated on OP_LOC —
            # only LOCALIZE may alias (lowering.py) — so a future
            # attn-producing op with equal slots can't silently lose its
            # gradient (ADVICE r3).
            goa = jnp.where((op == OP_LOC) & (out_a == out_ab), 0.0,
                            selv32(gra_s, out_a))             # [F]

            gfeat_s[...] = jnp.zeros((F, H), jnp.float32)

            # ---- stage-1 recompute (values only; bwd at the end) -------
            @when(e1 != 9, 's1f')
            def _stage1_fwd():
                w1 = w1u_ref[pl.ds(e1, 1)][0]
                b1 = b1u_ref[pl.ds(e1, 1)][0]
                w2 = w2u_ref[pl.ds(e1, 1)][0]
                b2 = b2u_ref[pl.ds(e1, 1)][0]
                h_pre = (jnp.dot(fa, w1,
                                 preferred_element_type=jnp.float32)
                         + b1.astype(jnp.float32))
                m0 = dmask((F, H), t, 0)
                h_s[...] = (jax.nn.relu(h_pre) * m0).astype(dt)
                h2 = (jnp.dot(h_s[...], w2,
                              preferred_element_type=jnp.float32)
                      + b2.astype(jnp.float32))
                m1 = dmask((F, H), t, 1)
                # Round through dt: the forward stores feat dt-rounded
                # (mega_exec feat_s is a dt scratch), so the backward must
                # linearize at the dt values or borderline relu/compare
                # bits can flip under bf16 (ADVICE r3).
                feat_s[...] = jnp.where(
                    is_filter, jax.nn.relu(h2) * m1, h2
                ).astype(dt).astype(jnp.float32)

            # ================= vec producers =============================
            @when(op == OP_PUSH, 'push')
            def _push():
                pos = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)[0]
                tmv = tm_ref[0, 0].astype(jnp.float32)
                ss, se = s(F_SS), s(F_SE)
                valid = (tmv > 0).astype(jnp.float32)
                in_span = ((pos >= ss) & (pos < se)).astype(jnp.float32)
                span_w = jnp.where(ss < 0, valid, in_span * valid)
                denom = jnp.maximum(jnp.sum(span_w), 1.0)
                is_aux = ss == -2
                gp = jnp.where(is_aux, 0.0, gov / denom)      # [H]
                dtok_s[...] = (dtok_s[...]
                               + span_w[:, None] * gp[None])
                oh_t = (jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
                        == t).astype(jnp.float32)
                gaux = jnp.where(is_aux, gov, 0.0)
                daux_s[...] = daux_s[...] + oh_t * gaux[None, :]

            @when(op == OP_ANDV, 'andv')
            def _and_vec():
                lt = (va < vb).astype(jnp.float32)
                eq = (va == vb).astype(jnp.float32)
                ga = gov * (lt + 0.5 * eq)
                acc_row(grv_s, s(F_VA), ga)
                acc_row(grv_s, s(F_VB), gov - ga)

            @when(op == OP_CHOOSE, 'choose')
            def _choose():
                vc = selv32(rv_ref[0], s(F_VC))

                def cos_s(a, c):
                    na = jnp.sqrt(jnp.maximum(jnp.sum(a * a), 1e-30))
                    nc = jnp.sqrt(jnp.maximum(jnp.sum(c * c), 1e-30))
                    return jnp.sum(a * c) / jnp.maximum(na * nc,
                                                        _COS_EPS)

                take_first = cos_s(va, vc) > cos_s(vb, vc)
                acc_row(grv_s, s(F_VA), jnp.where(take_first, gov, 0.0))
                acc_row(grv_s, s(F_VB), jnp.where(take_first, 0.0, gov))

            def _linear2_bwd(w_ref, b_ref, dw_o, db_o):
                """relu(va@w[:H] + vb@w[H:] + b) backward (Compare/Equals)."""
                y = (jnp.dot(va.astype(dt)[None, :], w_ref[:H],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(vb.astype(dt)[None, :], w_ref[H:],
                               preferred_element_type=jnp.float32))
                pre = y.astype(dt) + b_ref[...].astype(dt)    # [1, H]
                g1 = gov[None, :] * _gt0(pre)
                dw_o[pl.ds(0, H)] = dw_o[pl.ds(0, H)] + outer(
                    va[None, :], g1)
                dw_o[pl.ds(H, H)] = dw_o[pl.ds(H, H)] + outer(
                    vb[None, :], g1)
                acc_const(db_o, g1)
                acc_row(grv_s, s(F_VA), mmT(g1, w_ref[:H])[0])
                acc_row(grv_s, s(F_VB), mmT(g1, w_ref[H:])[0])

            @when(op == OP_CMP, 'cmp')
            def _cmp():
                _linear2_bwd(cw_ref, cb_ref, dcw_o, dcb_o)

            @when(op == OP_EQ, 'eq')
            def _eq():
                _linear2_bwd(eqw_ref, eqb_ref, deqw_o, deqb_o)

            @when(op == OP_XOR, 'xor')
            def _xor():
                d = jnp.abs(va - vb)
                y = (jnp.dot(d.astype(dt)[None, :], xw_ref[:H],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(va.astype(dt)[None, :], xw_ref[H:2 * H],
                               preferred_element_type=jnp.float32)
                     + jnp.dot(vb.astype(dt)[None, :], xw_ref[2 * H:],
                               preferred_element_type=jnp.float32))
                pre = y.astype(dt) + xb_ref[...].astype(dt)
                g1 = gov[None, :] * _gt0(pre)
                dxw_o[pl.ds(0, H)] = dxw_o[pl.ds(0, H)] + outer(
                    d[None, :], g1)
                dxw_o[pl.ds(H, H)] = dxw_o[pl.ds(H, H)] + outer(
                    va[None, :], g1)
                dxw_o[pl.ds(2 * H, H)] = dxw_o[pl.ds(2 * H, H)] + outer(
                    vb[None, :], g1)
                acc_const(dxb_o, g1)
                gd = mmT(g1, xw_ref[:H])[0]
                sgn = jnp.where(va - vb >= 0, 1.0, -1.0)
                acc_row(grv_s, s(F_VA),
                        gd * sgn + mmT(g1, xw_ref[H:2 * H])[0])
                acc_row(grv_s, s(F_VB),
                        -gd * sgn + mmT(g1, xw_ref[2 * H:])[0])

            @when(op == OP_QUERY, 'query')
            def _query():
                pre = lin_dt(va[None, :], qw_ref, qb_ref[...])
                m4 = dmask((1, H), t, 4)
                g1 = gov[None, :] * m4 * _gt0(pre)
                acc_const(dqw_o, outer(va[None, :], g1))
                acc_const(dqb_o, g1)
                acc_row(grv_s, s(F_VA), mmT(g1, qw_ref[...])[0])

            @when(op == OP_TOA, 'toa')
            def _toaction():
                y = (jnp.dot(va.astype(dt)[None, :], taw1_ref[:H],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(vb.astype(dt)[None, :], taw1_ref[H:],
                               preferred_element_type=jnp.float32))
                pre1 = y.astype(dt) + tab1_ref[...].astype(dt)
                m5 = dmask((1, H), t, 5)
                h = (jax.nn.relu(pre1).astype(jnp.float32)
                     * m5).astype(dt)
                pre2 = lin_dt(h, taw2_ref, tab2_ref[...])
                g2 = gov[None, :] * _gt0(pre2)
                acc_const(dtaw2_o, outer(h.astype(jnp.float32), g2))
                acc_const(dtab2_o, g2)
                gh = (mmT(g2, taw2_ref[...]) * m5
                      * _gt0(pre1))
                dtaw1_o[pl.ds(0, H)] = dtaw1_o[pl.ds(0, H)] + outer(
                    va[None, :], gh)
                dtaw1_o[pl.ds(H, H)] = dtaw1_o[pl.ds(H, H)] + outer(
                    vb[None, :], gh)
                acc_const(dtab1_o, gh)
                acc_row(grv_s, s(F_VA), mmT(gh, taw1_ref[:H])[0])
                acc_row(grv_s, s(F_VB), mmT(gh, taw1_ref[H:])[0])

            @when(op == OP_EX, 'ex')
            def _exists():
                prod = vb * va
                y = (jnp.dot(vb.astype(dt)[None, :], exw1_ref[:H],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(va.astype(dt)[None, :], exw1_ref[H:2 * H],
                               preferred_element_type=jnp.float32)
                     + jnp.dot(prod.astype(dt)[None, :], exw1_ref[2 * H:],
                               preferred_element_type=jnp.float32))
                pre1 = y.astype(dt) + exb1_ref[...].astype(dt)
                m6 = dmask((1, H), t, 6)
                h = (jax.nn.relu(pre1).astype(jnp.float32)
                     * m6).astype(dt)
                pre2 = lin_dt(h, exw2_ref, exb2_ref[...])
                m7 = dmask((1, H), t, 7)
                g2 = (gov[None, :] * m7
                      * _gt0(pre2))
                acc_const(dexw2_o, outer(h.astype(jnp.float32), g2))
                acc_const(dexb2_o, g2)
                g1 = (mmT(g2, exw2_ref[...]) * m6
                      * _gt0(pre1))
                dexw1_o[pl.ds(0, H)] = dexw1_o[pl.ds(0, H)] + outer(
                    vb[None, :], g1)
                dexw1_o[pl.ds(H, H)] = dexw1_o[pl.ds(H, H)] + outer(
                    va[None, :], g1)
                dexw1_o[pl.ds(2 * H, H)] = (
                    dexw1_o[pl.ds(2 * H, H)]
                    + outer(prod[None, :], g1))
                acc_const(dexb1_o, g1)
                g3 = mmT(g1, exw1_ref[2 * H:])[0]
                acc_row(grv_s, s(F_VB),
                        mmT(g1, exw1_ref[:H])[0] + g3 * va)
                acc_row(grv_s, s(F_VA),
                        mmT(g1, exw1_ref[H:2 * H])[0] + g3 * vb)

            @when((op == OP_FV) | (op == OP_FK), 'filter')
            def _filter():
                if fsoft:
                    # Recompute the masked-softmax weights exactly as the
                    # forward (dt-rounded feat, f32 logits + scalar
                    # keyword bias); FILTER_K keeps parity pooling.
                    logits = jnp.dot(
                        feat_s[...].astype(dt), fltw_ref[...],
                        preferred_element_type=jnp.float32,
                    )[:, 0]
                    kb = (jnp.dot(va.astype(dt)[None, :], fltk_ref[...],
                                  preferred_element_type=jnp.float32)
                          [0, 0]
                          + fltb_ref[...].astype(jnp.float32)[0, 0])
                    l = logits + kb
                    neg = jnp.float32(-jnp.inf)
                    xm = jnp.where(vmask_b, l, neg)
                    xm = xm - jnp.max(xm)
                    e = jnp.where(vmask_b, jnp.exp(xm), 0.0)
                    soft = e / jnp.maximum(_vsum(e), 1e-30)     # [F]
                    w = jnp.where(op == OP_FV, soft, vm)
                else:
                    w = vm
                pooled = jnp.sum(
                    feat_s[...] * (w * vm)[:, None], axis=0)
                pre = lin_dt(pooled[None, :], fdw_ref, fdb_ref[...])
                g1 = gov[None, :] * _gt0(pre)
                acc_const(dfdw_o, outer(pooled[None, :], g1))
                acc_const(dfdb_o, g1)
                gpool = mmT(g1, fdw_ref[...])[0]
                gfeat_s[...] = (gfeat_s[...]
                                + (w * vm)[:, None] * gpool[None, :])
                if fsoft:
                    @when(op == OP_FV, 'filter_sm')
                    def _softmax_bwd():
                        # d pooled/d w_f = feat[f] * vm[f]; softmax VJP
                        # then routes d logits into feat (via attn_w[:H])
                        # and the attn weights. The keyword half is a
                        # scalar shift of every logit, so its exact
                        # cotangent is sum(gl) == 0 by softmax shift
                        # invariance — accumulated anyway for bit-parity
                        # with the XLA autodiff (it computes the same
                        # ~0 up to fp).
                        gw = jnp.sum(feat_s[...] * gpool[None, :],
                                     axis=1) * vm              # [F]
                        gl = soft * (gw - _vdot(gw, soft))     # [F]
                        colw = fltw_ref[...].astype(jnp.float32)[:, 0]
                        gfeat_s[...] = (gfeat_s[...]
                                        + gl[:, None] * colw[None, :])
                        acc_const(dfltw_o,
                                  outer(feat_s[...], gl[:, None]))
                        gkb = _vsum(gl)
                        acc_const(dfltk_o, va[:, None] * gkb)
                        acc_const(dfltb_o, jnp.full(
                            (1, 1), 1.0, jnp.float32) * gkb)
                        acc_row(grv_s, s(F_VA),
                                gkb * fltk_ref[...].astype(
                                    jnp.float32)[:, 0])

            def _superlative_bwd(scores32, actions32, amask_f):
                """VJP of the kernel's _superlative; returns
                (g_scores [K, F], g_actions [K, H])."""
                row = jnp.sum(scores32 * vm[None, :], axis=1)     # [K]
                neg = jnp.float32(-jnp.inf)
                xm = jnp.where(amask_f > 0, row, neg)
                xm = xm - jnp.max(xm)
                e = jnp.where(amask_f > 0, jnp.exp(xm), 0.0)
                sm = e / jnp.maximum(_vsum(e), 1e-30)             # [K]
                w = jnp.where(mode == 1, 1.0 - sm, sm) * amask_f
                pooled = jnp.sum(w[:, None] * actions32, axis=0)
                pre = lin_dt(pooled[None, :], supw_ref, supb_ref[...])
                g1 = gov[None, :] * _gt0(pre)
                acc_const(dsupw_o, outer(pooled[None, :], g1))
                acc_const(dsupb_o, g1)
                gpool = mmT(g1, supw_ref[...])[0]                 # [H]
                gw = jnp.sum(actions32 * gpool[None, :], axis=1)  # [K]
                g_actions = w[:, None] * gpool[None, :]
                gsm = jnp.where(mode == 1, -gw, gw) * amask_f
                grow = sm * (gsm - _vdot(gsm, sm))
                g_scores = grow[:, None] * vm[None, :]
                return g_scores, g_actions

            def _loc_fwd(kw_dt):
                """Recompute loc_cos scores; returns (scores [F], kw32)."""
                featf = feat_s[...]
                kw32 = kw_dt.astype(jnp.float32)[0]
                nf = jnp.sqrt(jnp.maximum(
                    jnp.sum(featf * featf, axis=1), 1e-30))
                nk = jnp.sqrt(jnp.maximum(jnp.sum(kw32 * kw32), 1e-30))
                dots = jnp.dot(featf, kw32[:, None],
                               preferred_element_type=jnp.float32)[:, 0]
                cos = dots / jnp.maximum(nf * nk, _COS_EPS)
                # dt-round like the forward's ``_loc_cos(..).astype(dt)``
                # register write so score comparisons see identical bits.
                scores = ((cos + 1.0) * 0.49 * vm).astype(dt)
                return scores.astype(jnp.float32), kw32

            def _loc_bwd(gscore, kw32, va_idx):
                """VJP through loc_cos + the localize.k projection."""
                gcos = gscore * 0.49 * vm
                g_feat, g_kw = cos_rows_bwd(gcos, feat_s[...], kw32)
                gfeat_s[...] = gfeat_s[...] + g_feat
                vsrc = selv32(rv_ref[0], va_idx)
                acc_expert(dw2t_o, 2, outer(vsrc[None, :],
                                            g_kw[None, :]))
                acc_expert(db2t_o, 2, g_kw[None, :])
                acc_row(grv_s, va_idx, mmT(g_kw[None, :],
                                           w2t_ref[2])[0])

            @when(op == OP_LOC, 'loc')
            def _localize():
                ka = lin_dt(va[None, :], w2t_ref[2], b2t_ref[2])
                kb = lin_dt(vb[None, :], w2t_ref[2], b2t_ref[2])
                _, ka32 = _loc_fwd(ka)
                _, kb32 = _loc_fwd(kb)
                _loc_bwd(goa, ka32, s(F_VA))
                _loc_bwd(goab, kb32, s(F_VB))

            @when(op == OP_SUPV, 'supv')
            def _sup_v():
                ka = lin_dt(va[None, :], w2t_ref[2], b2t_ref[2])
                kb = lin_dt(vb[None, :], w2t_ref[2], b2t_ref[2])
                sa, ka32 = _loc_fwd(ka)
                sb, kb32 = _loc_fwd(kb)
                scores = jnp.concatenate([sa[None, :], sb[None, :]],
                                         axis=0)                  # [2, F]
                actions = jnp.concatenate([va[None, :], vb[None, :]],
                                          axis=0)
                amask = (jax.lax.broadcasted_iota(jnp.int32, (2, 1), 0)
                         < count).astype(jnp.float32)[:, 0]       # [2]
                g_scores, g_act = _superlative_bwd(scores, actions,
                                                   amask)
                acc_row(grv_s, s(F_VA), g_act[0])
                acc_row(grv_s, s(F_VB), g_act[1])
                _loc_bwd(g_scores[0], ka32, s(F_VA))
                _loc_bwd(g_scores[1], kb32, s(F_VB))

            @when(op == OP_SUPF, 'supf')
            def _sup_f():
                featf = feat_s[...]
                fb = rf_ref[0, pl.ds(s(F_FB), 1)][0]          # [F, H] dt
                fb32 = fb.astype(jnp.float32)
                kw_f = lin_dt(fb, w2t_ref[2], b2t_ref[2])
                kf32 = kw_f.astype(jnp.float32)
                dots = jax.lax.dot_general(
                    kf32, featf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                nk = jnp.sqrt(jnp.maximum(jnp.sum(kf32 * kf32, axis=1),
                                          1e-30))
                nf = jnp.sqrt(jnp.maximum(
                    jnp.sum(featf * featf, axis=1), 1e-30))
                cosm = dots / jnp.maximum(nk[:, None] * nf[None, :],
                                          _COS_EPS)
                scores = (cosm + 1.0) * 0.49 * vm[None, :]    # [F, F]
                g_scores, g_act = _superlative_bwd(scores, fb32, vm)
                acc_rf(s(F_FB), g_act)
                gcosm = g_scores * 0.49 * vm[None, :]
                g_kf, g_feat = cos_matrix_bwd(gcosm, kf32, featf)
                gfeat_s[...] = gfeat_s[...] + g_feat
                acc_expert(dw2t_o, 2, outer(fb32, g_kf))
                acc_expert(db2t_o, 2,
                           jnp.sum(g_kf, axis=0, keepdims=True))
                acc_rf(s(F_FB), mmT(g_kf, w2t_ref[2]))

            # ================= frames producers ==========================
            @when(is_ff, 'ff')
            def _ffout():
                featf = feat_s[...]
                gk = (jnp.dot(va.astype(dt)[None, :], ffkw_ref[...],
                              preferred_element_type=jnp.float32)[0, 0]
                      + ffab_ref[...].astype(jnp.float32)[0, 0])
                glog = jnp.dot(featf.astype(dt), ffwf_ref[...],
                               preferred_element_type=jnp.float32)[:, 0]
                gate = jnp.where(op == OP_FFV,
                                 jax.nn.sigmoid(glog + gk), 1.0)  # [F]
                x2 = gate[:, None] * featf
                y2 = (jnp.dot(x2.astype(dt), w2t_ref[0],
                              preferred_element_type=jnp.float32)
                      + b2t_ref[0].astype(jnp.float32))
                m2 = dmask((F, H), t, 2)
                gbase = gof * vm[:, None]
                gy2 = gbase * m2 * (y2 > 0).astype(jnp.float32)
                acc_expert(dw2t_o, 0, outer(x2, gy2))
                acc_expert(db2t_o, 0,
                           jnp.sum(gy2, axis=0, keepdims=True))
                gx2 = mmT(gy2, w2t_ref[0])
                gfeat_s[...] = gfeat_s[...] + gate[:, None] * gx2

                @when(op == OP_FFV, 'ffv')
                def _gate_bwd():
                    ggate = jnp.sum(gx2 * featf, axis=1)      # [F]
                    gpre = ggate * gate * (1.0 - gate)
                    acc_const(dffwf_o, outer(featf, gpre[:, None]))
                    colw = ffwf_ref[...].astype(jnp.float32)[:, 0]
                    gfeat_s[...] = (gfeat_s[...]
                                    + gpre[:, None] * colw[None])
                    ggk = _vsum(gpre)
                    acc_const(dffkw_o,
                              va[:, None] * ggk)
                    acc_const(dffab_o,
                              jnp.full((1, 1), 1.0, jnp.float32) * ggk)
                    acc_row(grv_s, s(F_VA),
                            ggk * ffkw_ref[...].astype(
                                jnp.float32)[:, 0])

            @when(op == OP_TEMP, 'temp')
            def _temporal():
                am = jnp.where(count == 2, (aa + ab) * 0.5, aa)   # [F]
                midx = jnp.maximum(mode - 1, 0)
                amd = am.astype(dt)[None, :]
                p1 = (jnp.dot(amd, t1_ref[pl.ds(midx, 1)][0],
                              preferred_element_type=jnp.float32)
                      + tb1_ref[pl.ds(midx, 1)][0].astype(jnp.float32))
                h1 = jax.nn.relu(p1).astype(dt)
                p2 = (jnp.dot(h1, t2_ref[pl.ds(midx, 1)][0],
                              preferred_element_type=jnp.float32)
                      + tb2_ref[pl.ds(midx, 1)][0].astype(jnp.float32))
                h2 = jax.nn.relu(p2).astype(dt)
                p3 = (jnp.dot(h2, t3_ref[pl.ds(midx, 1)][0],
                              preferred_element_type=jnp.float32)
                      + tb3_ref[pl.ds(midx, 1)][0].astype(jnp.float32))
                gsig = jax.nn.sigmoid(p3)[0]                      # [F]
                related = jnp.where(mode == 0, am, gsig) * vm
                x2 = related[:, None] * fa32
                y2 = (jnp.dot(x2.astype(dt), w2t_ref[1],
                              preferred_element_type=jnp.float32)
                      + b2t_ref[1].astype(jnp.float32))
                m2 = dmask((F, H), t, 2)
                ry = jax.nn.relu(y2) * m2
                mu = jnp.mean(ry, axis=-1, keepdims=True)
                dev = ry - mu
                var = jnp.mean(jnp.square(dev), axis=-1,
                               keepdims=True)
                rstd = jax.lax.rsqrt(var + 1e-5)
                xhat = dev * rstd
                g_ln = gof                                        # [F, H]
                acc_const(dlns_o, jnp.sum(g_ln * xhat, axis=0,
                                          keepdims=True))
                acc_const(dlnb_o, jnp.sum(g_ln, axis=0,
                                          keepdims=True))
                gx = g_ln * lns_ref[...].astype(jnp.float32)
                gbase = rstd * (
                    gx - jnp.mean(gx, axis=-1, keepdims=True)
                    - xhat * jnp.mean(gx * xhat, axis=-1,
                                      keepdims=True))
                gy2 = gbase * m2 * (y2 > 0).astype(jnp.float32)
                acc_expert(dw2t_o, 1, outer(x2, gy2))
                acc_expert(db2t_o, 1,
                           jnp.sum(gy2, axis=0, keepdims=True))
                gx2 = mmT(gy2, w2t_ref[1])
                acc_rf(fa_i, related[:, None] * gx2)
                grel = jnp.sum(gx2 * fa32, axis=1) + goab
                gr0 = grel * vm
                g_am_direct = jnp.where(mode == 0, gr0, 0.0)

                gp3 = jnp.where(mode == 0, 0.0,
                                gr0 * gsig * (1.0 - gsig))[None, :]
                acc_expert(dt3_o, midx,
                           outer(h2.astype(jnp.float32), gp3))
                acc_expert(dtb3_o, midx, gp3)
                gh2 = (mmT(gp3, t3_ref[pl.ds(midx, 1)][0])
                       * (p2 > 0).astype(jnp.float32))
                acc_expert(dt2_o, midx,
                           outer(h1.astype(jnp.float32), gh2))
                acc_expert(dtb2_o, midx, gh2)
                gh1 = (mmT(gh2, t2_ref[pl.ds(midx, 1)][0])
                       * (p1 > 0).astype(jnp.float32))
                acc_expert(dt1_o, midx,
                           outer(am[None, :], gh1))
                acc_expert(dtb1_o, midx, gh1)
                g_am = (g_am_direct
                        + mmT(gh1, t1_ref[pl.ds(midx, 1)][0])[0])
                half = (count == 2).astype(jnp.float32)
                acc_row(gra_s, s(F_AA),
                        g_am * (1.0 - half) + 0.5 * half * g_am)
                acc_row(gra_s, s(F_AB), 0.5 * half * g_am)

            @when(op == OP_ATTNV, 'attnv')
            def _attnvideo():
                acc_rf(fa_i, aa[:, None] * gof)
                acc_row(gra_s, s(F_AA), jnp.sum(gof * fa32, axis=1))

            # ================= attn producers ============================
            @when(op == OP_ANDA, 'anda')
            def _and_attn():
                lt = (aa < ab).astype(jnp.float32)
                eq = (aa == ab).astype(jnp.float32)
                ga = goa * (lt + 0.5 * eq)
                acc_row(gra_s, s(F_AA), ga)
                acc_row(gra_s, s(F_AB), goa - ga)

            @when(op == OP_XORF, 'xorf')
            def _xorframe():
                sgn = jnp.where(aa - ab >= 0, 1.0, -1.0)
                acc_row(gra_s, s(F_AA), goa * sgn)
                acc_row(gra_s, s(F_AB), -goa * sgn)

            @when(op == OP_HAS, 'has')
            def _hasitem():
                col = feat_s[...][:, 0]
                sg = jax.nn.sigmoid(col)
                m3 = dmask((1, F), t, 3)[0]
                g = goa * vm * m3
                gcol = g * sg * (1.0 - sg)
                col0 = (jax.lax.broadcasted_iota(jnp.int32, (F, H), 1)
                        == 0).astype(jnp.float32)
                gfeat_s[...] = gfeat_s[...] + gcol[:, None] * col0

            @when(op == OP_EXF, 'exf')
            def _existsframe():
                gcos = goa * 0.49 * vm
                g_rows, g_kw = cos_rows_bwd(gcos, fa32, va)
                acc_rf(fa_i, g_rows)
                acc_row(grv_s, s(F_VA), g_kw)

            @when(op == OP_REL, 'rel')
            def _relate():
                beta = beta_ref[0].astype(jnp.float32)
                shifted = jnp.where(mode == 1, aa - beta, aa + beta)
                neg = jnp.float32(-jnp.inf)
                xm = jnp.where(vmask_b, shifted, neg)
                xm = xm - jnp.max(xm)
                e = jnp.where(vmask_b, jnp.exp(xm), 0.0)
                w = e / jnp.maximum(jnp.sum(e), 1e-30)
                gs = w * (goa - jnp.sum(goa * w))
                acc_row(gra_s, s(F_AA), gs)
                acc_const(dbeta_o,
                          jnp.where(mode == 1, -gs, gs)[None, :])

            # ---- stage-1 backward (collected g_feat) --------------------
            @when(e1 != 9, 's1b')
            def _stage1_bwd():
                w1 = w1u_ref[pl.ds(e1, 1)][0]
                b1 = b1u_ref[pl.ds(e1, 1)][0]
                w2 = w2u_ref[pl.ds(e1, 1)][0]
                b2 = b2u_ref[pl.ds(e1, 1)][0]
                h2 = (jnp.dot(h_s[...], w2,
                              preferred_element_type=jnp.float32)
                      + b2.astype(jnp.float32))
                m1 = dmask((F, H), t, 1)
                g_feat = gfeat_s[...]
                g_h2 = jnp.where(
                    is_filter,
                    g_feat * m1 * (h2 > 0).astype(jnp.float32),
                    g_feat)
                acc_expert(dw2u_o, e1,
                           outer(h_s[...].astype(jnp.float32), g_h2))
                acc_expert(db2u_o, e1,
                           jnp.sum(g_h2, axis=0, keepdims=True))
                h_pre = (jnp.dot(fa, w1,
                                 preferred_element_type=jnp.float32)
                         + b1.astype(jnp.float32))
                m0 = dmask((F, H), t, 0)
                gh = (mmT(g_h2, w2) * m0
                      * (h_pre > 0).astype(jnp.float32))
                acc_expert(dw1u_o, e1, outer(fa32, gh))
                acc_expert(db1u_o, e1,
                           jnp.sum(gh, axis=0, keepdims=True))
                acc_rf(fa_i, mmT(gh, w1))

            return 0

        jax.lax.fori_loop(0, T, step, 0)

        gvideo = grf_s[pl.ds(0, 1)][0] * vm[:, None]          # [F, H]
        dvid_o[0] = gvideo.astype(dt)
        dtok_o[0] = dtok_s[...].astype(dt)
        daux_o[0] = daux_s[...].astype(dt)

    return kernel


def backward_call(meta, rate, seed, args, outs, gouts, interpret=False):
    """Run the backward kernel; returns (dvfa, dvfb, dtoka, dtokb, daux,
    *weight_grads_f32) with weight grads in the args-tuple order."""
    B, T, Nv, Nf, Na, F, H, Hh, L, dt_name, fsoft, flat = meta
    # The training route always passes 3-D halves (the flat layout is
    # the eval megakernel's kernel-to-kernel handoff).
    assert not flat, "mega_exec_train expects [B, F, Hh] halves"
    dt = jnp.dtype(dt_name)
    train = seed is not None

    def im_ex(i):
        return (i, 0, 0)

    def im_ex4(i):
        return (i, 0, 0, 0)

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, T, NSF), im_ex, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, F, Hh), im_ex, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F, Hh), im_ex, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, F), im_ex, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, Hh), im_ex, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, Hh), im_ex, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, L), im_ex, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, H), im_ex, memory_space=pltpu.VMEM),
    ] + [full() for _ in range(len(args) - N_DATA)]
    call_args = list(args)
    if train:
        call_args.append(jnp.asarray(seed, jnp.int32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    reg_specs = [
        pl.BlockSpec((1, Nv, H), im_ex, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Nf, F, H), im_ex4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Na, F), im_ex, memory_space=pltpu.VMEM),
    ]
    in_specs += reg_specs + reg_specs
    call_args += list(outs) + [g.astype(dt) for g in gouts]

    weight_shapes = [jnp.asarray(a).shape for a in args[N_DATA:]]
    out_specs = [
        pl.BlockSpec((1, F, H), im_ex, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, H), im_ex, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, H), im_ex, memory_space=pltpu.VMEM),
    ] + [full() for _ in weight_shapes]
    out_shapes = [
        jax.ShapeDtypeStruct((B, F, H), dt),
        jax.ShapeDtypeStruct((B, L, H), dt),
        jax.ShapeDtypeStruct((B, T, H), dt),
    ] + [jax.ShapeDtypeStruct(s, jnp.float32) for s in weight_shapes]

    kernel = _make_bwd_kernel(T, Nv, Nf, Na, F, H, L, dt,
                              rate if train else 0.0, train,
                              fsoft=fsoft)
    res = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((Nv, H), jnp.float32),      # grv_s
            pltpu.VMEM((Nf, F, H), jnp.float32),   # grf_s
            pltpu.VMEM((Na, F), jnp.float32),      # gra_s
            pltpu.VMEM((F, H), jnp.float32),       # feat_s
            pltpu.VMEM((F, H), dt),                # h_s
            pltpu.VMEM((F, H), jnp.float32),       # gfeat_s
            pltpu.VMEM((L, H), jnp.float32),       # dtok_s
            pltpu.VMEM((T, H), jnp.float32),       # daux_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*call_args)
    dvid, dtok, daux = res[0], res[1], res[2]
    return (dvid[..., :Hh], dvid[..., Hh:], dtok[..., :Hh],
            dtok[..., Hh:], daux) + tuple(res[3:])


@functools.lru_cache(maxsize=None)
def _train_fn(meta, rate, interpret):
    """custom_vjp'd (seed, *args) -> (rv, rf, ra) for fixed geometry."""

    @jax.custom_vjp
    def run(seed, *args):
        return forward_call(meta, args, interpret=interpret, rate=rate,
                            seed=seed)

    def fwd(seed, *args):
        outs = forward_call(meta, args, interpret=interpret, rate=rate,
                            seed=seed)
        return outs, (seed, args, outs)

    def bwd(res, gouts):
        seed, args, outs = res
        grads = backward_call(meta, rate, seed, args, outs, gouts,
                              interpret=interpret)
        dvfa, dvfb, dtoka, dtokb, daux = grads[:5]
        dws = grads[5:]

        def f0(x):
            return np.zeros(jnp.asarray(x).shape, jax.dtypes.float0)

        def z(x):
            a = jnp.asarray(x)
            return jnp.zeros(a.shape, a.dtype)

        d_args = [
            f0(args[0]),            # scal (int32)
            dvfa, dvfb,
            z(args[3]),             # video_mask
            dtoka, dtokb,
            z(args[6]),             # token_mask
            daux,
        ] + [dw.astype(jnp.asarray(a).dtype)
             for dw, a in zip(dws, args[N_DATA:])]
        return (f0(seed), *d_args)

    run.defvjp(fwd, bwd)
    return run


def mega_exec_train(cfg, mods, tables, trace_fields, video_halves,
                    video_mask, token_halves, token_mask, rate, seed,
                    aux_vec=None, interpret=False):
    """Training-path megakernel: forward with hash-counter dropout and a
    hand-written Pallas backward (see module docstring).

    Same contract as ``mega_exec.mega_exec`` plus ``rate`` (dropout) and
    ``seed`` ([2] int32). Differentiable w.r.t. module weights, the
    video/token direction stacks, and ``aux_vec``.
    """
    from stair_tpu.ops.mega_exec import prepare_args

    meta, args = prepare_args(
        cfg, mods, tables, trace_fields, video_halves, video_mask,
        token_halves, token_mask, aux_vec=aux_vec,
    )
    fn = _train_fn(meta, float(rate), bool(interpret))
    return fn(jnp.asarray(seed, jnp.int32), *args)

"""Pallas fused executor step (deterministic/eval path).

One kernel computes every [F, H]-level module family for one example —
stage-1 expert MLP, filter pooling, FilterFrame gate, stage-2 output
projection with per-family epilogue, hasitem head, existsframe cosine —
entirely in VMEM, replacing the executor's ragged_dot stages plus the
~15 XLA fusion streams that glued them (``models/nmn.py heavy_stages``).

The TPU-native tricks:

  * **Operands come straight from the register files.** Block index maps
    driven by scalar-prefetched instruction fields (``rf`` block index =
    ``(perm[i], fa_idx[i])``) mean the kernel gathers its own operands —
    no XLA take_along_axis streams. (The small vec/attn files arrive as
    whole per-example rows — Mosaic block tiling wants the last two
    block dims full — and are indexed in-kernel.)
  * **Outputs land unsorted.** The example order is expert-sorted (so
    consecutive tiles reuse the fetched expert weights — Pallas skips
    re-fetch when a block index repeats) but output index maps scatter
    rows back via ``perm[i]`` — no unsort stream.
  * Per-tile family selection is scalar (each example's instruction is
    ONE opcode), so epilogue branches are VPU selects on VMEM tiles.

Forward only: training keeps the ragged_dot + one-hot design whose
backward is tuned (checkpoint_dots remat). Reference math being fused:
video_nmn/modules.py:123-138 (hasitem), 162-178 (existsframe),
181-217 (localize stage), 251-340 (temporal/attnvideo), 343-413
(filter/filterframe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Packed scalar-prefetch rows (one [NS, B] int32 array). S_FB is kept in
# the pack for layout stability but unused by the kernel since the supf
# projection moved to the executor's XLA glue.
(S_PERM, S_E1, S_W2T, S_E2, S_FA, S_FB, S_VA, S_AA, S_FILT, S_FFV,
 S_VB, S_OUTF) = range(12)
NS = 12

# e2 codes (stage-2 family): ff, temporal, supf(loc.k), null, attnvideo.
E2_FF, E2_TEMPORAL, E2_SUPF, E2_NULL, E2_ATTNVIDEO = range(5)


def _step_kernel(s_ref, fa_ref, rv_ref, ra_ref, rel_ref, vm_ref,
                 gkb_ref, w1_ref, b1_ref, w2_ref, b2_ref, w2t_ref, b2t_ref,
                 ffwf_ref, lns_ref, lnb_ref, wk_ref, bk_ref,
                 y_ref, pooled_ref, has_ref, exf_ref,
                 loca_ref, locb_ref, feat_ref):
    i = pl.program_id(0)
    dt = fa_ref.dtype
    x = fa_ref[0, 0]                                     # [F, H]
    vm = vm_ref[0, 0].astype(jnp.float32)                # [F]

    # ---- stage 1: expert two-layer MLP --------------------------------
    # Predicated: null-expert tiles (cheap vec/attn opcodes) skip all
    # stage-1 work; their feat/pooled/has outputs are garbage that the
    # opcode selects downstream never read (selects pick lanes, so
    # stray NaNs cannot propagate across rows). feat lives in VMEM
    # scratch only — its sole off-kernel consumer was the rare
    # SUPERLATIVE_F glue, which recomputes its <= B/8 rows in XLA, so
    # the [B, F, H] HBM write per step is gone.
    @pl.when(s_ref[S_E1, i] != 9)
    def _stage1():
        h = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)
        h = jax.nn.relu(h + b1_ref[0, 0].astype(jnp.float32)).astype(dt)
        h2 = jnp.dot(h, w2_ref[0], preferred_element_type=jnp.float32)
        h2 = h2 + b2_ref[0, 0].astype(jnp.float32)       # [F, H] f32
        filt = s_ref[S_FILT, i] > 0
        feat32 = jnp.where(filt, jax.nn.relu(h2), h2)
        feat_ref[...] = feat32.astype(dt)
        pooled_ref[0, 0] = jnp.sum(
            feat32 * (vm * vm)[:, None], axis=0
        ).astype(dt)
        has_ref[0, 0] = (jax.nn.sigmoid(h2[:, 0]) * vm).astype(dt)

    feat = feat_ref[...]                                 # [F, H]

    # ---- existsframe cosine -------------------------------------------
    # Dynamic sublane indexing is unsupported in Mosaic; select the
    # register row with a one-hot reduce over the (small) file.
    nv = rv_ref.shape[1]
    sel_v = (jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0)
             == s_ref[S_VA, i]).astype(jnp.float32)
    va = jnp.sum(rv_ref[0].astype(jnp.float32) * sel_v, axis=0)  # [H]
    xf = x.astype(jnp.float32)
    dot = jnp.sum(xf * va[None, :], axis=1)              # [F]
    nx = jnp.sqrt(jnp.maximum(jnp.sum(xf * xf, axis=1), 1e-30))
    nv = jnp.sqrt(jnp.maximum(jnp.sum(va * va), 1e-30))
    cos = dot / jnp.maximum(nx * nv, 1e-8)
    exf_ref[0, 0] = ((cos + 1.0) * 0.49 * vm).astype(dt)

    # ---- localize scores (locsup tiles only): cosine of the projected
    # features vs both keyword operands. feat is already resident in VMEM
    # here — computing the scores in-kernel replaced two full [B, F, H]
    # XLA re-reads of the feat output per step (profiled ~0.18 ms/step at
    # B=1024). Numerics mirror models/modules.py cosine_matrix +
    # M.linear(localize.k): bf16 kw round trip, f32 norms, COS_EPS clamp.
    @pl.when(s_ref[S_E1, i] == 8)
    def _localize():
        featf = feat_ref[...].astype(jnp.float32)
        nf = jnp.sqrt(jnp.maximum(jnp.sum(featf * featf, axis=1), 1e-30))
        nvec = rv_ref.shape[1]
        for s_row, out_ref in ((S_VA, loca_ref), (S_VB, locb_ref)):
            sel = (jax.lax.broadcasted_iota(jnp.int32, (nvec, 1), 0)
                   == s_ref[s_row, i]).astype(jnp.float32)
            v = jnp.sum(rv_ref[0].astype(jnp.float32) * sel, axis=0)
            kw = (jnp.dot(v.astype(dt)[None, :], wk_ref[...],
                          preferred_element_type=jnp.float32).astype(dt)
                  + bk_ref[0])                               # [1, H] dt
            kw32 = kw.astype(jnp.float32)[0]
            nk = jnp.sqrt(jnp.maximum(jnp.sum(kw32 * kw32), 1e-30))
            dots = jnp.dot(featf, kw32[:, None],
                           preferred_element_type=jnp.float32)[:, 0]
            cos_k = (dots / jnp.maximum(nf * nk, 1e-8)).astype(dt)
            out_ref[0, 0] = (((cos_k + 1.0) * 0.49).astype(jnp.float32)
                             * vm).astype(out_ref.dtype)

    # ---- FilterFrame gate (keyword half precomputed in XLA: gkb =
    # va @ attn_w[H:] + attn_b, a [B]-cheap matvec) ----------------------
    gk = gkb_ref[0, 0, 0].astype(jnp.float32)
    glog = jnp.dot(feat, ffwf_ref[:, :1],
                   preferred_element_type=jnp.float32)[:, 0] + gk
    gate = jnp.where(
        s_ref[S_FFV, i] > 0, jax.nn.sigmoid(glog), 1.0
    )                                                    # [F]

    # ---- stage 2 input select + projection + epilogue ------------------
    # Predicated on a live stage-2 family. Null and attnvideo tiles skip
    # the matmul; SUPERLATIVE_F tiles skip it too — their localize.k
    # projection consumes the fb operand, and keeping fb out of the
    # kernel is what lets the register file be passed as ONE aliased
    # operand (XLA inserts a full-file defensive copy per step when the
    # same buffer arrives as several params with one donated — profiled
    # at ~21 ms/forward at B=1024). The supf projection moved to the
    # executor's capacity-sliced XLA glue.
    e2 = s_ref[S_E2, i]

    @pl.when((e2 == E2_FF) | (e2 == E2_TEMPORAL))
    def _stage2():
        rel = rel_ref[0, 0].astype(jnp.float32)
        x2 = jnp.where(
            e2 == E2_FF, gate[:, None] * feat.astype(jnp.float32),
            rel[:, None] * xf,
        ).astype(dt)
        y2 = jnp.dot(x2, w2t_ref[0], preferred_element_type=jnp.float32)
        y2 = y2 + b2t_ref[0, 0].astype(jnp.float32)      # [F, H] f32

        relu_y = jax.nn.relu(y2)
        mu = jnp.mean(relu_y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(relu_y - mu), axis=-1, keepdims=True)
        ln_y = ((relu_y - mu) * jax.lax.rsqrt(var + 1e-5)
                * lns_ref[:].astype(jnp.float32)
                + lnb_ref[:].astype(jnp.float32))
        y = jnp.where(e2 == E2_FF, relu_y * vm[:, None], ln_y)
        y_ref[0, 0] = y.astype(dt)

    @pl.when(e2 == E2_ATTNVIDEO)
    def _attnvideo():
        na = ra_ref.shape[1]
        sel_a = (jax.lax.broadcasted_iota(jnp.int32, (na, 1), 0)
                 == s_ref[S_AA, i]).astype(jnp.float32)
        aa = jnp.sum(ra_ref[0].astype(jnp.float32) * sel_a, axis=0)
        y_ref[0, 0] = (aa[:, None] * xf).astype(dt)


def fused_step(scal, rv, rf, ra, related, vmask, gkb,
               w1u, b1u, w2u, b2u, w2t, b2t, ffwf, ln_scale, ln_bias,
               loc_kw, loc_kb, interpret=False):
    """Run the fused per-step kernel over an expert-sorted batch.

    scal [NS, B] int32 (see S_* rows; S_PERM must be expert-sorted so
    equal-expert tiles are consecutive). rv [B, Nv, H], rf [B, Nf, F, H],
    ra [B, Na, F]; related/vmask [B, F] and gkb [B, 1] (unsorted — the
    kernel permutes via index maps). Weights: w1u/w2u [G, H, H],
    b1u/b2u [G, H], w2t [4, H, H], b2t [4, H], ffwf [H, 1], ln_* [1, H],
    loc_kw [H, H] + loc_kb [1, H] (the localize keyword projection).

    Returns (rf_new, pooled_sorted, hasitem, existsframe, loc_a, loc_b):
    rf_new [B, Nf, F, H] is the register file WITH THIS STEP'S FRAMES
    WRITE APPLIED (the rf operand is aliased to it — each tile stores
    its stage-2/attnvideo output at (example, out_frames[example]) in
    place); hasitem/existsframe [B, F] and loc_a/loc_b [B, F] f32
    localize cosine scores (garbage on non-locsup tiles, discarded by
    the executor's opcode selects) in UNSORTED example order; pooled
    [B, H] in sorted order (consumed by the grouped dense3). The
    SUPERLATIVE_F inputs (stage-1 projection and localize.k keyword) are
    NOT emitted — the executor's capacity-sliced XLA glue recomputes
    them for its <= B/8 rows, which keeps this kernel free of [B, F, H]
    HBM outputs and of a second register-file operand.
    """
    B, Nf, F, H = rf.shape
    Nv = rv.shape[1]
    Na = ra.shape[1]
    dt = rf.dtype

    # Mosaic wants the last two block dims full (or 8x128-aligned):
    # 2-D row-blocked arrays get a middle singleton; biases get one too.
    related3 = related.reshape(B, 1, F)
    vmask3 = vmask.reshape(B, 1, F)
    gkb3 = gkb.reshape(B, 1, 1)
    b1u3 = b1u[:, None, :]
    b2u3 = b2u[:, None, :]
    b2t3 = b2t[:, None, :]

    def im(*sel):
        def f(i, s):
            out = []
            for kind in sel:
                if kind == "i":
                    out.append(i)
                elif kind == "z":
                    out.append(0)
                else:
                    out.append(s[kind, i])
            return tuple(out)
        return f

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        scratch_shapes=[pltpu.VMEM((F, H), dt)],         # feat
        in_specs=[
            # The register file, referenced EXACTLY ONCE: fa blocks are
            # fetched from it and the frames output is aliased onto it.
            pl.BlockSpec((1, 1, F, H), im(S_PERM, S_FA, "z", "z"),
                         memory_space=pltpu.VMEM),      # fa from rf
            pl.BlockSpec((1, Nv, H), im(S_PERM, "z", "z"),
                         memory_space=pltpu.VMEM),      # vec regs row
            pl.BlockSpec((1, Na, F), im(S_PERM, "z", "z"),
                         memory_space=pltpu.VMEM),      # attn regs row
            pl.BlockSpec((1, 1, F), im(S_PERM, "z", "z"),
                         memory_space=pltpu.VMEM),      # related row
            pl.BlockSpec((1, 1, F), im(S_PERM, "z", "z"),
                         memory_space=pltpu.VMEM),      # vmask row
            pl.BlockSpec((1, 1, 1), im(S_PERM, "z", "z"),
                         memory_space=pltpu.VMEM),      # gate kw half
            pl.BlockSpec((1, H, H), im(S_E1, "z", "z"),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), im(S_E1, "z", "z"),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, H), im(S_E1, "z", "z"),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), im(S_E1, "z", "z"),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, H), im(S_W2T, "z", "z"),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), im(S_W2T, "z", "z"),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # ffwf [H, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # ln scale [1, H]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # ln bias [1, H]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # loc kw w [H, H]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # loc kw b [1, H]
        ],
        out_specs=[
            # Frames output lands DIRECTLY in the register file: the rf
            # operand's buffer is aliased to this output and each tile
            # writes its example's target slot (perm[i], out_frames[i]).
            # SSA guarantees out_frames != fa/fb for the same example, so
            # the in-place write never races the operand fetches; null
            # tiles (pl.when skips the store) flush stale VMEM into their
            # example's scratch slot, which the executor re-zeroes after
            # the scan — same contract as the old separate-y scatter.
            pl.BlockSpec((1, 1, F, H), im(S_PERM, S_OUTF, "z", "z"),
                         memory_space=pltpu.VMEM),      # y -> rf slot
            pl.BlockSpec((1, 1, H), im("i", "z", "z"),
                         memory_space=pltpu.VMEM),      # pooled (sorted)
            pl.BlockSpec((1, 1, F), im(S_PERM, "z", "z"),
                         memory_space=pltpu.VMEM),      # hasitem
            pl.BlockSpec((1, 1, F), im(S_PERM, "z", "z"),
                         memory_space=pltpu.VMEM),      # existsframe
            pl.BlockSpec((1, 1, F), im(S_PERM, "z", "z"),
                         memory_space=pltpu.VMEM),      # loc_a
            pl.BlockSpec((1, 1, F), im(S_PERM, "z", "z"),
                         memory_space=pltpu.VMEM),      # loc_b
        ],
    )
    rf_new, pooled, has, exf, loca, locb = pl.pallas_call(
        _step_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Nf, F, H), dt),
            jax.ShapeDtypeStruct((B, 1, H), dt),
            jax.ShapeDtypeStruct((B, 1, F), dt),
            jax.ShapeDtypeStruct((B, 1, F), dt),
            jax.ShapeDtypeStruct((B, 1, F), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, F), jnp.float32),
        ],
        # The rf operand (arg 1) is donated to the frames output: the
        # step's register write happens inside the kernel, so no
        # [B, F, H] y buffer and no XLA scatter streaming the
        # [B, Nf, F, H] file exist (the scatter profiled ~5 ms/forward
        # at B=1024). SSA makes the in-place write race-free: an
        # example's out_frames slot is never one of its operand slots,
        # and each example is exactly one grid tile.
        input_output_aliases={1: 0},
        interpret=interpret,
    )(scal.astype(jnp.int32), rf, rv, ra, related3, vmask3, gkb3,
      w1u, b1u3, w2u, b2u3, w2t, b2t3, ffwf, ln_scale, ln_bias,
      loc_kw, loc_kb)
    return (rf_new, pooled[:, 0], has[:, 0], exf[:, 0],
            loca[:, 0], locb[:, 0])

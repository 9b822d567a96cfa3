"""VideoNMN: the batched, compiled neural-module-network executor.

The reference model (yellow-binary-tree/STAIR ``video_nmn/module_net.py``)
interprets each program with a Python stack, one eager module call at a time,
batch size 1. Here the whole interpreter is a single ``lax.scan`` over the
padded instruction traces produced by :mod:`stair_tpu.ir.lowering`:

  * three typed register files ride the scan carry
    (vec [Nv+1, H], frames [Nf+1, F, H], attn [Na+1, F]);
  * every step gathers its operands by register index, computes the module
    outputs, and scatters them to its destination registers (padding steps
    write to scratch slots);
  * opcode dispatch is select-based: under ``vmap`` all module candidates are
    computed and the right one chosen per example — tiny matmuls become one
    batched MXU matmul per module family, which is the idiomatic TPU trade
    (dense compute beats host round-trips by orders of magnitude);
  * registers are SSA, so the final register files contain every module's
    output — the auditable intermediates that are STAIR's headline feature —
    with no per-step Python and no extra buffers.

``VideoNMN.forward`` therefore runs an entire batch of heterogeneous
questions (different programs, lengths, videos) as one XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

import os as _os

from stair_tpu.ir.lowering import Opcode

#: Comma-separated ablation switches for perf triage (bench-only, not a
#: user-facing feature): filter, locsup, temporal.
_ABLATE = frozenset(
    s for s in _os.environ.get("STAIR_ABLATE", "").split(",") if s
)
#: once-per-process sentinel for the softmax-mode kernel-fallback warning
_warned_softmax_fallback: list = []
from stair_tpu.models import modules as M
from stair_tpu.ops.lstm import (
    bilstm,
    bilstm_pallas,
    bilstm_pallas_train,
    init_lstm_params,
    init_transformer_encoder_params,
    transformer_encode,
)


@dataclass(frozen=True)
class NMNConfig:
    hidden_size: int = 512
    video_size: int = 2048
    text_size: int = 300
    dropout: float = 0.25
    answer_vocab_length: int = 172
    max_video_length: int = 150
    object_types: int = 1
    have_pretrain_head: bool = True
    #: 'parity' reproduces the reference Filter pooling quirk; 'softmax' fixes it.
    filter_attention: str = "parity"
    #: 'float32' for exact reference parity; 'bfloat16' runs the executor's
    #: matmuls at MXU-native precision (losses stay fp32).
    compute_dtype: str = "float32"
    #: 'lstm' (reference parity) or 'transformer' (parallel-over-sequence,
    #: MXU-friendly) for the video/text encoders.
    encoder: str = "lstm"
    # Trace geometry (register-file sizes + instruction count cap).
    max_steps: int = 32
    num_vec: int = 24
    num_frames: int = 8
    num_attn: int = 10

    @property
    def conv_temporal(self) -> bool:
        return self.max_video_length > 32

    def to_dict(self):
        return dict(self.__dict__)


class VideoNMN:
    """Functional model: ``init`` makes params, ``forward`` runs a batch."""

    def __init__(self, config: NMNConfig):
        self.config = config

    # -- parameters ----------------------------------------------------------

    def init(self, rng) -> dict:
        cfg = self.config
        k_mod, k_venc, k_tenc, k_dec1, k_dec2 = jax.random.split(rng, 5)
        H = cfg.hidden_size
        params = {
            "modules": M.init_module_params(
                k_mod,
                {
                    "hidden_size": H,
                    "max_video_length": cfg.max_video_length,
                    "dropout": cfg.dropout,
                    "object_types": cfg.object_types,
                    "have_pretrain_head": cfg.have_pretrain_head,
                },
            ),
            "video_encoder": (
                init_lstm_params(k_venc, cfg.video_size, H // 2)
                if cfg.encoder == "lstm"
                else init_transformer_encoder_params(
                    k_venc, cfg.video_size, H,
                    max_len=max(cfg.max_video_length, 512),
                )
            ),
            "text_encoder": (
                init_lstm_params(k_tenc, cfg.text_size, H // 2)
                if cfg.encoder == "lstm"
                else init_transformer_encoder_params(k_tenc, cfg.text_size, H)
            ),
            "decoder": {
                "l1": M._init_linear(k_dec1, 2 * H, 2 * H),
                "l2": M._init_linear(k_dec2, 2 * H, cfg.answer_vocab_length),
            },
            # Multiple-choice head (STAR): scores candidate encodings
            # against the program output + question state.
            "choice_proj": M._init_linear(
                jax.random.fold_in(k_dec2, 1), 2 * H, H
            ),
        }
        return params

    # -- encoders ------------------------------------------------------------

    def _mm_dtype(self):
        # bf16 compute mode runs the LSTM matmuls on the MXU in bf16
        # (f32 state/accumulation — standard mixed precision).
        return (
            jnp.bfloat16
            if self.config.compute_dtype == "bfloat16" else None
        )

    def _encode(self, enc_params, x, mask):
        if self.config.encoder == "lstm":
            return bilstm(enc_params, x, mask, mm_dtype=self._mm_dtype())
        return transformer_encode(enc_params, x, mask)

    def _encode_batched(self, enc_params, x, mask, deterministic):
        """[B, L, D] -> (tokens [B, L, H], sentence [B, H], halves|None).

        Deterministic forwards on TPU route to the Pallas BiLSTM kernel
        (ops/lstm.py bilstm_pallas: recurrent state VMEM-resident over a
        (batch-tile, time) grid — no per-step output-stack HBM round
        trips). Training keeps the differentiable scan; STAIR_PALLAS_LSTM:
        auto (on for TPU), 0 (off), interpret (CPU interpreter).

        ``halves`` is the (fwd [B, L, h], bwd [B, L, h]) pair straight
        off the kernel (in compute dtype): the executor megakernel
        consumes it directly so the concatenated [B, L, H] array — and
        its HBM copy — is dead code in logits-only jits.
        """
        if self.config.encoder == "lstm":
            # Deterministic forwards use the forward-only kernel;
            # training uses the custom-VJP twin (bilstm_pallas_train:
            # hand-written Pallas backward over the stored h/c state
            # stacks — no autodiff scan residuals). Separate gates so
            # either can be killed independently:
            # STAIR_PALLAS_LSTM / STAIR_PALLAS_LSTM_TRAIN:
            # auto (on for TPU), 0 (off), interpret (CPU interpreter).
            env = _os.environ.get(
                "STAIR_PALLAS_LSTM" if deterministic
                else "STAIR_PALLAS_LSTM_TRAIN", "auto"
            )
            _default_dev = getattr(jax.config, "jax_default_device", None)
            on_tpu = (
                jax.default_backend() != "cpu"
                and getattr(_default_dev, "platform", None) != "cpu"
            )
            if env != "0" and (env == "interpret" or on_tpu):
                dt = (
                    jnp.bfloat16
                    if self.config.compute_dtype == "bfloat16"
                    else jnp.float32
                )
                fn = bilstm_pallas if deterministic else bilstm_pallas_train
                return fn(
                    enc_params, x, mask, mm_dtype=self._mm_dtype(),
                    interpret=env == "interpret", token_dtype=dt,
                    # Eval halves stay in the kernel's flat [B, 1, L*h]
                    # layout: the megakernel reads that buffer verbatim,
                    # so the XLA relayout copy between the two kernels
                    # (2 x 0.4 ms/fwd at B=1024) is gone. Training keeps
                    # 3-D halves (the train kernel's custom VJP owes
                    # cotangents in the consumer's layout).
                    return_halves="flat" if deterministic else True,
                )
        tokens, sent = jax.vmap(
            lambda xx, mm: self._encode(enc_params, xx, mm)
        )(x, mask)
        return tokens, sent, None

    def encode_video(self, params, video, video_mask,
                     deterministic=False):
        """[B, F, video_size] -> [B, F, H] (ref module_net.py:160-163)."""
        return self._encode_batched(
            params["video_encoder"], video, video_mask, deterministic
        )[0]

    def encode_question(self, params, question, question_mask,
                        deterministic=False):
        """[B, L, text_size] -> tokens [B, L, H], sentence [B, H]
        (ref module_net.py:151-158)."""
        return self._encode_batched(
            params["text_encoder"], question, question_mask, deterministic
        )[:2]

    def encode_sentences(self, params, embeddings, mask,
                         deterministic=False):
        """Batch-encode standalone phrases (gold classes, filter vocab)."""
        return self._encode_batched(
            params["text_encoder"], embeddings, mask, deterministic
        )[1]

    # -- the executor --------------------------------------------------------

    def _fused_tables(self, mods):
        """Stack every [H, H]-matmul module family into expert tables for
        grouped dispatch.

        All the heavy per-step work — the Filter/FilterFrame two-layer MLP
        (8 weight variants), the Localize video projection, HasItem's MLP,
        and the output projections (FilterFrame dense, Temporal dense,
        Localize keyword) — shares two matmul shapes: a two-layer frames MLP
        and a single [H, H] projection. The executor sorts the batch by
        expert index per step and runs ONE ``lax.ragged_dot`` grouped matmul
        per layer against these tables (the MoE segment-matmul trick),
        instead of computing every family for every example and selecting
        (the round-1 compute-all cost) or gathering per-example [H, H]
        weights (~240x slower: B weight copies through HBM per step).

        Stage-1 rows (two-layer MLP): [filter.repr, filter.kw x3, ff.repr,
        ff.kw x3, localize.v1/v2, null, hasitem.l1/l2(padded)].
        Pooled-dense rows: [filter.dense, ff.dense, null].
        Stage-2 rows: [ff.dense, temporal.dense, localize.k, null].
        """
        f, ff = mods["filter"], mods["filterframe"]
        loc, hi, tmp = mods["localize"], mods["hasitem"], mods["temporal"]
        H = f["repr_w1"].shape[0]
        zw = jnp.zeros((1, H, H), f["repr_w1"].dtype)
        zb = jnp.zeros((1, H), f["repr_w1"].dtype)
        l2w = jnp.pad(hi["l2"]["w"], ((0, 0), (0, H - 1)))
        l2b = jnp.pad(hi["l2"]["b"], (0, H - 1))
        return {
            "w1u": jnp.concatenate([
                f["repr_w1"][None], f["kw_w1"], ff["repr_w1"][None],
                ff["kw_w1"], loc["v1"]["w"][None], zw, hi["l1"]["w"][None],
            ]),
            "b1u": jnp.concatenate([
                f["repr_b1"][None], f["kw_b1"], ff["repr_b1"][None],
                ff["kw_b1"], loc["v1"]["b"][None], zb, hi["l1"]["b"][None],
            ]),
            "w2u": jnp.concatenate([
                f["repr_w2"][None], f["kw_w2"], ff["repr_w2"][None],
                ff["kw_w2"], loc["v2"]["w"][None], zw, l2w[None],
            ]),
            "b2u": jnp.concatenate([
                f["repr_b2"][None], f["kw_b2"], ff["repr_b2"][None],
                ff["kw_b2"], loc["v2"]["b"][None], zb, l2b[None],
            ]),
            "dense3": jnp.concatenate(
                [f["dense"]["w"][None], ff["dense"]["w"][None], zw]
            ),
            "db3": jnp.concatenate(
                [f["dense"]["b"][None], ff["dense"]["b"][None], zb]
            ),
            "w2t": jnp.concatenate([
                ff["dense"]["w"][None], tmp["dense"]["w"][None],
                loc["k"]["w"][None], zw,
            ]),
            "b2t": jnp.concatenate([
                ff["dense"]["b"][None], tmp["dense"]["b"][None],
                loc["k"]["b"][None], zb,
            ]),
        }

    def run_trace(
        self,
        params,
        trace_fields: dict,
        video_frames,     # [B, F, H] encoded video
        video_mask,       # [B, F]
        token_features,   # [B, L, H]
        token_mask,       # [B, L]
        rng=None,
        deterministic: bool = True,
        aux_vec=None,     # [B, T, H] text encodings for spanless args
        video_halves=None,   # optional (fwd, bwd) [B, F, H/2] encoder
        token_halves=None,   # stacks, consumed only by the megakernel
    ):
        """Execute all programs; returns the final register files."""
        cfg = self.config
        B, F, H = video_frames.shape
        mods = params["modules"]
        rate = cfg.dropout
        if rng is None:
            rng = jax.random.PRNGKey(0)
            deterministic = True
        example_rngs = jax.random.split(rng, B)
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if dt != jnp.float32:
            mods = jax.tree_util.tree_map(lambda x: x.astype(dt), mods)
            video_frames = video_frames.astype(dt)
            token_features = token_features.astype(dt)
            video_mask = video_mask.astype(dt)
        tables = self._fused_tables(mods)

        is_parity = cfg.filter_attention == "parity"

        # Fused Pallas executor step (deterministic/eval only) — decided
        # up front because it changes the frames register-file LAYOUT:
        # STAIR_FUSED_EXEC: auto (on for TPU lowering), 0 (off),
        # interpret (CPU interpreter, for parity tests).
        fuse_env = _os.environ.get("STAIR_FUSED_EXEC", "auto")
        _default_dev = getattr(jax.config, "jax_default_device", None)
        _on_tpu = (
            jax.default_backend() != "cpu"
            and getattr(_default_dev, "platform", None) != "cpu"
        )
        use_fused = (
            deterministic and is_parity and not _ABLATE
            and fuse_env != "0"
            and (fuse_env == "interpret" or _on_tpu)
        )

        # Executor MEGAKERNEL (ops/mega_exec.py): the whole scan in one
        # Pallas call, register files resident in VMEM. Takes precedence
        # over the per-step fused kernel on TPU. STAIR_MEGA_EXEC:
        # auto (on for TPU), 0 (off), interpret (CPU interpreter).
        mega_env = _os.environ.get("STAIR_MEGA_EXEC", "auto")
        # Both Filter modes run in the megakernels: fsoft rides the meta
        # tuple (mega_exec.prepare_args) into a static kernel branch.
        use_mega = (
            deterministic and not _ABLATE
            and mega_env != "0"
            and (mega_env == "interpret" or _on_tpu)
        )
        # Training megakernel (ops/mega_grad.py): forward with in-kernel
        # hash-counter dropout + a hand-written Pallas backward walking
        # the SSA registers in reverse (no stacked residuals, register
        # files and weight-grad accumulators VMEM-resident).
        # STAIR_MEGA_TRAIN: auto (default: on for TPU), 0 (off),
        # interpret (CPU interpreter, for grad parity tests). Default
        # flipped to auto after the accuracy study (scripts/
        # run_mega_train_study.sh): megakernel arms matched or beat the
        # autodiff control on held-out test at both seeds, at 3.8x the
        # step rate.
        mtrain_env = _os.environ.get("STAIR_MEGA_TRAIN", "auto")
        use_mega_train = (
            not deterministic and not _ABLATE
            and mtrain_env != "0"
            and (mtrain_env == "interpret" or _on_tpu)
            # An explicit STAIR_REV=1 request wins over the auto default
            # (the reversible executor is this path's measurement
            # baseline / escape hatch).
            and _os.environ.get("STAIR_REV", "0") == "0"
        )

        if (not is_parity and not use_mega and not use_mega_train
                and not _warned_softmax_fallback):
            # The MEGAkernels implement both Filter modes (r4's warn-only
            # gap closed: masked-softmax epilogue on the VMEM feat tile,
            # VERDICT r4 #3); only the per-step fused kernel is still
            # parity-only. So softmax now leaves the fast path ONLY when
            # the megakernels are explicitly off / unavailable — warn
            # about the ~4x-slower XLA scan in that case.
            import warnings

            warnings.warn(
                "filter_attention=%r with the executor megakernels "
                "disabled (STAIR_MEGA_EXEC/STAIR_MEGA_TRAIN): falling "
                "back to the XLA scan, ~4x slower per train step."
                % cfg.filter_attention,
                stacklevel=2,
            )
            _warned_softmax_fallback.append(True)

        if use_mega or use_mega_train:
            from stair_tpu.ops.mega_exec import mega_exec

            aux_in = None if aux_vec is None else aux_vec.astype(dt)

            def halves(pair, fused):
                # Kernel-produced halves skip the [.., H] concat (it
                # becomes dead code); other producers split, matching
                # the bilstm [fwd | bwd] feature layout.
                if pair is not None:
                    return tuple(p.astype(dt) for p in pair)
                half = fused.shape[-1] // 2
                return fused[..., :half], fused[..., half:]

            if use_mega_train:
                from stair_tpu.ops.mega_grad import mega_exec_train

                seed = jax.random.randint(
                    rng, (2,), 0, 2**31 - 1, dtype=jnp.int32
                )
                return mega_exec_train(
                    cfg, mods, tables, trace_fields,
                    halves(video_halves, video_frames),
                    video_mask, halves(token_halves, token_features),
                    token_mask, rate, seed, aux_vec=aux_in,
                    interpret=mtrain_env == "interpret",
                )
            return mega_exec(
                cfg, mods, tables, trace_fields,
                halves(video_halves, video_frames),
                video_mask, halves(token_halves, token_features),
                token_mask, aux_vec=aux_in,
                interpret=mega_env == "interpret",
            )

        # Initial register files: frames register 0 <- encoded video.
        # (A slot-per-step frames layout — T+2 slots, batch-uniform
        # dynamic_update_slice writes, last-writer id remap — was built
        # and measured-and-rejected: the select-blend write it removes
        # is NOT on the scan's critical path, and through the axon
        # tunnel every ~70 MB of extra per-call scratch costs ~0.5 s of
        # WALL time per execution (940 MB file -> 6.5 s/call at B=1024,
        # device time unchanged at ~33 ms), dwarfing the ~2 ms of HBM
        # traffic saved.)
        rv0 = jnp.zeros((B, cfg.num_vec + 1, H), dt)
        rf0 = jnp.zeros((B, cfg.num_frames + 1, F, H), dt)
        rf0 = rf0.at[:, 0].set(video_frames * video_mask[:, :, None])
        ra0 = jnp.zeros((B, cfg.num_attn + 1, F), dt)

        def step_one(mods, operands, instr, vmask, tokens, tmask, ex_rng,
                     step_idx, aux, heavy):
            """One instruction on one example (vmapped over the batch).

            ``operands`` are this example's register reads (performed once,
            batched, in ``scan_body`` — per-example dynamic indexing lowers
            to scatter-adds in the backward pass, which are pathologically
            slow on TPU). ``heavy`` carries the outputs of the batched
            expert-grouped stages (``heavy_stages``): every module family
            that touches an [F, H] matmul is computed there; this function
            keeps the cheap [H]-level ops and opcode selection, returning
            the four register writes for the batched writeback.
            """
            op = instr["opcode"]
            srng = jax.random.fold_in(ex_rng, step_idx)
            rngs = jax.random.split(srng, 5)

            va, vb, vc, fa, _fb, aa, ab = operands
            mode = instr["mode"]

            # --- span-mean text push --------------------------------------
            s, e = instr["span_start"], instr["span_end"]
            L = tokens.shape[0]
            pos = jnp.arange(L)
            valid = tmask > 0
            span_w = jnp.where(
                s < 0, valid, (pos >= s) & (pos < e) & valid
            ).astype(tokens.dtype)
            push_text = (span_w @ tokens) / jnp.maximum(jnp.sum(span_w), 1.0)
            # -2 marks --use-prog-word-embeddings substitution.
            push_text = jnp.where(s == -2, aux, push_text)

            # --- cheap vec ops --------------------------------------------
            vec_cands = [
                (Opcode.PUSH_TEXT, push_text),
                (Opcode.AND_VEC, M.and_module(va, vb)),
                (Opcode.COMPARE, M.compare_module(mods["compare"], va, vb)),
                (Opcode.EQUALS, M.equals_module(mods["equals"], va, vb)),
                (Opcode.CHOOSE, M.choose_module(va, vb, vc)),
                (Opcode.XOR, M.xor_module(mods["xor"], va, vb)),
                (Opcode.QUERY, M.query_module(
                    mods["query"], va, rate, rngs[2], deterministic)),
                (Opcode.TOACTION, M.toaction_module(
                    mods["toaction"], va, vb, rate, rngs[3], deterministic)),
                (Opcode.EXISTS, M.exists_module(
                    mods["exists"], va, vb, rate, rngs[4], deterministic)),
                (Opcode.FILTER_V, heavy["filter_vec"]),
                (Opcode.FILTER_K, heavy["filter_vec"]),
                (Opcode.SUPERLATIVE_V, heavy["sup_v"]),
                (Opcode.SUPERLATIVE_F, heavy["sup_f"]),
            ]
            new_vec = _select(op, vec_cands, jnp.zeros((H,), dt))

            # --- frames candidates ----------------------------------------
            if "temporal_out" not in heavy:
                # Fused-kernel mode: every frames-producing family's
                # output was already stored IN the register file by the
                # kernel's aliased output (each tile writes its example's
                # (out_frames) slot in place; non-frames opcodes flush
                # into the scratch slot, which the scan epilogue
                # re-zeroes). Nothing to return here — scan_body takes
                # the written file from heavy["rf_new"].
                new_frames = jnp.zeros((F, H), dt)
            else:
                frames_cands = [
                    (Opcode.TEMPORAL, heavy["temporal_out"]),
                    (Opcode.ATTNVIDEO, M.attnvideo_module(fa, aa)),
                    (Opcode.FILTERFRAME_V, heavy["ff_frames"]),
                    (Opcode.FILTERFRAME_K, heavy["ff_frames"]),
                ]
                new_frames = _select(op, frames_cands, jnp.zeros((F, H), dt))

            # --- attn candidates ------------------------------------------
            attn_cands = [
                (Opcode.AND_ATTN, M.and_module(aa, ab)),
                (Opcode.XORFRAME, M.xorframe_module(aa, ab)),
                (Opcode.HASITEM, heavy["hasitem"]),
                (Opcode.EXISTSFRAME,
                 heavy["existsframe"] if "existsframe" in heavy
                 else M.existsframe_module(va, fa, vmask)),
                (Opcode.LOCALIZE, heavy["loc_scores"][0]),
                (Opcode.RELATE, M.relate_module(
                    mods["relate"], mode == 1, aa, vmask)),
            ]
            new_attn = _select(op, attn_cands, jnp.zeros((F,), dt))
            attn_b_cands = [
                (Opcode.LOCALIZE, heavy["loc_scores"][1]),
                (Opcode.TEMPORAL, heavy["temporal_rel"]),
            ]
            new_attn_b = _select(op, attn_b_cands, jnp.zeros((F,), dt))

            return (new_vec.astype(dt), new_frames.astype(dt),
                    new_attn.astype(dt), new_attn_b.astype(dt))

        vmask_b = jnp.asarray(video_mask)

        # STAIR_REG_GATHER=1 forces the gather/scatter register ops in
        # training too (perf triage; default: one-hot for the backward).
        if deterministic or _os.environ.get("STAIR_REG_GATHER") == "1":
            # Eval/serving forwards are never differentiated: per-example
            # gathers/scatters touch only the indexed [F, H] slices, so a
            # step's register traffic is ~3 slice-sized transfers instead
            # of ~4 full-file rewrites (the frames file is the executor's
            # dominant HBM stream — measured 38 -> a few ms/batch-of-512).
            def reg_read(regfile, idx):
                return jnp.take_along_axis(
                    regfile,
                    idx.reshape((-1,) + (1,) * (regfile.ndim - 1)),
                    axis=1,
                )[:, 0]

            def reg_write(regfile, idx, value):
                b = jnp.arange(regfile.shape[0])
                return regfile.at[b, idx].set(value, mode="drop")
        else:
            # Training: one-hot contractions. A dynamic per-example gather
            # transposes to a scatter-add in the backward pass — measured
            # ~5x slower than this dense form on TPU at the executor's
            # register-file sizes.
            def reg_read(regfile, idx):
                """[B, N, ...] x [B] -> [B, ...] as a one-hot contraction."""
                oh = jax.nn.one_hot(
                    idx, regfile.shape[1], dtype=regfile.dtype
                )
                return jnp.einsum("bn,bn...->b...", oh, regfile)

            def reg_write(regfile, idx, value):
                """Blend ``value`` into register ``idx`` per example."""
                oh = jax.nn.one_hot(
                    idx, regfile.shape[1], dtype=regfile.dtype
                )
                oh = oh.reshape(oh.shape + (1,) * (regfile.ndim - 2))
                return regfile * (1 - oh) + oh * value[:, None]

        def read_operands(regs, instr, skip_fa=False):
            rv, rf, ra = regs
            # Fused-kernel mode gathers fa/fb inside the kernel via index
            # maps; the XLA-side operands are only consumed by candidates
            # that don't exist there, so zeros placeholders are DCE'd.
            if skip_fa:
                fa = fb = jnp.zeros(
                    rf.shape[:1] + rf.shape[2:], rf.dtype
                )
            else:
                fa = reg_read(rf, instr["fa"])
                fb = reg_read(rf, instr["fb"])
            return (
                reg_read(rv, instr["va"]), reg_read(rv, instr["vb"]),
                reg_read(rv, instr["vc"]), fa, fb,
                reg_read(ra, instr["aa"]), reg_read(ra, instr["ab"]),
            )

        def grouped(x, table, groups):
            # Emit the compute dtype directly: MXU accumulation is f32
            # either way, and a separate f32 output + convert doubles the
            # [B*F, H] output traffic (profiled ~6 ms/fwd at B=1024).
            return jax.lax.ragged_dot(
                x, table, groups, preferred_element_type=dt
            )

        def heavy_stages(operands, instr, srng, mods, tables, vmask_b):
            """All [F, H]-matmul module families for the whole batch as
            expert-grouped ``ragged_dot`` stages (see ``_fused_tables``).

            Per step each example needs AT MOST ONE family from each stage
            (opcodes are mutually exclusive), so sorting the batch by expert
            index turns what was seven all-row [H, H] matmuls per step into
            three grouped ones; rows whose opcode needs none route to a null
            expert. Garbage rows (an example's unused family outputs) are
            discarded by ``step_one``'s opcode selection, exactly as in the
            compute-all design.

            Every traced value arrives through the arguments (operands
            carry fb too) — the reversible path replays this function
            under ``jax.vjp`` inside a deferred backward trace, where a
            closure over an outer-trace tracer would leak.
            """
            op = instr["opcode"]
            mode = instr["mode"]
            count = instr["count"]
            va, vb, _vc, fa, fb, aa, ab = operands

            is_ff = (op == int(Opcode.FILTERFRAME_V)) | (
                op == int(Opcode.FILTERFRAME_K)
            )
            is_filter = is_ff | (op == int(Opcode.FILTER_V)) | (
                op == int(Opcode.FILTER_K)
            )
            is_kw = (op == int(Opcode.FILTER_K)) | (
                op == int(Opcode.FILTERFRAME_K)
            )
            is_supf = op == int(Opcode.SUPERLATIVE_F)
            is_locsup = (
                (op == int(Opcode.LOCALIZE))
                | (op == int(Opcode.SUPERLATIVE_V)) | is_supf
            )
            is_hasitem = op == int(Opcode.HASITEM)
            is_temporal = op == int(Opcode.TEMPORAL)
            rngs = jax.random.split(srng, 4)

            # ---- stage 1: two-layer frames MLP ---------------------------
            # experts: [filter x8 | localize v1/v2 | null | hasitem].
            e1 = jnp.where(
                is_filter,
                jnp.where(is_ff, 4, 0) + jnp.where(is_kw, 1 + mode, 0),
                jnp.where(is_locsup, 8, jnp.where(is_hasitem, 10, 9)),
            )
            perm1 = jnp.argsort(e1)
            inv1 = jnp.argsort(perm1)
            e1s = e1[perm1]
            gs1 = jnp.bincount(e1, length=11).astype(jnp.int32)
            fa_s = fa[perm1]                                # [B, F, H] sorted
            h = grouped(
                fa_s.reshape(B * F, H), tables["w1u"], gs1 * F
            ).reshape(B, F, H) + tables["b1u"][e1s][:, None, :]
            h = M.dropout(jax.nn.relu(h), rate, rngs[0], deterministic)
            h2 = grouped(
                h.reshape(B * F, H), tables["w2u"], gs1 * F
            ).reshape(B, F, H) + tables["b2u"][e1s][:, None, :]
            # Epilogue: filter rows relu+dropout; localize v2 / hasitem l2
            # outputs stay linear.
            filt_s = is_filter[perm1]
            feat_like = M.dropout(jax.nn.relu(h2), rate, rngs[1],
                                  deterministic)
            out1_s = jnp.where(filt_s[:, None, None], feat_like, h2)
            out1 = out1_s[inv1]                             # [B, F, H]

            # ---- filter heads (sorted domain) ----------------------------
            vm_s = vmask_b[perm1]
            va_s = va[perm1]
            op_s = op[perm1]
            feat_s = out1_s
            n0 = jnp.sum(gs1[:4]).astype(jnp.int32)
            n1 = jnp.sum(gs1[4:8]).astype(jnp.int32)
            gs3 = jnp.stack([n0, n1, jnp.int32(B) - n0 - n1])
            d3 = jnp.where(e1s < 4, 0, jnp.where(e1s < 8, 1, 2))
            # Filter pooling: parity = uniform sum over valid frames
            # (the reference's degenerate softmax); 'softmax' = corrected.
            # The [feat, kw] concat heads are split into two half-matmuls
            # (w rows [:H] for feat, [H:] for the broadcast keyword): the
            # [B, F, 2H] concat materialization was ~2 full HBM streams
            # per step in the profile.
            if is_parity:
                weights = vm_s[:, :, None]
            else:
                aw = mods["filter"]["attn_w"]
                logits = (
                    feat_s @ aw[:H]
                    + (va_s @ aw[H:] + mods["filter"]["attn_b"])[:, None, :]
                )[..., 0]
                soft = M.masked_softmax(logits, vm_s > 0, axis=-1)
                weights = jnp.where(
                    (op_s == int(Opcode.FILTER_V))[:, None, None],
                    soft[:, :, None], vm_s[:, :, None],
                )
            pooled = jnp.sum(weights * feat_s * vm_s[:, :, None], axis=1)
            filter_vec = jax.nn.relu(
                grouped(pooled, tables["dense3"], gs3) + tables["db3"][d3]
            )[inv1]
            # FilterFrame sigmoid gate (vec path) or identity.
            ffw = mods["filterframe"]["attn_w"]
            gate = jax.nn.sigmoid(
                feat_s @ ffw[:H]
                + (va_s @ ffw[H:]
                   + mods["filterframe"]["attn_b"])[:, None, :]
            )                                              # [B, F, 1]
            gate = jnp.where(
                (op_s == int(Opcode.FILTERFRAME_V))[:, None, None], gate, 1.0
            )
            x_ff = (gate * feat_s)[inv1]

            # ---- temporal gated attention (banded-matmul convs) ----------
            attn_mean = jnp.where((count == 2)[:, None], (aa + ab) / 2.0, aa)
            related = M.temporal_related_attn_batched(
                mods["temporal"], mode, attn_mean, cfg.conv_temporal
            ) * vmask_b                                     # [B, F]

            # ---- stage 2: output projections -----------------------------
            # experts: [ff.dense | temporal.dense | localize.k | null].
            # (A sorted-domain permutation-composition variant was
            # measured and REJECTED for this path: it saves eval streams
            # but its extra gathers cost ~1.3 ms/step in the backward,
            # and eval now runs the fused Pallas kernel instead.)
            e2 = jnp.where(
                is_ff, 0,
                jnp.where(is_temporal, 1, jnp.where(is_supf, 2, 3)),
            )
            x2 = jnp.where(
                is_ff[:, None, None], x_ff,
                jnp.where(
                    is_temporal[:, None, None], related[:, :, None] * fa,
                    jnp.where(is_supf[:, None, None], fb, fa),
                ),
            )
            perm2 = jnp.argsort(e2)
            inv2 = jnp.argsort(perm2)
            gs2 = jnp.bincount(e2, length=4).astype(jnp.int32)
            y2 = (grouped(
                x2[perm2].reshape(B * F, H), tables["w2t"], gs2 * F
            ).reshape(B, F, H) + tables["b2t"][e2[perm2]][:, None, :])[inv2]
            # Shared relu+dropout epilogue (rows are ff XOR temporal);
            # localize.k output (kw_f) stays linear.
            base = M.dropout(jax.nn.relu(y2), rate, rngs[2], deterministic)
            ff_frames = base * vmask_b[:, :, None]
            temporal_out = M.layer_norm(mods["temporal"]["ln"], base)
            kw_f = y2

            # ---- localize / superlative heads -----------------------------
            vfeat = out1
            pair = jnp.stack([va, vb], axis=1)              # [B, 2, H]
            kw_pair = M.linear(mods["localize"]["k"], pair)
            loc_scores = (jax.vmap(M.cosine_matrix)(kw_pair, vfeat)
                          + 1.0) * 0.49 * vmask_b[:, None, :]    # [B, 2, F]
            pair_mask = jnp.arange(2)[None, :] < count[:, None]

            def superlative(scores, actions, amask, m, vm):
                row = jnp.sum(scores * vm[:, None, :], axis=2)
                w = M.masked_softmax(row, amask, axis=1)
                w = jnp.where((m == 1)[:, None], 1.0 - w, w) * amask
                pld = jnp.sum(w[:, :, None] * actions, axis=1)
                return jax.nn.relu(
                    M.linear(mods["superlative"]["dense"], pld)
                )

            sup_v = superlative(loc_scores, pair, pair_mask, mode, vmask_b)

            # SUPERLATIVE_F's [B, F, F] all-pairs cosine is the fattest
            # per-step matmul (2*B*F^2*H flops + two [B, F, H] f32 casts)
            # yet its opcode is rare. Compute it on a B/8-capacity slice
            # (supf rows sorted first); a full-batch lax.cond branch keeps
            # the rare overflow case exact rather than silently dropped.
            def supf_dense(take):
                del take
                scores_f = (jax.vmap(M.cosine_matrix)(kw_f, vfeat)
                            + 1.0) * 0.49 * vmask_b[:, None, :]  # [B, F, F]
                return superlative(scores_f, fb, vmask_b > 0, mode, vmask_b)

            # Capacity slicing pays in eval; in training the cond +
            # slice backward (scatter) measured slower than the dense
            # form (31.6 vs 28.3 ms/step at B=128), so it is
            # deterministic-only.
            cap = max(min(B, 16), B // 8)
            if cap >= B or not deterministic:
                sup_f = supf_dense(None)
            else:
                def supf_sliced(take):
                    sc = (jax.vmap(M.cosine_matrix)(kw_f[take], vfeat[take])
                          + 1.0) * 0.49 * vmask_b[take][:, None, :]
                    sf = superlative(
                        sc, fb[take], vmask_b[take] > 0, mode[take],
                        vmask_b[take],
                    )                                        # [cap, H]
                    return jnp.zeros((B, H), sf.dtype).at[take].set(sf)

                take = jnp.argsort(~is_supf)[:cap]
                sup_f = jax.lax.cond(
                    jnp.sum(is_supf) > cap, supf_dense, supf_sliced, take
                )

            hasitem = M.dropout(
                jax.nn.sigmoid(out1[..., 0]), rate, rngs[3], deterministic
            ) * vmask_b

            heavy = {
                "filter_vec": filter_vec, "ff_frames": ff_frames,
                "loc_scores": loc_scores, "sup_v": sup_v, "sup_f": sup_f,
                "temporal_out": temporal_out, "temporal_rel": related,
                "hasitem": hasitem,
            }
            if "filter" in _ABLATE:
                heavy["filter_vec"] = jnp.zeros((B, H), dt)
                heavy["ff_frames"] = jnp.zeros((B, F, H), dt)
            if "locsup" in _ABLATE:
                heavy["loc_scores"] = jnp.zeros((B, 2, F), dt)
                heavy["sup_v"] = jnp.zeros((B, H), dt)
                heavy["sup_f"] = jnp.zeros((B, H), dt)
            if "temporal" in _ABLATE:
                heavy["temporal_out"] = jnp.zeros((B, F, H), dt)
                heavy["temporal_rel"] = jnp.zeros((B, F), dt)
            return heavy

        def heavy_fused(regs, operands, instr, sched):
            from stair_tpu.ops import executor_step as ES

            rv, rf, ra = regs
            mode = instr["mode"]
            count = instr["count"]
            va, vb, _vc, _fa, _fb, aa, ab = operands

            # The dispatch schedule (expert sort, scalar rows, group
            # sizes) is precomputed for all steps before the scan; only
            # the register-value-dependent inputs remain per step.
            attn_mean = jnp.where(
                (count == 2)[:, None], (aa + ab) / 2.0, aa
            )
            related = M.temporal_related_attn_batched(
                mods["temporal"], mode, attn_mean, cfg.conv_temporal
            ) * vmask_b                                     # [B, F]

            ffw = mods["filterframe"]["attn_w"]
            gkb = (va @ ffw[H:]
                   + mods["filterframe"]["attn_b"]).astype(jnp.float32)

            rf_new, pooled_s, hasitem, exf, loc_a, loc_b = ES.fused_step(
                sched["scal"], rv, rf, ra, related.astype(dt),
                vmask_b.astype(dt),
                gkb, tables["w1u"], tables["b1u"], tables["w2u"],
                tables["b2u"], tables["w2t"], tables["b2t"],
                ffw[:H].astype(dt),
                mods["temporal"]["ln"]["scale"][None].astype(dt),
                mods["temporal"]["ln"]["bias"][None].astype(dt),
                mods["localize"]["k"]["w"].astype(dt),
                mods["localize"]["k"]["b"][None].astype(dt),
                interpret=fuse_env == "interpret",
            )

            # Filter head dense3 on the sorted pooled rows.
            filter_vec = jax.nn.relu(
                grouped(pooled_s, tables["dense3"], sched["gs3"])
                + tables["db3"][sched["d3"]]
            )[sched["inv"]]

            # Localize / superlative heads. The cosine scores come out of
            # the kernel (feat stays in VMEM there); only the tiny [B, 2]
            # softmax blend remains in XLA.
            pair = jnp.stack([va, vb], axis=1)
            loc_scores = jnp.stack([loc_a, loc_b], axis=1)   # [B, 2, F]
            pair_mask = jnp.arange(2)[None, :] < count[:, None]

            def superlative(scores, actions, amask, m, vm):
                row = jnp.sum(scores * vm[:, None, :], axis=2)
                wts = M.masked_softmax(row, amask, axis=1)
                wts = jnp.where((m == 1)[:, None], 1.0 - wts, wts) * amask
                pld = jnp.sum(wts[:, :, None] * actions, axis=1)
                return jax.nn.relu(
                    M.linear(mods["superlative"]["dense"], pld)
                )

            sup_v = superlative(loc_scores, pair, pair_mask, mode, vmask_b)

            # SUPERLATIVE_F's localize.k projection (kw_f = fb @ w2t[2])
            # runs HERE, not in the kernel: keeping the fb operand out of
            # the kernel is what lets the register file be passed as one
            # aliased operand (a second rf param forced a full-file
            # defensive copy per step — profiled ~21 ms/forward at
            # B=1024). fb slots are untouched by this step's in-kernel
            # write (SSA: out_frames is a fresh slot or scratch, never an
            # operand), so the reads below come from rf_new and the old
            # rf has no consumers after the kernel call — which is what
            # lets XLA honor the in-place aliasing without a copy.
            def supf_kwf(fb_rows):
                return (fb_rows @ tables["w2t"][2]
                        + tables["b2t"][2]).astype(dt)

            def supf_vfeat(fa_rows):
                # Stage-1 localize projection (expert 8, linear output),
                # recomputed here so the kernel emits no [B, F, H] feat
                # buffer — supf needs at most B/8 rows of it.
                h = jax.nn.relu(fa_rows @ tables["w1u"][8]
                                + tables["b1u"][8]).astype(dt)
                return (h @ tables["w2u"][8] + tables["b2u"][8]).astype(dt)

            def supf_dense(take):
                del take
                fb_full = jnp.take_along_axis(
                    rf_new, instr["fb"][:, None, None, None], axis=1
                )[:, 0]
                fa_full = jnp.take_along_axis(
                    rf_new, instr["fa"][:, None, None, None], axis=1
                )[:, 0]
                scores_f = (jax.vmap(M.cosine_matrix)(
                    supf_kwf(fb_full), supf_vfeat(fa_full))
                            + 1.0) * 0.49 * vmask_b[:, None, :]
                return superlative(scores_f, fb_full, vmask_b > 0, mode,
                                   vmask_b)

            cap = max(min(B, 16), B // 8)
            if cap >= B:
                sup_f = supf_dense(None)
            else:
                def supf_sliced(take):
                    fbc = rf_new[take, instr["fb"][take]]
                    fac = rf_new[take, instr["fa"][take]]
                    sc = (jax.vmap(M.cosine_matrix)(
                        supf_kwf(fbc), supf_vfeat(fac))
                          + 1.0) * 0.49 * vmask_b[take][:, None, :]
                    sf = superlative(
                        sc, fbc, vmask_b[take] > 0, mode[take],
                        vmask_b[take],
                    )
                    return jnp.zeros((B, H), sf.dtype).at[take].set(sf)

                sup_f = jax.lax.cond(
                    sched["nsup"] > cap, supf_dense, supf_sliced,
                    sched["take"],
                )

            return {
                "filter_vec": filter_vec, "rf_new": rf_new,
                "loc_scores": loc_scores, "sup_v": sup_v, "sup_f": sup_f,
                "temporal_rel": related, "hasitem": hasitem,
                "existsframe": exf,
            }

        batched_step = jax.vmap(
            step_one,
            in_axes=(None, (0,) * 7, 0, 0, 0, 0, 0, None, 0, 0),
        )
        heavy_rng = jax.random.fold_in(rng, 0x5f17)

        def scan_body(regs, scanned):
            instr_t, t, aux_t, sched_t = scanned
            operands = read_operands(regs, instr_t, skip_fa=use_fused)
            if use_fused:
                heavy = heavy_fused(regs, operands, instr_t, sched_t)
                # The frames write already happened inside the kernel
                # (aliased output slot (b, out_frames[b])).
                rf_written = heavy.pop("rf_new")
            else:
                heavy = heavy_stages(
                    operands, instr_t,
                    jax.random.fold_in(heavy_rng, t),
                    mods, tables, vmask_b,
                )
                rf_written = None
            new_vec, new_frames, new_attn, new_attn_b = batched_step(
                mods, operands, instr_t, video_mask, token_features,
                token_mask, example_rngs, t, aux_t, heavy,
            )
            rv, rf, ra = regs
            rv = reg_write(rv, instr_t["out_vec"], new_vec)
            if rf_written is None:
                rf = reg_write(rf, instr_t["out_frames"], new_frames)
            else:
                rf = rf_written
            ra = reg_write(ra, instr_t["out_attn"], new_attn)
            ra = reg_write(ra, instr_t["out_attn_b"], new_attn_b)
            return (rv, rf, ra), None

        T = trace_fields["opcode"].shape[1]
        # Rematerialize the scan step in the backward pass, keeping matmul
        # outputs (checkpoint_dots). Without this the scan stacks every
        # elementwise intermediate as a [T, B, F, H] residual — including
        # f32 upcasts and dropout masks — and the backward is dominated by
        # re-reading them from HBM (profiled: 38.3 -> 33.5 ms/step at
        # B=128/H=512/F=64 bf16; full remat 35.9, no-batch-dims 36.8).
        # STAIR_REMAT overrides for perf triage: 0 (off), full, dots.
        # Eval forwards (deterministic, never differentiated) skip the
        # wrapper — it exists purely for backward-pass residual traffic.
        remat = _os.environ.get("STAIR_REMAT", "dots")
        if deterministic:
            remat = "0"
        if remat not in ("0", "full", "dots"):
            raise ValueError(
                f"STAIR_REMAT={remat!r}: expected one of 0, full, dots"
            )
        if remat != "0":
            policy = {
                "dots": jax.checkpoint_policies.checkpoint_dots,
            }.get(remat)
            # prevent_cse=False: lax.scan already rules out the CSE that
            # flag guards against (per jax.checkpoint docs).
            scan_body_used = jax.checkpoint(
                scan_body, policy=policy, prevent_cse=False
            )
        else:
            scan_body_used = scan_body
        scanned_fields = jax.tree_util.tree_map(
            lambda a: jnp.moveaxis(a, 1, 0), trace_fields
        )  # [T, B]
        if use_fused:
            # Precompute the per-step dispatch schedule — expert codes,
            # sort permutation, scalar-prefetch rows, ragged-dot group
            # sizes, superlative-F capacity slice — for ALL steps at
            # once. Every piece depends only on the (static per batch)
            # trace fields; computing them inside the scan put a [B]
            # argsort plus ~10 gathers on each step's critical path
            # ahead of the kernel's scalar prefetch, serial latency the
            # register streams were hiding behind.
            from stair_tpu.ops import executor_step as ES

            opT = scanned_fields["opcode"]                 # [T, B]
            modeT = scanned_fields["mode"]
            is_ff = (opT == int(Opcode.FILTERFRAME_V)) | (
                opT == int(Opcode.FILTERFRAME_K))
            is_filter = is_ff | (opT == int(Opcode.FILTER_V)) | (
                opT == int(Opcode.FILTER_K))
            is_kw = (opT == int(Opcode.FILTER_K)) | (
                opT == int(Opcode.FILTERFRAME_K))
            is_supf = opT == int(Opcode.SUPERLATIVE_F)
            is_locsup = ((opT == int(Opcode.LOCALIZE))
                         | (opT == int(Opcode.SUPERLATIVE_V)) | is_supf)
            e1 = jnp.where(
                is_filter,
                jnp.where(is_ff, 4, 0) + jnp.where(is_kw, 1 + modeT, 0),
                jnp.where(
                    is_locsup, 8,
                    jnp.where(opT == int(Opcode.HASITEM), 10, 9),
                ),
            )
            e2 = jnp.where(
                is_ff, ES.E2_FF,
                jnp.where(
                    opT == int(Opcode.TEMPORAL), ES.E2_TEMPORAL,
                    jnp.where(
                        is_supf, ES.E2_SUPF,
                        jnp.where(opT == int(Opcode.ATTNVIDEO),
                                  ES.E2_ATTNVIDEO, ES.E2_NULL),
                    ),
                ),
            )
            perm = jnp.argsort(e1 * 5 + e2, axis=1)        # [T, B]

            def _g(a):
                return jnp.take_along_axis(a, perm, axis=1)

            # supf tiles no longer run a stage-2 matmul (their localize.k
            # projection lives in the XLA glue) — point their w2t fetch
            # at the null expert so they don't churn the weight block.
            w2t_code = jnp.where(
                e2 == ES.E2_SUPF, 3, jnp.minimum(e2, 3)
            )
            scal_all = jnp.stack([
                perm, _g(e1), _g(w2t_code), _g(e2),
                _g(scanned_fields["fa"]), _g(scanned_fields["fb"]),
                _g(scanned_fields["va"]), _g(scanned_fields["aa"]),
                _g(is_filter.astype(jnp.int32)),
                _g((opT == int(Opcode.FILTERFRAME_V)).astype(jnp.int32)),
                _g(scanned_fields["vb"]),
                _g(scanned_fields["out_frames"]),
            ], axis=1).astype(jnp.int32)                   # [T, NS, B]
            counts = jnp.sum(
                jax.nn.one_hot(e1, 11, dtype=jnp.int32), axis=1
            )                                              # [T, 11]
            n0 = jnp.sum(counts[:, :4], axis=1)
            n1 = jnp.sum(counts[:, 4:8], axis=1)
            e1s = _g(e1)
            sched = {
                "scal": scal_all,
                "gs3": jnp.stack(
                    [n0, n1, jnp.int32(B) - n0 - n1], axis=1
                ),                                         # [T, 3]
                "d3": jnp.where(e1s < 4, 0, jnp.where(e1s < 8, 1, 2)),
                "inv": jnp.argsort(perm, axis=1),
                "take": jnp.argsort(
                    ~is_supf, axis=1
                )[:, :max(min(B, 16), B // 8)],
                "nsup": jnp.sum(is_supf.astype(jnp.int32), axis=1),
            }
        else:
            sched = {}
        if aux_vec is None:
            aux_scanned = jnp.zeros((T, B, H), dt)
        else:
            aux_scanned = jnp.moveaxis(aux_vec.astype(dt), 1, 0)
        # Reversible training executor (see rev_exec.py): the registers
        # are SSA, so the backward reconstructs each step's input files by
        # re-zeroing the written slots — no stacked carries/residuals, and
        # slice-sized gather/scatter register traffic in both directions
        # (the one-hot reg_read/reg_write above exist precisely because
        # plain autodiff transposes gathers into slow TPU scatter-adds).
        # STAIR_REV: 0 (default: autodiff scan), any other value enables.
        # Opt-in until it beats the autodiff scan on TPU: gradients are
        # bitwise-parity-tested (tests/test_rev_exec.py), but measured
        # 29.3 vs 27.8 ms/step at B=128/H=512/F=64 — XLA materializes a
        # full register-file copy around every scatter in BOTH designs,
        # so the slice-sized updates don't pay yet (see the Pallas
        # aliased slot kernels in ops/regslots.py for the fix).
        use_rev = (
            not deterministic
            and _os.environ.get("STAIR_REV", "0") != "0"
        )
        if use_rev:
            from stair_tpu.models.rev_exec import RevCore, rev_exec

            def rev_step(operands, consts, f_t, t, aux_t, ex_rngs, h_rng):
                mods_c, tables_c, tokens_c, tmask_c, vmask_c = consts
                heavy = heavy_stages(
                    operands, f_t, jax.random.fold_in(h_rng, t),
                    mods_c, tables_c, vmask_c,
                )
                return batched_step(
                    mods_c, operands, f_t, vmask_c, tokens_c, tmask_c,
                    ex_rngs, t, aux_t, heavy,
                )

            core = RevCore(
                rev_step, cfg.num_vec, cfg.num_frames, cfg.num_attn
            )
            rv, rf, ra = rev_exec(
                core,
                (rf0[:, 0], mods, tables, token_features, token_mask,
                 vmask_b, aux_scanned),
                (scanned_fields, example_rngs, heavy_rng),
            )
        else:
            (rv, rf, ra), _ = jax.lax.scan(
                scan_body_used, (rv0, rf0, ra0),
                ((scanned_fields, jnp.arange(T), aux_scanned, sched)),
            )
        if use_fused:
            # Fused mode skips the frames zero-select: non-frames opcodes
            # scatter kernel garbage into the scratch slot (index
            # cfg.num_frames, never read as an operand). Restore the
            # all-zero scratch invariant once, after the scan.
            rf = rf.at[:, cfg.num_frames].set(0.0)
        # Returned in compute dtype; ``forward`` upcasts the full files
        # only for its audit outputs (so a logits-only jit DCEs the
        # [B, N, F, H]-sized f32 casts — ~3 ms/batch at B=1024) and the
        # root row is upcast after the gather (bitwise identical: the
        # gather and the exact bf16->f32 widening commute).
        return rv, rf, ra

    # -- full forward --------------------------------------------------------

    def forward(self, params, batch, rng=None, deterministic=True):
        """Run encoders + executor + answer decoder on a padded batch.

        ``batch`` keys: question [B, L, text_size], question_mask [B, L],
        video [B, F, video_size], video_mask [B, F], trace fields dict
        (each [B, T] int32), root_reg [B], root_is_vec [B].
        Returns logits plus the final register files for audit/supervision.
        """
        cfg = self.config
        if rng is None:
            r_exec = r_dec = jax.random.PRNGKey(0)
            deterministic = True
        else:
            r_exec, r_dec = jax.random.split(rng)

        if "encoders" in _ABLATE:
            B_, F_ = batch["video"].shape[:2]
            L_ = batch["question"].shape[1]
            video_frames = jnp.zeros((B_, F_, cfg.hidden_size))
            token_features = jnp.zeros((B_, L_, cfg.hidden_size))
            question_feature = jnp.zeros((B_, cfg.hidden_size))
            video_halves = token_halves = None
        else:
            video_frames, _, video_halves = self._encode_batched(
                params["video_encoder"], batch["video"],
                batch["video_mask"], deterministic,
            )
            token_features, question_feature, token_halves = (
                self._encode_batched(
                    params["text_encoder"], batch["question"],
                    batch["question_mask"], deterministic,
                )
            )
        aux_vec = None
        if batch.get("aux_emb") is not None:
            ae = batch["aux_emb"]
            B_, T_, La, td = ae.shape
            aux_vec = self.encode_sentences(
                params, ae.reshape(B_ * T_, La, td),
                batch["aux_mask"].reshape(B_ * T_, La),
                deterministic=deterministic,
            ).reshape(B_, T_, -1)
        rv, rf, ra = self.run_trace(
            params,
            batch["trace"],
            video_frames,
            batch["video_mask"],
            token_features,
            batch["question_mask"],
            rng=r_exec,
            deterministic=deterministic,
            aux_vec=aux_vec,
            video_halves=video_halves,
            token_halves=token_halves,
        )

        B = rv.shape[0]
        root_vec = rv[jnp.arange(B), batch["root_reg"]].astype(jnp.float32)
        # Non-vec roots (not produced by valid AGQA programs): masked mean of
        # the root frames register, so the graph stays total.
        root_frames = rf[
            jnp.arange(B), jnp.minimum(batch["root_reg"], cfg.num_frames)
        ].astype(jnp.float32)
        fallback = jnp.sum(
            root_frames * batch["video_mask"][:, :, None], axis=1
        ) / jnp.maximum(
            jnp.sum(batch["video_mask"], axis=1, keepdims=True), 1.0
        )
        root = jnp.where(batch["root_is_vec"][:, None], root_vec, fallback)
        if rv.dtype != jnp.float32:
            # Audit/supervision outputs stay f32 (losses and parity tests
            # consume them); a logits-only consumer DCEs these casts.
            rv, rf, ra = (x.astype(jnp.float32) for x in (rv, rf, ra))

        hidden = jnp.concatenate([root, question_feature], axis=-1)
        h = jax.nn.relu(M.linear(params["decoder"]["l1"], hidden))
        h = M.dropout(h, cfg.dropout, r_dec, deterministic)
        logits = M.linear(params["decoder"]["l2"], h)

        return {
            "logits": logits,
            "question_feature": question_feature,
            "token_features": token_features,
            "regs_vec": rv,
            "regs_frames": rf,
            "regs_attn": ra,
            "root": root,
        }


def choice_logits(model, params, out, cand_emb, cand_mask, cand_valid):
    """Score multiple-choice candidates (STAR).

    The reference's STAR path is incomplete (its executor never consumes the
    candidate encodings the dataset prepares — SURVEY §2.6); this head makes
    it functional: candidates are text-encoded, and scored against a
    projection of [program output; question feature].

    cand_emb [B, C, Lc, text]; returns [B, C] with -inf on invalid slots.
    """
    B, C, Lc, text = cand_emb.shape
    reps = model.encode_sentences(
        params,
        cand_emb.reshape(B * C, Lc, text),
        cand_mask.reshape(B * C, Lc),
    ).reshape(B, C, -1)                                   # [B, C, H]
    query = jax.nn.relu(M.linear(
        params["choice_proj"],
        jnp.concatenate([out["root"], out["question_feature"]], axis=-1),
    ))                                                    # [B, H]
    scores = jnp.einsum("bh,bch->bc", query, reps)
    return jnp.where(cand_valid > 0, scores, -jnp.inf)


def _select(op, candidates, default):
    """Pick the candidate whose opcode matches ``op`` (predicated select)."""
    out = default
    for code, value in candidates:
        out = jnp.where(op == int(code), value, out)
    return out

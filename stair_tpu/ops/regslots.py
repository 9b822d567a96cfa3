"""Pallas slot kernels for register-file updates (aliased, in place).

The executor's register files are [B, N, ...] with per-example slot
indices. XLA lowers ``file.at[b, idx].set/add(...)`` to a scatter that —
measured on v5e — materializes a full copy of the file (a 13-write chain
over a [128, 4, 64, 512] bf16 file costs the same ~2 ms whether it's a
scatter touching 8.4 MB/step or a one-hot blend streaming 75 MB/step).
These kernels force true in-place slot updates with
``input_output_aliases``: per grid step one example's slot block is
DMA'd, updated, and written back — traffic proportional to the slot, not
the file.

Used by the reversible training executor (``models/rev_exec.py``) whose
hand-written backward owns its cotangent buffers, so aliasing is safe by
construction (the aliased operand is always dead after the call). On
non-TPU lowering platforms the same semantics fall back to XLA scatter
(``lax.platform_dependent``, mirroring ``ops/attention.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flipped by tests to run the TPU kernels under the Pallas interpreter on
# CPU (semantics-parity coverage without hardware).
_INTERPRET = False


def _xla_set(file, idx, val):
    b = jnp.arange(file.shape[0])
    return file.at[b, idx].set(val, unique_indices=True,
                               indices_are_sorted=True)


def _xla_zero(file, idx):
    b = jnp.arange(file.shape[0])
    return file.at[b, idx].set(0.0, unique_indices=True,
                               indices_are_sorted=True)


def _xla_add(file, idx, val):
    b = jnp.arange(file.shape[0])
    return file.at[b, idx].add(val, unique_indices=True,
                               indices_are_sorted=True)


def _out_spec(rest):
    return pl.BlockSpec((1, 1) + rest,
                        lambda i, s: (i, s[i]) + (0,) * len(rest),
                        memory_space=pltpu.VMEM)


def _val_spec(rest):
    return pl.BlockSpec((1,) + rest, lambda i, s: (i,) + (0,) * len(rest),
                        memory_space=pltpu.VMEM)


def _widen(file, val):
    """Mosaic requires a block's last two dims be 8/128-divisible or equal
    to the array dims, so a slot block (1, 1, H) over a rank-3 file
    [B, N, H] cannot lower (1 != N in the second-to-last position). Insert
    a singleton after the slot axis — [B, N, 1, H] / val [B, 1, H] — so the
    block's trailing dims (1, H) EQUAL the array's. Pure metadata: the
    reshape is a bitcast at these layouts."""
    if file.ndim >= 4:
        return file, val, False
    file = file[:, :, None]
    if val is not None:
        val = val[:, None]
    return file, val, True


def _set_kernel(s_ref, file_ref, val_ref, out_ref):
    del s_ref, file_ref
    # val block is (1,)+rest, out block (1, 1)+rest.
    out_ref[...] = val_ref[...].reshape(out_ref.shape)


def _zero_kernel(s_ref, file_ref, out_ref):
    del s_ref, file_ref
    out_ref[...] = jnp.zeros_like(out_ref)


def _add_kernel(s_ref, cur_ref, val_ref, out_ref):
    del s_ref
    out_ref[...] = cur_ref[...] + val_ref[0]


def _pallas_set(file, idx, val):
    file, val, squeezed = _widen(file, val)
    rest = file.shape[2:]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(file.shape[0],),
        in_specs=[
            # Aliased whole-file operand: never fetched (ANY), only the
            # out blocks are written — everything else stays in place.
            pl.BlockSpec(memory_space=pltpu.ANY),
            _val_spec(rest),
        ],
        out_specs=_out_spec(rest),
    )
    out = pl.pallas_call(
        _set_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(file.shape, file.dtype),
        input_output_aliases={1: 0},
        interpret=_INTERPRET,
    )(idx.astype(jnp.int32), file, val)
    return out[:, :, 0] if squeezed else out


def _pallas_zero(file, idx):
    file, _, squeezed = _widen(file, None)
    rest = file.shape[2:]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(file.shape[0],),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=_out_spec(rest),
    )
    out = pl.pallas_call(
        _zero_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(file.shape, file.dtype),
        input_output_aliases={1: 0},
        interpret=_INTERPRET,
    )(idx.astype(jnp.int32), file)
    return out[:, :, 0] if squeezed else out


def _pallas_add(file, idx, val):
    file, val, squeezed = _widen(file, val)
    rest = file.shape[2:]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(file.shape[0],),
        in_specs=[
            _out_spec(rest),   # aliased AND block-read: out = cur + val
            _val_spec(rest),
        ],
        out_specs=_out_spec(rest),
    )
    out = pl.pallas_call(
        _add_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(file.shape, file.dtype),
        input_output_aliases={1: 0},
        interpret=_INTERPRET,
    )(idx.astype(jnp.int32), file, val)
    return out[:, :, 0] if squeezed else out


def slot_set(file, idx, val):
    """file[b, idx[b]] = val[b] with slot-sized traffic on TPU."""
    return jax.lax.platform_dependent(
        file, idx, val, tpu=_pallas_set, default=_xla_set
    )


def slot_zero(file, idx):
    """file[b, idx[b]] = 0 with slot-sized traffic on TPU."""
    return jax.lax.platform_dependent(
        file, idx, tpu=_pallas_zero, default=_xla_zero
    )


def slot_add(file, idx, val):
    """file[b, idx[b]] += val[b] with slot-sized traffic on TPU."""
    return jax.lax.platform_dependent(
        file, idx, val, tpu=_pallas_add, default=_xla_add
    )

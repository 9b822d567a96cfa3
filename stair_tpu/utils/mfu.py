"""Model-FLOPs-utilization reporting for the benchmarks.

MFU = model FLOPs per step / step wall time / chip peak FLOP/s — the
hardware-normalized form of every throughput claim (q/s and ms/step depend
on model size; MFU says how close the step runs to the chip's roofline).

FLOPs come from XLA's compiled cost analysis (``Compiled.cost_analysis``),
i.e. the *executed* HLO's flop count — for a train step this already
includes forward, backward, and rematerialized recompute, so it is an
"achieved-FLOPs" utilization (includes remat overhead), matching how the
scaling literature quotes hardware utilization vs the analytic 6·N·D model
FLOPs. Peak comes from a per-chip table (dense bf16).
"""

from __future__ import annotations

import jax

#: Dense peak FLOP/s per chip, bf16 (matmul). Public spec-sheet numbers.
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
    "TPU v7": 4614e12,       # Ironwood
}


#: Peak HBM bandwidth per chip, bytes/s. Public spec-sheet numbers.
#: Autoregressive decode reads every live parameter once per token, so
#: its utilization metric is bandwidth (MBU), not FLOPs.
_PEAK_HBM_BW = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,    # v5e
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,        # v5p
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,   # v6e / Trillium
    "TPU v6e": 1640e9,
    "TPU v7": 7370e9,        # Ironwood
}


def chip_peak_hbm_bw(device=None) -> float | None:
    """Peak HBM bandwidth (bytes/s) for ``device``."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    if kind in _PEAK_HBM_BW:
        return _PEAK_HBM_BW[kind]
    for name, bw in _PEAK_HBM_BW.items():
        if kind.startswith(name):
            return bw
    return None


def chip_peak_flops(device=None) -> float | None:
    """Dense bf16 peak FLOP/s for ``device`` (default: first device)."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    if kind in _PEAK_BF16:
        return _PEAK_BF16[kind]
    for name, peak in _PEAK_BF16.items():
        if kind.startswith(name):
            return peak
    return None


def compiled_flops(compiled) -> float | None:
    """Total FLOPs of one execution of a ``Compiled`` jit computation."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
    if not ca:
        return None
    flops = ca.get("flops")
    return float(flops) if flops and flops > 0 else None


def jit_flops(fn, *args, **kwargs) -> float | None:
    """FLOPs of one call of ``jit(fn)(*args, **kwargs)`` (compiles it)."""
    try:
        return compiled_flops(jax.jit(fn).lower(*args, **kwargs).compile())
    except Exception:
        return None


def mfu(flops_per_step: float | None, step_seconds: float,
        device=None) -> float | None:
    """Fraction of chip peak achieved; None when either input is unknown."""
    peak = chip_peak_flops(device)
    if not flops_per_step or not peak or step_seconds <= 0:
        return None
    return flops_per_step / step_seconds / peak


def format_mfu(flops_per_step: float | None, step_seconds: float,
               device=None) -> str:
    """Human line: achieved TFLOP/s and % of peak."""
    if not flops_per_step or step_seconds <= 0:
        return "mfu: n/a (no cost analysis)"
    achieved = flops_per_step / step_seconds
    util = mfu(flops_per_step, step_seconds, device)
    if util is None:
        return f"achieved {achieved / 1e12:.1f} TFLOP/s (peak unknown)"
    return (f"achieved {achieved / 1e12:.1f} TFLOP/s = "
            f"{util * 100:.1f}% of chip peak "
            f"({chip_peak_flops(device) / 1e12:.0f} TFLOP/s bf16)")

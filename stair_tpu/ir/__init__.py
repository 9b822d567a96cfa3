"""Program IR: fixed-shape instruction traces for the compiled executor."""

from stair_tpu.ir.lowering import (  # noqa: F401
    Opcode,
    Trace,
    lower_program,
    pad_traces,
    TraceBatch,
)

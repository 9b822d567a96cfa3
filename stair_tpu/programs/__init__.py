"""Program layer: annotation parsing, program rewriting, symbolic execution.

This is the "compiler front-end" of the NMN: AGQA annotation strings are
tokenized and rewritten into executable neural programs (postfix token lists),
and a symbolic interpreter over spatio-temporal scene graphs produces both the
gold answer and per-step intermediate supervision for every auditable module.
"""

from stair_tpu.programs.parser import (  # noqa: F401
    NMN_ARITY,
    PARSE_ARITY,
    KEYWORDS,
    parse_nmn_program,
    children_and_parents,
    module_levels,
    program_is_valid,
)
from stair_tpu.programs.scene_graph import (  # noqa: F401
    FrameInterval,
    SceneGraphExecutor,
    parse_sg_program,
)

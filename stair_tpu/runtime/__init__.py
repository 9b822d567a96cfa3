"""Native host runtime: compiled data-path kernels + prefetching loader."""

from stair_tpu.runtime.loader import (  # noqa: F401
    FeatureArena,
    PrefetchIterator,
    native_lib,
)

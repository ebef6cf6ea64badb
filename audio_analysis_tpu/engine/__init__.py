"""Fused batched analysis engine + multi-chip sharding."""

from audio_analysis_tpu.engine.batch import (  # noqa: F401
    EngineConfig,
    analyze_batch,
    analyze_bundle,
    enable_persistent_compilation_cache,
)
from audio_analysis_tpu.engine.mesh import (  # noqa: F401
    analyze_batch_sharded,
    make_mesh,
)

"""
Parallelism layer (alias package).

The multi-chip/multi-host machinery lives with the engine it parallelises:
- audio_analysis_tpu.engine.mesh        — single-host mesh, shard_map scaling
- audio_analysis_tpu.engine.distributed — multi-host (DCN) bundle farms
This package re-exports it under the conventional name.
"""

from audio_analysis_tpu.engine.distributed import (  # noqa: F401
    analyze_bundle_multi_host,
    initialize_multi_host,
)
from audio_analysis_tpu.engine.mesh import (  # noqa: F401
    analyze_batch_sharded,
    make_mesh,
)

"""
Multi-host bundle farms (DCN) — the scale-out path beyond one host's chips.

Single-host multi-chip scaling is engine.mesh (taps data-parallel over ICI).
For fleets of hosts each with local TPUs, this module wires the standard
JAX multi-process setup: `jax.distributed.initialize` over the coordination
network, a global mesh whose "taps" axis spans every chip in the job, and a
per-host slice of the tap batch (each host decodes only its own taps with
the native loader — the filesystem bundle contract is the data plane, DCN
only carries coordination + the final all-reduced aggregates).

Not exercised by the single-chip dev environment (jax.distributed needs a
real multi-process job); guarded accordingly and validated by construction
against the standard JAX multi-process recipe.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def initialize_multi_host(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """
    Join this process to a multi-host JAX job. Arguments default to the
    standard environment variables (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) or the TPU pod auto-detection when all are None.
    """
    import jax

    kwargs = {}
    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(process_id or os.environ["JAX_PROCESS_ID"])

    jax.distributed.initialize(**kwargs)


def analyze_bundle_multi_host(
    bundle_root: str,
    config=None,
) -> Dict[str, np.ndarray]:
    """
    Analyse a bundle across every process of an initialized multi-host job.

    Each host decodes the tap shard it owns (taps are assigned round-robin
    by index — the bundle lives on a shared filesystem), places it on its
    local devices, and the fused engine runs under the global "taps" mesh.
    Returns the per-tap metrics for the LOCAL shard plus the global
    aggregates (identical on every host after the all-reduce).
    """
    import jax

    from audio_analysis_tpu.engine.batch import EngineConfig
    from audio_analysis_tpu.engine.mesh import analyze_batch_sharded, make_mesh
    from audio_analysis_tpu.io.bundle import load_bundle_batch

    if config is None:
        config = EngineConfig()

    process_id = jax.process_index()
    num_processes = jax.process_count()

    meta, batch, lengths, names = load_bundle_batch(bundle_root)
    local_sel = np.arange(len(names)) % num_processes == process_id
    local_batch = batch[local_sel]
    local_lengths = lengths[local_sel]

    # Local mesh over this host's devices; aggregates still all-reduce
    # globally because jax.distributed made the job one XLA computation
    # domain. (A fully-global taps mesh requires jax.make_mesh over
    # jax.devices() — all chips in the job — and globally-consistent
    # device_put; kept per-host here so each host analyses its own shard.)
    mesh = make_mesh(num_devices=len(jax.local_devices()))
    out = analyze_batch_sharded(mesh, local_batch, local_lengths, config)
    out = {k: np.asarray(v) for k, v in out.items()}
    out["local_tap_names"] = [n for n, keep in zip(names, local_sel) if keep]
    return out

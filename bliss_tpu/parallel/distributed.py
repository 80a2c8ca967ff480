"""Multi-host (pod) initialization.

The reference has no distributed backend (SURVEY.md §2: its only
"communication" is pthread shared memory). Here multi-host analysis uses
jax.distributed over ICI/DCN: initialize once per process, then build the
('data', 'seq') mesh over the global device set — the shard_map programs in
parallel/mesh.py are SPMD and run unchanged across hosts, with XLA routing
psum/ppermute/all_gather over ICI within a slice.
"""

from __future__ import annotations

import jax

from bliss_tpu.parallel.mesh import analysis_mesh
from bliss_tpu.utils import get_logger, log_event

logger = get_logger("bliss_tpu.distributed")


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op on a single process).

    With no arguments, JAX auto-detects the TPU pod environment (GCE
    metadata); arguments override for manual setups.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log_event(
            logger,
            "distributed initialized",
            processes=jax.process_count(),
            devices=jax.device_count(),
        )
    except (ValueError, RuntimeError) as e:
        log_event(logger, "single-process mode", reason=str(e)[:120])


def pod_mesh(n_seq: int = 1):
    """('data', 'seq') mesh over all global devices; songs shard across the
    pod, long PCM streams shard within a slice."""
    return analysis_mesh(jax.device_count() // n_seq, n_seq)
